#!/usr/bin/env python3
"""Summarize a Spark event log: one line per job with duration, stage/task
counts, and the job group / call site — the per-phase breakdown the
optimization rounds use to find where a lifecycle row's wall time goes.

Usage: evlog_jobs.py <eventlog-file> [minMs]
"""
import json
import sys


def main(path, min_ms=0):
    jobs = {}
    stage_tasks = {}
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            props = e.get("Properties") or {}
            jobs[e["Job ID"]] = {
                "start": e["Submission Time"],
                "end": None,
                "site": props.get("callSite.short", "?"),
                "desc": props.get("spark.job.description", ""),
                "stages": len(e.get("Stage Infos", [])),
                "tasks": sum(s.get("Number of Tasks", 0)
                             for s in e.get("Stage Infos", [])),
            }
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
    total = 0
    rows = []
    for jid, j in sorted(jobs.items()):
        if j["end"] is None:
            continue
        ms = j["end"] - j["start"]
        total += ms
        if ms >= min_ms:
            rows.append((jid, ms, j))
    print(f"{'job':>4} {'ms':>7} {'stg':>4} {'task':>5}  site / description")
    for jid, ms, j in rows:
        label = j["site"]
        if j["desc"]:
            label += f"  [{j['desc'][:60]}]"
        print(f"{jid:>4} {ms:>7} {j['stages']:>4} {j['tasks']:>5}  {label}")
    print(f"-- {len(jobs)} jobs, sum of job wall {total/1000.0:.2f}s "
          "(jobs can overlap; gaps between jobs are driver-side time)")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 0)
