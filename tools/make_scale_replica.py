#!/usr/bin/env python3
"""Build a deterministic scale replica of sf0.1 under /tmp for the round-20
scaling measurements (SCALING.md "r20 measured scaling" section).

Shape:
  - documents x10   -- the doc-table rows' linear regime (sf1.0-equivalent)
  - customer  x4    -- the student-graph rows; the SAME_STREAM rule key is
                       c_custkey % 7 (7 fixed values, shared by every copy),
                       so its pair join is QUADRATIC by problem definition
                       and x4 keeps a single-host measurement feasible
  - every other table copied as-is (bench warmup reads + constant dims)

Copy k displaces keys (doc_id + k*2e6 -- even multiples of 1e6, so the
mm_phash mirror's +1e6 re-keying stays collision-free; c_custkey + k*1e7)
and suffixes the content/cohort fields (text, c_name, c_mktsegment,
c_nationkey + 100k, c_acctbal + 100000k) so each copy forms its OWN
cohorts and near-dup space: the regime a real 10x crawl delivers (more
cohorts of similar size, new content), NOT 10 byte-identical copies --
identical copies would measure a pathological all-duplicate corpus where
every pair generator degenerates quadratically.
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfrep"
DOC_COPIES = 10
CUST_COPIES = 4

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

# One FILE PER COPY inside a directory-style table: a single merged file
# is one Spark partition (one ~20MB row group < maxPartitionBytes), which
# serializes every mapPartitions-heavy op onto one core and measures the
# scheduler, not the operator (observed: mm_phash_lifecycle 47s at x10
# with 32 tasks and idle executors). A real 10x corpus arrives as ~10x
# the files — per-copy files are the representative layout.
os.makedirs(f"{DST}/documents.parquet", exist_ok=True)
for k in range(DOC_COPIES):
    con.execute(
        f"COPY (SELECT * REPLACE (doc_id + {k * 2_000_000} AS doc_id, "
        f"text || ' c{k}' AS text) "
        f"FROM read_parquet('{SRC}/documents.parquet')) "
        f"TO '{DST}/documents.parquet/part-{k:03d}.parquet' (FORMAT PARQUET)")

os.makedirs(f"{DST}/customer.parquet", exist_ok=True)
for k in range(CUST_COPIES):
    con.execute(
        f"COPY (SELECT * REPLACE (c_custkey + {k * 10_000_000} AS c_custkey, "
        f"c_name || '#{k}' AS c_name, "
        f"c_mktsegment || '#{k}' AS c_mktsegment, "
        f"c_nationkey + {k * 100} AS c_nationkey, "
        f"c_acctbal + {k * 100_000} AS c_acctbal) "
        f"FROM read_parquet('{SRC}/customer.parquet')) "
        f"TO '{DST}/customer.parquet/part-{k:03d}.parquet' (FORMAT PARQUET)")

for t in ["region", "nation", "supplier", "part", "orders", "lineitem",
          "events", "embeddings"]:
    src = f"{SRC}/{t}.parquet"
    dst = f"{DST}/{t}.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, dst, dirs_exist_ok=True)
    else:
        shutil.copyfile(src, dst)

for t in ["documents", "customer"]:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet/*.parquet')"
    ).fetchone()[0]
    print(f"{t}: {n} rows")
print(f"replica at {DST}")
