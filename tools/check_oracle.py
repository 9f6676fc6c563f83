#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff (columns sorted by name, rows
sorted, exact value compare with tiny float tolerance for reporting).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, memoryview) or isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    import decimal
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            # The DRIVER's gate (unlike this checker) crashes on list/array
            # output columns (pandas sort_values -> unhashable numpy.ndarray,
            # see VERDICT.md round 1). Flag them as hard failures here too.
            list_cols = [c for c, t in zip(got.columns, got.types)
                         if str(t).endswith("[]") or "STRUCT" in str(t)]
            if list_cols:
                print(f"FAIL {name}: ARRAY/STRUCT output cols {list_cols} "
                      "would crash the driver gate - array_join them")
                n_bad += 1
                continue
            gcols, grows = canon(got.columns, got.fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql)
            ecols, erows = canon(exp.columns, exp.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={ecols}")
            n_bad += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(erows)}")
            print(f"  spark head: {grows[:3]}")
            print(f"  oracle head: {erows[:3]}")
            n_bad += 1
            continue
        bad = [(g, e) for g, e in zip(grows, erows) if g != e]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first:")
            for g, e in bad[:3]:
                print(f"  spark : {g}\n  oracle: {e}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(grows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
