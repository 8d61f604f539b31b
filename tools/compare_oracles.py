"""Dev harness mimicking the driver's DuckDB-oracle comparison.

Runs every QUERIES entry on Spark and its ORACLES twin on DuckDB over the
same sf dir; compares row count, column names, and order-insensitive
values (floats rounded to 9 significant-ish decimals before hashing).

Usage: python tools/compare_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig_rows = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], sig_rows


def main():
    import json

    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print(
                "usage: compare_oracles.py [--json OUT.json] [sf_dir] "
                "[only_query ...]",
                file=sys.stderr,
            )
            return 2
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    from linkgraph.queries import ORACLES, QUERIES
    from linkgraph.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        records[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            rec["err"] = f"SPARK ERROR: {str(e)[:300]}"
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL spark] {name}: {str(e)[:300]}")
            continue
        if name not in ORACLES:
            rec.update(rows_match=None, schema_match=None, hash_match=None)
            print(f"[rows-only ] {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as e:
            rec["err"] = f"DUCKDB ERROR: {str(e)[:300]}"
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL duck ] {name}: {str(e)[:300]}")
            continue
        sc, ss = frame_signature(scols, srows)
        dc, ds = frame_signature(dcols, drows)
        rec["schema_match"] = sc == dc
        rec["rows_match"] = len(ss) == len(ds)
        if sc != dc:
            failures.append((name, f"columns {sc} vs {dc}"))
            print(f"[FAIL cols ] {name}: {sc} vs {dc}")
            continue
        if len(ss) != len(ds):
            failures.append((name, f"rows {len(ss)} vs {len(ds)}"))
            print(f"[FAIL count] {name}: {len(ss)} vs {len(ds)}")
            continue
        if ss != ds:
            ndiff = sum(1 for a, b in zip(ss, ds) if a != b)
            ex = next((a, b) for a, b in zip(ss, ds) if a != b)
            failures.append((name, f"{ndiff} differing rows, e.g. {ex}"))
            print(f"[FAIL value] {name}: {ndiff}/{len(ss)} differ, e.g.\n  spark: {ex[0]}\n  duck : {ex[1]}")
            continue
        rec["hash_match"] = True
        print(f"[OK        ] {name}: {len(ss)} rows")
    print(f"\n{len(failures)} failures")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "entries": records}, f, indent=1
            )
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
