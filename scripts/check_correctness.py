#!/usr/bin/env python
"""Replicate the driver's correctness gate locally: run every
`queries()` entry at sf0.01, compare row count + schema + value hash
against its `oracle_sql()` twin in DuckDB (rows-only for entries with
no oracle), and write CORRECTNESS_selfcheck.json. One command to know
CORRECTNESS_r{N} will be green before the driver runs:

    python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df) -> str:
    """Column-name-sorted, row-sorted, stringified value hash (the
    driver's comparison shape: columns sorted by name, values
    stringified)."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.astype(str).to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    from knowledge_harvest_from_lms_spark.plans.queries import ORACLES, QUERIES
    from knowledge_harvest_from_lms_spark.session import get_session

    spark = get_session(cpus=8, shuffle_partitions=8, app_name="correctness-gate")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    n_fail = 0
    for name, fn in QUERIES.items():
        entry: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, sf_dir).toPandas()
            entry["spark_rows"] = int(len(sdf))
            if name in ORACLES:
                ddf = con.execute(ORACLES[name]).df()
                entry["oracle_rows"] = int(len(ddf))
                entry["rows_match"] = len(sdf) == len(ddf)
                entry["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                entry["hash_match"] = (
                    entry["rows_match"]
                    and entry["schema_match"]
                    and value_hash(sdf) == value_hash(ddf)
                )
                if not entry["hash_match"]:
                    n_fail += 1
            else:
                entry["err"] = "no_oracle"
        except Exception as e:  # broken query — the worst outcome
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
            n_fail += 1
        results[name] = entry
        state = (
            "OK" if entry["hash_match"]
            else ("rows-only" if entry["err"] == "no_oracle" else "FAIL")
        )
        print(f"{name:36s} {state:9s} spark={entry['spark_rows']}")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_selfcheck.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    oracled = sum(1 for r in results.values() if r["err"] != "no_oracle" and not r["err"])
    print(
        f"\n{oracled} oracle-checked green, "
        f"{sum(1 for r in results.values() if r['err'] == 'no_oracle')} rows-only, "
        f"{n_fail} failures -> {out_path}"
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
