#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> <sfDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, canonicalizes both results (columns sorted by
name, rows sorted), and reports per-query match/mismatch.
"""
import json
import sys

import duckdb


def canon(con, rel_sql: str):
    """Return (schema, rows) with columns sorted by name, rows sorted."""
    rel = con.sql(rel_sql)
    cols = sorted(rel.columns)
    quoted = ", ".join(f'"{c}"' for c in cols)
    out = con.sql(f"SELECT {quoted} FROM ({rel_sql}) ORDER BY ALL")
    return [(c, str(t)) for c, t in zip(out.columns, out.types)], out.fetchall()


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{tbl}.parquet')")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_schema, got = canon(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            exp_schema, exp = canon(con, sql)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if [c for c, _ in got_schema] != [c for c, _ in exp_schema]:
            print(f"FAIL {name}: columns {got_schema} != {exp_schema}")
            n_fail += 1
        elif got_schema != exp_schema:
            print(f"WARN-TYPES {name}: {got_schema} != {exp_schema}")
            # still compare values
            if got == exp:
                print(f"  (values match, {len(got)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                report_diff(name, got, exp)
        elif got != exp:
            n_fail += 1
            report_diff(name, got, exp)
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


def report_diff(name, got, exp):
    print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
    for i, (g, e) in enumerate(zip(got, exp)):
        if g != e:
            print(f"  first diff at row {i}:\n    got {g}\n    exp {e}")
            break


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
