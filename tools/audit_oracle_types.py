"""Audit oracle output types for driver-hash risk.

The local comparator (tools/compare_oracle.py) uses cursor.fetchall(), where
DuckDB HUGEINT surfaces as a Python int — identical rendering to Spark's
BIGINT. A driver that materializes through pandas instead gets HUGEINT ->
float64 ("3" vs "3.0"), breaking value-hash parity even though values match.
The same risk class applies to DECIMAL outputs (object/float64 in pandas)
when the Spark side is DOUBLE or BIGINT.

This script DESCRIBEs every oracle_sql() entry at sf0.001 and flags output
columns typed HUGEINT / DECIMAL / UHUGEINT, and (with --spark) cross-checks
Spark's schema for int-vs-float disagreement per column name.

Usage: python tools/audit_oracle_types.py [--spark]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

RISKY = ("HUGEINT", "DECIMAL", "UHUGEINT")
SF_DIR = "/root/testdata/sf0.001"


def main():
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    check_spark = "--spark" in sys.argv
    spark = None
    qs = {}
    if check_spark:
        from taico_data_integration_spark.session import get_spark

        spark = get_spark("oracle-type-audit")
        qs = entry_mod.queries()

    flagged = 0
    for name, sql in entry_mod.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERR  {name}: describe failed: {e}")
            flagged += 1
            continue
        duck_types = {row[0]: row[1] for row in desc}
        bad = {c: t for c, t in duck_types.items() if any(r in t.upper() for r in RISKY)}
        if bad:
            print(f"FLAG {name}: duckdb risky output types {bad}")
            flagged += 1
        if check_spark and name in qs:
            try:
                sschema = {f.name: f.dataType.simpleString() for f in qs[name](spark, SF_DIR).schema.fields}
            except Exception as e:
                print(f"ERR  {name}: spark schema failed: {e}")
                flagged += 1
                continue
            for c, dt in duck_types.items():
                if c not in sschema:
                    continue
                s = sschema[c]
                d = dt.upper()
                int_d = ("INT" in d or "HUGEINT" in d) and "POINT" not in d
                int_s = s in ("tinyint", "smallint", "int", "bigint")
                float_d = d in ("DOUBLE", "FLOAT", "REAL") or "DECIMAL" in d
                float_s = s in ("float", "double") or s.startswith("decimal")
                if (int_d and float_s) or (float_d and int_s):
                    print(f"FLAG {name}.{c}: duckdb={dt} vs spark={s}")
                    flagged += 1
    print(f"\n{flagged} flags")
    if spark is not None:
        spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
