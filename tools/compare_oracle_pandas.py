"""Pandas-path replica of the correctness gate — the strict variant.

tools/compare_oracle.py materializes DuckDB results with cursor.fetchall(),
where HUGEINT comes back as a plain Python int. A driver that instead goes
through pandas (Spark .toPandas() vs duckdb .df()) sees different value
renderings: HUGEINT -> float64 ("3.0" vs "3"), DECIMAL -> float64/object,
nullable ints promoted to float64, NULL floats -> NaN. Round 1's only
driver-red row (q12_priority_by_linestatus) passed the fetchall comparator
and failed the driver — this tool reproduces that failure mode.

Canonicalization here is deliberately TYPE-SENSITIVE (ints render "i:3",
floats "f:3", bools "b:True") so that a value that changes numpy dtype
between the Spark and DuckDB pandas frames fails loudly, exactly like a
driver hash that folds in rendering or dtype.

Usage: python tools/compare_oracle_pandas.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(v):
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"  # pandas NULL float; driver may render either way
        return f"f:{f:.12g}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        # DATE-output queries (q18, watermark_incremental) were driver-green
        # even though duckdb .df() yields datetime64 while Spark yields
        # datetime.date — so normalize dates to midnight timestamps.
        return v.isoformat() + " 00:00:00.000000"
    if isinstance(v, (bytes, bytearray)):
        import hashlib

        return hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_lines(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("|".join(canon(v) for v in row))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from taico_data_integration_spark.session import get_spark

    spark = get_spark("oracle-compare-pandas")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        glob = f"{p}/*.parquet" if __import__("os").path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(f"cols spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}")
        if not problems:
            ls, ld = frame_lines(spdf), frame_lines(dpdf)
            if ls != ld:
                problems.append("pandas value mismatch")
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark: {a[:200]}")
                        problems.append(f"  duck : {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            for p in problems[3:]:
                print(p)
            failures.append(name)
        else:
            print(f"OK   {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
