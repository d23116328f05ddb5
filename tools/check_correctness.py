"""Local stand-in for the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonicalized value hash — strictly (bit-exact
floats, microsecond timestamps). Passing here should imply passing the
driver's CORRECTNESS_r{N}.json check.

Usage:
    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from jobinsight_data_pipeline_v2_spark.plans import load_all  # noqa: E402
from jobinsight_data_pipeline_v2_spark.session import get_spark  # noqa: E402
from jobinsight_data_pipeline_v2_spark.tables import TESTDATA_TABLES  # noqa: E402


def canon_cell(v) -> str:
    """Canonicalize one value to a comparison string."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)  # full precision — bit differences must show
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat(timespec="microseconds")
    if isinstance(v, datetime.datetime):
        return v.isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_frame(df: pd.DataFrame) -> tuple[int, list[str], str, list[str]]:
    """(row_count, sorted_columns, value_hash, sorted_row_strings)."""
    cols = sorted(df.columns)
    rows = [
        "|".join(canon_cell(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_skip = 0
    for name, (fn, oracle) in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if oracle is None:
            print(f"SKIP  {name}: no oracle (rows-only: {len(sdf)})")
            n_skip += 1
            continue
        try:
            odf = con.sql(oracle).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sn, scols, shash, srows = canon_frame(sdf)
        on, ocols, ohash, orows = canon_frame(odf)
        dt = time.time() - t0
        if sn == on and scols == ocols and shash == ohash:
            print(f"PASS  {name}  rows={sn}  {dt:.1f}s")
            n_pass += 1
        else:
            print(f"FAIL  {name}  spark rows={sn} cols={scols}")
            print(f"      oracle rows={on} cols={ocols}")
            if scols == ocols and sn == on:
                diffs = [
                    (a, b) for a, b in zip(srows, orows) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"      spark : {a[:240]}")
                    print(f"      oracle: {b[:240]}")
            else:
                for r in srows[:2]:
                    print(f"      spark : {r[:240]}")
                for r in orows[:2]:
                    print(f"      oracle: {r[:240]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
