"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count, sorted column
names, and the order-insensitive multiset of values (exact for ints/strings,
1e-9 for floats — the driver's hash compare is at least this strict, so exact
repr equality is also reported).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    try:  # pandas NaT / NA scalars (e.g. null timestamps)
        import pandas as pd

        if v is pd.NaT or (not isinstance(v, (str, bytes)) and pd.isna(v)):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _round_for_sort(v):
    if isinstance(v, float):
        r = round(v, 6)
        return 0.0 if r == 0.0 else r  # fold -0.0 into 0.0
    if isinstance(v, tuple):
        return tuple(_round_for_sort(x) for x in v)
    return v


def _sort_key(row):
    """Round floats (recursively, nested arrays included; -0.0 folded) so
    values equal only within tolerance still sort to the same position on
    both sides — a raw repr sort could misalign the row pairing and report
    a false FAIL.  Boundary-straddling rounds remain theoretically possible;
    all registry queries pre-round their float outputs, making the sort key
    exact in practice."""
    return repr(tuple(_round_for_sort(v) for v in row))


def to_multiset(df):
    """pandas DF -> sorted list of tuples with columns sorted by name."""
    cols = sorted(df.columns)
    rows = [
        tuple(normalize_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=_sort_key)


def rows_equal(a, b, tol=1e-9):
    if len(a) != len(b):
        return False, "row count"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return False, f"row {i} width"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not (va == vb or abs(va - vb) <= tol * max(1.0, abs(va), abs(vb))):
                    return False, f"row {i}: {va!r} != {vb!r}"
            elif va != vb:
                # int vs float cross-type equality is fine (2 == 2.0)
                if isinstance(va, (int, float)) and isinstance(vb, (int, float)):
                    if float(va) == float(vb):
                        continue
                return False, f"row {i}: {va!r} != {vb!r}"
    return True, ""


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from vector_db_at_home_spark.schema import TESTDATA_TABLES
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark query raised: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: no oracle (rows-only) — {len(sdf)} rows")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised: {e}")
            failures += 1
            continue
        scols, srows = to_multiset(sdf)
        dcols, drows = to_multiset(ddf)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}")
            failures += 1
            continue
        ok, why = rows_equal(srows, drows)
        if not ok:
            print(f"FAIL {name}: {why} (spark {len(srows)} rows, duckdb {len(drows)} rows)")
            failures += 1
            continue
        exact = srows == drows
        # the round-1 driver hash rejected a query the tolerance compare
        # accepted — the driver hashes exact values, so a tolerance-only
        # match is a FAIL here unless explicitly allowed
        if not exact and not os.environ.get("SPARK_GRAFT_TOLERANT"):
            diffs = [
                (i, va, vb)
                for i, (ra, rb) in enumerate(zip(srows, drows))
                for va, vb in zip(ra, rb)
                if va != vb
            ][:3]
            print(f"FAIL {name}: values match only within tolerance, "
                  f"not bit-exact — driver hash would likely differ: {diffs}")
            failures += 1
            continue
        # dtype drift (e.g. DuckDB HUGEINT sums → float64 vs Spark int64)
        # passes the value compare here but may break the driver's hash
        dtype_warn = ""
        sdt = {c: str(sdf[c].dtype) for c in sdf.columns}
        ddt = {c: str(ddf[c].dtype) for c in ddf.columns}
        drift = {c: (sdt[c], ddt.get(c)) for c in sdt if sdt[c] != ddt.get(c)}
        if drift:
            dtype_warn = f"  [dtype drift: {drift}]"
        print(f"PASS {name}: {len(srows)} rows, cols {scols}"
              + ("" if exact else "  [tolerance match, not bit-exact]")
              + dtype_warn)
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    raise SystemExit(main(sf, only))
