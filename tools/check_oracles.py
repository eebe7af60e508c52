"""Driver-style correctness harness: run every ``queries()`` entry on Spark
and its ``oracle_sql()`` on DuckDB at sf0.01, compare row count, schema
(column names), and order-insensitive values.  Usage:

    python tools/check_oracles.py [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names=None):
    import __spark_entry__ as E
    from scrapy_crawler_german_real_estate_sites_spark.sources.tables import get_spark

    spark = get_spark(app="oracle-check", cpus="16", shuffle_partitions=16)
    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only: {len(sdf)} rows"
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {type(e).__name__}: {str(e)[:300]}"
            continue
        if len(sdf) != len(odf):
            results[name] = f"ROWCOUNT MISMATCH spark={len(sdf)} duck={len(odf)}"
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            results[name] = (
                f"SCHEMA MISMATCH spark={sorted(sdf.columns)} duck={sorted(odf.columns)}"
            )
            continue
        # The driver hashes stringified raw values: a DuckDB float64 column vs a
        # Spark int64 column ("3.0" vs "3") is a hash mismatch even when values
        # are equal.  Flag dtype-kind divergence (int vs float) as a failure.
        kind_bad = [
            c
            for c in sorted(sdf.columns)
            if {sdf[c].dtype.kind, odf[c].dtype.kind} == {"i", "f"}
            or {sdf[c].dtype.kind, odf[c].dtype.kind} == {"u", "f"}
        ]
        if kind_bad:
            results[name] = (
                f"DTYPE MISMATCH (driver hash would differ) cols="
                f"{[(c, str(sdf[c].dtype), str(odf[c].dtype)) for c in kind_bad]}"
            )
            continue
        a, b = normalize(sdf), normalize(odf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            results[name] = f"OK ({len(sdf)} rows)"
        except AssertionError as e:
            diff = (a != b)
            bad_cols = [c for c in a.columns if diff[c].any()] if len(a) == len(b) else []
            results[name] = f"VALUE MISMATCH cols={bad_cols} :: {str(e).splitlines()[-1][:200]}"
    if not results:
        known = ", ".join(qs)
        print(f"no matching queries (asked: {names}); known: {known}")
        return 1
    width = max(len(n) for n in results)
    fails = 0
    for n, r in results.items():
        print(f"{n:<{width}}  {r}")
        if "OK" not in r and "rows-only" not in r:
            fails += 1
    print(f"\n{len(results)} checked, {fails} failing")
    return fails


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:] or None) else 0)
