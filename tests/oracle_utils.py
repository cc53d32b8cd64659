"""Local replica of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle side-by-side, compare row count +
column names + order-insensitive canonical values."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd

from protarrow_spark.sources.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetch_df()


def _canon_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_val(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar or array
        return _canon_val(v.tolist())
    if isinstance(v, bytes):
        return v.hex()
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_canon_val(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark, name: str, sf_dir: str) -> None:
    from protarrow_spark.queries import all_oracles, all_queries

    qfn = all_queries()[name]
    sql = all_oracles()[name]
    got = qfn(spark, sf_dir).toPandas()
    exp = run_oracle(sql, sf_dir)
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    # int-vs-float dtype skew (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
    # float64) survives the value compare below (2.0 == 2) but breaks
    # any repr/hash-based grading — fail it here so oracles stay
    # type-aligned (cast integral SUMs to BIGINT on the DuckDB side).
    for c in got.columns:
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        skewed = "f" in {gk, ek} and ({gk, ek} & {"i", "u"})
        assert not skewed, f"{name}.{c}: dtype-kind skew spark={gk} duck={ek}"
    got_rows, exp_rows = canonical_rows(got), canonical_rows(exp)
    mismatches = [
        (i, g, e) for i, (g, e) in enumerate(zip(got_rows, exp_rows)) if g != e
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches, first: {mismatches[:3]}"
