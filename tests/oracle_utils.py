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


def _kmeans_oracle_sql(k: int = 8, n_iter: int = 5) -> str:
    """DuckDB replica of operators/similarity.py kmeans_lloyd: init =
    the k smallest-id vectors (cluster index = id order), n_iter
    rounds of cosine-argmax assignment (ties to the lower index, via
    ROW_NUMBER) + mean update (empty clusters keep their centroid),
    then one final assignment with the updated centroids — unrolled,
    one CTE pair per round. Float sums accumulate in DuckDB's own
    order, so this backs the TOLERANCE gate (counts exact, centroids
    within epsilon), not the hash gate."""

    def cos(e: str, c: str) -> str:
        return (
            f"list_dot_product({e}, {c}) / (sqrt(list_dot_product({e}, {e}))"
            f" * sqrt(list_dot_product({c}, {c})))"
        )

    def assign_cte(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, j AS cluster FROM (
    SELECT v.vec_id, {cents}.j,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {cos('v.e', cents + '.c')} DESC, {cents}.j) AS rn
    FROM v CROSS JOIN {cents}
  ) WHERE rn = 1
)"""

    ctes = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        "x AS (SELECT vec_id, generate_subscripts(e, 1) AS i,"
        " unnest(e) AS x FROM v)",
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j, e AS c
  FROM v QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {k}
)""",
    ]
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        ctes.append(assign_cte(f"a{it}", prev))
        ctes.append(f"""c{it} AS (
  SELECT p.j, COALESCE(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT cluster AS j, list(m ORDER BY i) AS c FROM (
      SELECT a{it}.cluster, x.i, SUM(x.x) / COUNT(*) AS m
      FROM a{it} JOIN x USING (vec_id) GROUP BY a{it}.cluster, x.i
    ) GROUP BY cluster
  ) u USING (j)
)""")
    ctes.append(assign_cte("af", f"c{n_iter}"))
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT vec_id, CAST(cluster AS INT) AS cluster FROM af"
    )


def kmeans_tolerance_report(spark, sf_dir: str, eps: float = 1e-6) -> dict:
    """The tolerance gate for the one rows-only registry entry
    (cluster_kmeans_embeddings, the documented float-accumulation
    hash ceiling): per-centroid population counts must match the
    DuckDB replica EXACTLY, and the centroids implied by each side's
    assignments (float64 member means computed identically in numpy)
    must agree within ``eps`` per coordinate. Pins the float
    operating point by values, not just a row count, while leaving
    the hash ceiling documented."""
    import numpy as np

    from protarrow_spark.queries import all_queries

    got = all_queries()["cluster_kmeans_embeddings"](spark, sf_dir).toPandas()
    exp = run_oracle(_kmeans_oracle_sql(), sf_dir)
    gc = got.groupby("cluster").size().to_dict()
    ec = exp.groupby("cluster").size().to_dict()
    counts_exact = {int(k): int(v) for k, v in gc.items()} == {
        int(k): int(v) for k, v in ec.items()
    }
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding::DOUBLE[] AS e FROM "
        f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetch_df()
    E = np.stack(emb["e"].values)
    pos = {int(v): i for i, v in enumerate(emb["vec_id"].values)}

    def centroids(df: pd.DataFrame) -> dict[int, "np.ndarray"]:
        return {
            int(cl): E[[pos[int(v)] for v in grp["vec_id"].values]].mean(axis=0)
            for cl, grp in df.groupby("cluster")
        }

    g, e = centroids(got), centroids(exp)
    if set(g) == set(e):
        cent_diff = max(
            (float(np.max(np.abs(g[c] - e[c]))) for c in g), default=0.0
        )
    else:
        cent_diff = float("inf")
    merged = got.merge(exp, on="vec_id", suffixes=("_g", "_e"))
    agree = float((merged["cluster_g"] == merged["cluster_e"]).mean())
    return {
        "rows": int(len(got)),
        "rows_match": len(got) == len(exp),
        "counts_exact": bool(counts_exact),
        "centroid_max_abs_diff": cent_diff,
        "assign_agreement": agree,
        "eps": eps,
        "tolerance_ok": bool(
            counts_exact and len(got) == len(exp) and cent_diff < eps
        ),
    }


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
