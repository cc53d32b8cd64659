"""Model-scoring operators: linear quality-classifier inference.

Not in the reference (a conversion library, SURVEY.md §2.2). The
standard training-data curation step after heuristic filters is a
cheap learned classifier (fastText-style linear model over document
features — cf. the CommonCrawl quality filters in the GPT-3 / CCNet
pipelines): score = w . x, keep if above threshold.

Inference over a 100 TB corpus is embarrassingly parallel; the design
constraints are (a) the model rides along as BROADCAST state (here:
constant-folded literals — a real model's coefficient vector is a few
KB), and (b) scoring stays in whole-stage codegen, never per-row
Python. Features and weights use fixed-point INTEGER arithmetic so
the score is bit-identical on any engine — a float dot product would
be, too (fixed evaluation order), but integer keeps the SQL oracle
trivially exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from protarrow_spark.functions.text import tokens
from protarrow_spark.operators.text import STOPWORDS

#: Feature scale: ratios become integers in [0, FEATURE_SCALE].
FEATURE_SCALE = 1000
#: Length saturation point (tokens) for the length feature.
LENGTH_SATURATION = 200

#: The "trained" model: (bias, w_ttr, w_len, w_stop) in millis. A real
#: deployment loads these from a model artifact; they are literals
#: here because the shipping mechanism (constant-folded broadcast
#: state) is what matters, not the values.
QUALITY_WEIGHTS = {"bias": -500, "ttr": 2, "len": 1, "stop": -3}


def linear_quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document linear classifier score and keep decision.

    Features (fixed-point, of FEATURE_SCALE):
      ttr_m  = 1000 * distinct_tokens div tokens   (lexical diversity)
      len_m  = min(1000, 1000 * tokens div 200)    (length, saturating)
      stop_m = 1000 * stopword_hits div tokens     (stopword ratio)
    Score z = bias + w_ttr*ttr_m + w_len*len_m + w_stop*stop_m; the
    document is kept when z > 0. One scan-stage projection, zero
    shuffles.

    Output: id, ttr_m, len_m, stop_m, z_score (all bigint), keep.
    """
    w = QUALITY_WEIGHTS
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")
    ttr_m = F.expr(f"{FEATURE_SCALE}L * n_distinct div n_tokens")
    len_m = F.least(
        F.lit(FEATURE_SCALE).cast("long"),
        F.expr(f"{FEATURE_SCALE}L * n_tokens div {LENGTH_SATURATION}"),
    )
    stop_m = F.expr(f"{FEATURE_SCALE}L * n_stop div n_tokens")
    staged = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        n_stop.alias("n_stop"),
    ).select(
        F.col(id_col),
        ttr_m.alias("ttr_m"),
        len_m.alias("len_m"),
        stop_m.alias("stop_m"),
    )
    z = (
        F.lit(w["bias"]).cast("long")
        + F.lit(w["ttr"]) * F.col("ttr_m")
        + F.lit(w["len"]) * F.col("len_m")
        + F.lit(w["stop"]) * F.col("stop_m")
    )
    return staged.select(
        F.col(id_col),
        "ttr_m",
        "len_m",
        "stop_m",
        z.cast("long").alias("z_score"),
        (z > 0).alias("keep"),
    )


def linear_quality_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB SQL reproducing the identical fixed-point scores."""
    w = QUALITY_WEIGHTS
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS tok FROM {table}
),
feat AS (
  SELECT {id_col},
         COUNT(*) AS n_tokens,
         COUNT(DISTINCT tok) AS n_distinct,
         SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS n_stop
  FROM toks GROUP BY {id_col}
),
fixedpoint AS (
  SELECT {id_col},
         ({FEATURE_SCALE} * n_distinct) // n_tokens AS ttr_m,
         LEAST({FEATURE_SCALE}, ({FEATURE_SCALE} * n_tokens) // {LENGTH_SATURATION}) AS len_m,
         ({FEATURE_SCALE} * n_stop) // n_tokens AS stop_m
  FROM feat
)
SELECT {id_col},
       CAST(ttr_m AS BIGINT) AS ttr_m,
       CAST(len_m AS BIGINT) AS len_m,
       CAST(stop_m AS BIGINT) AS stop_m,
       CAST({w['bias']} + {w['ttr']} * ttr_m + {w['len']} * len_m
            + {w['stop']} * stop_m AS BIGINT) AS z_score,
       ({w['bias']} + {w['ttr']} * ttr_m + {w['len']} * len_m
            + {w['stop']} * stop_m) > 0 AS keep
FROM fixedpoint
"""
