"""Custom stateful streaming operators (``applyInPandasWithState``).

For operators the built-in streaming aggregates can't express —
arbitrary per-key state machines — Structured Streaming exposes
``applyInPandasWithState``: per-key Arrow-batched callbacks with a
durable ``GroupState``. The reference has no streaming at all
(SURVEY §2.2); this is engine-layer surface the brief requires.

Scale notes:

* state lives in the executor state store, partitioned by the group
  key — one shuffle per micro-batch on that key, same as batch
  groupBy;
* the callback sees Arrow batches, never per-row Python calls;
* a watermark upstream bounds how long state is retained when used
  with timeouts (`GroupStateTimeout.EventTimeTimeout`).

The running-total operator here is deliberately the simplest useful
state machine (per-key cumulative count + sum surviving across
micro-batches); it is the template for sessionizers / dedupers with
custom merge logic that ``session_window`` can't express.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    integral: bool = False,
) -> DataFrame:
    """Per-key cumulative ``(n_events, total)`` maintained in streaming
    state; each micro-batch emits the updated totals for keys seen in
    that batch (output mode: update).

    With ``integral=True`` the value column must be int64 and the
    running sum is kept as an exact Python/NumPy integer (``total`` is
    a long) — accumulation-order independent, so the completed output
    hash-matches a single-threaded SQL oracle. The default float path
    keeps a double total (pandas pairwise summation; last-ulp order
    dependence is possible across engines).

    On a batch DataFrame Spark runs the same callback with transient
    state — one emission per key — which the equivalence test uses as
    the reference result.
    """
    total_t = "long" if integral else "double"
    out_schema = f"{key_col} long, n_events long, total {total_t}"
    state_schema = f"n long, s {total_t}"
    zero: Any = 0 if integral else 0.0
    conv = int if integral else float

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, zero)
        for pdf in pdfs:
            n += len(pdf)
            s += conv(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total": [s]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
