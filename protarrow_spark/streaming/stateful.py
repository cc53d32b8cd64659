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


def bottomk_quantile_state(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 256,
    qs: tuple = (0.5, 0.9),
) -> DataFrame:
    """Per-key BOTTOM-K sample-quantile sketch maintained in streaming
    state (``applyInPandasWithState``, update mode): the state is the
    k rows with smallest ``md5(id)`` seen so far — exactly the batch
    ``operators.sketches.bottomk_quantiles`` state, kept incrementally
    because bottom-k-of-union merges (the KMV property). Each
    micro-batch emits the key's current quantile estimates plus a
    monotone ``n_seen`` counter (the last-emission selector for the
    update-mode sink readout).

    Deterministic end-to-end: Python's ``hashlib.md5`` hex equals the
    SQL engines' md5, the (hash, id) order is total, and the estimate
    is an array index — so the completed stream output hash-matches
    the batch oracle bit-for-bit, under ANY micro-batch split.

    Scale: state is k (hash, id, value) triples per key — constant;
    the grouped shuffle is a batch groupBy's."""
    import hashlib

    est_cols = ", ".join(f"est_q{int(q * 100)} double" for q in qs)
    out_schema = f"{key_col} string, n_seen long, {est_cols}"
    state_schema = "n long, h array<string>, i array<long>, v array<double>"

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, hs, ids, vs = (
            state.get if state.exists else (0, [], [], [])
        )
        triples = list(zip(hs, ids, vs))
        for pdf in pdfs:
            n += len(pdf)
            for rid, val in zip(pdf[id_col], pdf[value_col]):
                rid = int(rid)
                triples.append(
                    (hashlib.md5(str(rid).encode()).hexdigest(), rid, float(val))
                )
        triples.sort(key=lambda t: (t[0], t[1]))
        triples = triples[:k]
        state.update(
            (
                n,
                [t[0] for t in triples],
                [t[1] for t in triples],
                [t[2] for t in triples],
            )
        )
        import math

        sample = sorted(t[2] for t in triples)
        m = len(sample)
        row = {key_col: [key[0]], "n_seen": [n]}
        for q in qs:
            idx = max(1, math.ceil(q * m))
            row[f"est_q{int(q * 100)}"] = [sample[idx - 1] if m else None]
        yield pd.DataFrame(row)

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_event_per_key(df: DataFrame) -> DataFrame:
    """Per-key LATEST-event materialization maintained in streaming
    state (``applyInPandasWithState``, update mode) — the CDC / log-
    compaction / SCD1 shape: a keyed change stream reduced to the one
    most recent row per key, kept incrementally. State per key is a
    single (ts_micros, event_id, event_type, value) tuple — bounded by
    |keys|, never by stream volume.

    Deterministic under ANY micro-batch split: the winning row
    maximizes (ts_micros, event_id) — a TOTAL order (event ids are
    unique) — and argmax over a union equals the argmax of per-batch
    argmaxes, so the completed output hash-matches the batch
    ROW_NUMBER oracle bit-for-bit. ``value`` rides along untouched
    (no arithmetic -> no float concerns).

    Input columns: ``user_id long, ts_micros long, event_id long,
    event_type string, value double``.
    """
    import numpy as np

    out_schema = (
        "user_id long, ts_micros long, event_id long, "
        "event_type string, value double"
    )
    state_schema = "t long, e long, y string, v double"

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            # lexsort: LAST key is primary -> max (ts_micros, event_id)
            j = int(
                np.lexsort(
                    (pdf["event_id"].to_numpy(), pdf["ts_micros"].to_numpy())
                )[-1]
            )
            v = pdf["value"].iloc[j]
            cand = (
                int(pdf["ts_micros"].iloc[j]),
                int(pdf["event_id"].iloc[j]),
                pdf["event_type"].iloc[j],
                None if pd.isna(v) else float(v),
            )
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "ts_micros": [best[0]],
                "event_id": [best[1]],
                "event_type": [best[2]],
                "value": [best[3]],
            }
        )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
