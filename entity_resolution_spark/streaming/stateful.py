"""Custom stateful streaming operator via applyInPandasWithState.

Spark's built-in windows cover tumbling/session aggregation
(streaming/jobs.py); this module shows the CUSTOM state path for
semantics the built-ins can't express: per-key running crawl
statistics with explicit state schema and processing-time timeout —
the streaming analog of the incremental entity table (a key's state
survives across micro-batches, is updated in Arrow batches, and is
emitted+dropped when the key goes quiet).

State per key (e.g. domain): pages seen, distinct-fingerprint
estimate (bounded set), first/last event-time epoch. Output rows are
emitted on every update (Update mode) so downstream sinks always see
the freshest per-key stats.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_pages", T.LongType()),
        T.StructField("fps", T.ArrayType(T.StringType())),  # bounded distinct set
        T.StructField("first_ep", T.LongType()),
        T.StructField("last_ep", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_distinct_fp", T.LongType()),
        T.StructField("first_ep", T.LongType()),
        T.StructField("last_ep", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

MAX_TRACKED_FPS = 1024  # bound per-key state (exact below, floor above)


def _make_update(timeout_ms: int | None):
    def _update(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if timeout_ms is not None and state.hasTimedOut:
            n_pages, fps, first_ep, last_ep = state.get
            state.remove()
            yield pd.DataFrame(
                [[key[0], n_pages, len(fps), first_ep, last_ep, True]],
                columns=[f.name for f in OUTPUT_SCHEMA.fields],
            )
            return

        if state.exists:
            n_pages, fps, first_ep, last_ep = state.get
            fp_set = set(fps)
        else:
            n_pages, fp_set, first_ep, last_ep = 0, set(), None, None

        for pdf in pdf_iter:
            n_pages += len(pdf)
            eps = pdf["ep"]
            lo, hi = int(eps.min()), int(eps.max())
            first_ep = lo if first_ep is None else min(first_ep, lo)
            last_ep = hi if last_ep is None else max(last_ep, hi)
            if len(fp_set) < MAX_TRACKED_FPS:
                fp_set.update(pdf["fingerprint"].dropna().tolist())

        state.update((n_pages, sorted(fp_set)[:MAX_TRACKED_FPS], first_ep, last_ep))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [[key[0], n_pages, len(fp_set), first_ep, last_ep, False]],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )

    return _update


def running_key_stats(
    stream: DataFrame, key_col: str = "domain", timeout_ms: int | None = None
) -> DataFrame:
    """stream(key_col, fingerprint, ep:long) -> per-key running stats.

    ``timeout_ms`` set: keys quiet for that long are emitted with
    closed=True and their state dropped (bounded state on an infinite
    key space). CAVEAT: a processing-time timeout makes the engine
    schedule micro-batches continuously to fire expirations, so
    ``processAllAvailable()`` never quiesces — drive such queries with
    a real trigger, not the test harness. ``None`` (default): state is
    kept for the life of the query and emission is data-driven (safe
    for processAllAvailable)."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _make_update(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
