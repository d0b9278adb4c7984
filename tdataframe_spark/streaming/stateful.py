"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's answer to "operators Spark lacks" in streaming form: arbitrary
per-key state machines (sessionization with emit-on-timeout, running
de-duplication, custom accumulators) that the built-in windowed aggregates
can't express. State lives in Spark's state store (per key, checkpointed);
each micro-batch delivers a key's new rows to ``func`` with its state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_session_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Stateful streaming sessionization: per user, count sessions (gap >
    ``gap_seconds`` starts a new one) across micro-batches.

    Emits one row per user per batch with the running session count —
    the streaming twin of ``operators.windows.sessionize`` (whose batch
    results it matches when all data has arrived).

    State per key: (last_ts_epoch_us, n_sessions).

    Ordering contract: rows are sorted within each micro-batch, but a
    gap-based session boundary is inherently order-sensitive ACROSS
    batches — the source must deliver a key's events in (approximate)
    event-time order, as a per-key-partitioned log (Kafka) does. For
    unordered sources, add a watermark-delayed buffer in front.

    The output key column carries ``user_col``'s name and type (string
    keys work; the key is never coerced to long).
    """
    gap_us = gap_seconds * 1_000_000
    key_type = events.schema[user_col].dataType.simpleString()

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, n_sessions = state.get
        else:
            last_us, n_sessions = None, 0
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf[ts_col].tolist())
        for t in sorted(ts_all):
            t_us = int(pd.Timestamp(t).value // 1_000)
            if last_us is None or t_us - last_us > gap_us:
                n_sessions += 1
            last_us = t_us
        state.update((last_us, n_sessions))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_sessions": [n_sessions]}
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"{user_col} {key_type}, n_sessions long",
            stateStructType="last_us long, n_sessions long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_running_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) via ``transformWithStateInPandas`` —
    Spark 4's typed-state successor to ``applyInPandasWithState``: state is
    a declared ValueState the store can evolve/inspect, not an opaque
    tuple. Emits each key's running totals every micro-batch it appears
    in; once a stream drains, the totals equal the batch groupBy.

    Runtime requirement: the TWS python worker speaks protobuf to the JVM,
    so ``google.protobuf`` must be installed (absent in some sandboxes —
    the ``applyInPandasWithState`` operators above have no such
    dependency).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += int(len(pdf))
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {user_col: [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    key_type = events.schema[user_col].dataType.simpleString()
    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=f"{user_col} {key_type}, n long, total double",
        outputMode="Update",
        timeMode="None",
    )
