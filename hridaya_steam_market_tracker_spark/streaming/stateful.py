"""J4 in-stream: per-key backoff/health state as a custom stateful
streaming operator (applyInPandasWithState).

The driver-side dict in streaming/scheduler.py is correct at the
reference's scale (thousands of tracked items). This module is the
100 TB posture for the SAME state machine: when the keyed control state
outgrows one process (millions of keys), it moves into the stream —
Arrow-batched, checkpointed, partitioned by key — with identical
semantics: consecutive failures grow an exponential cooldown
(factor capped at 8, reference src/snoozerScheduler.py:206-212), any
success resets it.

Input rows:  (market_hash_name, stream, ok boolean, event_time)
Output rows: one per (key, batch): the post-batch backoff state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "market_hash_name string, stream string, "
    "consecutive_backoffs int, cooldown_factor int, healthy boolean"
)
STATE_SCHEMA = "consecutive_backoffs int"

MAX_BACKOFF_FACTOR = 8


def track_backoff_state(poll_results: DataFrame) -> DataFrame:
    """Wire the stateful operator over a streaming DataFrame of poll
    outcomes. One state row per (name, stream); update-mode output.

    The update function is a CLOSURE (not a module-level function) on
    purpose: cloudpickle then serializes it by value, so executors do
    not need this package importable — module-level functions are
    pickled by reference and break on workers whose PYTHONPATH lacks
    the repo (any non-repo-cwd driver, any real cluster without
    addPyFile).
    """
    max_factor = MAX_BACKOFF_FACTOR

    def update_backoff(
        key: tuple[str, str],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        import pandas as pd  # noqa: PLC0415 — resolve on the worker

        (n_backoffs,) = state.get if state.exists else (0,)
        for pdf in batches:
            # order within the batch by event time — replays deterministic
            for ok in pdf.sort_values("event_time")["ok"]:
                n_backoffs = 0 if ok else n_backoffs + 1
        state.update((n_backoffs,))
        factor = min(2 ** (n_backoffs - 1), max_factor) if n_backoffs else 0
        yield pd.DataFrame(
            {
                "market_hash_name": [key[0]],
                "stream": [key[1]],
                "consecutive_backoffs": [n_backoffs],
                "cooldown_factor": [factor],
                "healthy": [n_backoffs == 0],
            }
        )

    return poll_results.groupBy("market_hash_name", "stream").applyInPandasWithState(
        update_backoff,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def track_backoff_state_tws(poll_results: DataFrame) -> DataFrame:
    """The SAME backoff state machine on Spark 4's transformWithState
    API (StatefulProcessor + typed ValueState handles) — the current
    recommended stateful operator, with first-class state TTL, timers,
    and multiple state variables per key; applyInPandasWithState above
    is the legacy twin kept for comparison. Output and semantics are
    identical (asserted in tests).

    ENVIRONMENT GATE: the transformWithState protocol needs `protobuf`
    (pyspark.sql.streaming.proto) and the RocksDB state store provider;
    this sandbox ships neither protobuf nor pip, so the e2e test skips
    when `google.protobuf` is unavailable and the legacy-API test
    remains the executed guarantee. On a real cluster install protobuf
    and set spark.sql.streaming.stateStore.providerClass to
    RocksDBStateStoreProvider.

    The processor class is defined INSIDE this function so cloudpickle
    ships it by value — module-level classes pickle by reference and
    break on executors without this repo on PYTHONPATH.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    max_factor = MAX_BACKOFF_FACTOR

    class BackoffProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("backoff", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # noqa: PLC0415 — resolve on the worker

            (n_backoffs,) = self._state.get() if self._state.exists() else (0,)
            for pdf in rows:
                for ok in pdf.sort_values("event_time")["ok"]:
                    n_backoffs = 0 if ok else n_backoffs + 1
            self._state.update((n_backoffs,))
            factor = min(2 ** (n_backoffs - 1), max_factor) if n_backoffs else 0
            yield pd.DataFrame(
                {
                    "market_hash_name": [key[0]],
                    "stream": [key[1]],
                    "consecutive_backoffs": [n_backoffs],
                    "cooldown_factor": [factor],
                    "healthy": [n_backoffs == 0],
                }
            )

        def close(self) -> None:
            pass

    return poll_results.groupBy(
        "market_hash_name", "stream"
    ).transformWithStateInPandas(
        statefulProcessor=BackoffProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
