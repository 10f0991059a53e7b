"""Custom stateful streaming operators via applyInPandasWithState —
the Spark-native mechanism for the reference's in-progress state map
(apm/monitor.go:110-138 keeps a mutable map of started-but-unfinished
commands; a batch engine holds that as distributed keyed state).

`streaming_first_seen` = stateful exactly-once-per-key emission
(streaming dedup): the first event per key passes, later ones are
dropped, state expires on processing-time timeout so the state store
stays bounded — the pattern a 100 TB ingest pipeline uses to suppress
replays.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["streaming_first_seen"]


def streaming_first_seen(
    stream: DataFrame,
    key_col: str,
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Emit only the first row seen per key (streaming exact dedup).

    State per key is a single boolean; `timeout_ms` of processing-time
    inactivity clears it (bounded state — replays older than the window
    are admitted again, the standard at-scale tradeoff).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists and state.get[0]
        emitted = False
        for pdf in pdfs:
            if already or emitted or len(pdf) == 0:
                continue
            yield pdf.head(1)
            emitted = True
        if emitted or already:
            state.update((True,))
            state.setTimeoutDuration(timeout_ms)

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
