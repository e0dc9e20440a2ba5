"""Custom stateful streaming operator: per-key CDC progress tracked in
``applyInPandasWithState``.

Where ``microbatch.stream_apply`` lands every event in the lake,
this operator maintains a SMALL running summary per key across
micro-batches — cumulative event count and the current LWW winner
(max ``(warc_ts, seq)``) with its tombstone flag — and emits the keys
touched by each batch. It is the streaming-native shape for "what is
the live state of key X right now?" without a lake read: state lives in
the streaming state store (checkpointed, partitioned by key hash), so
it scales horizontally with executors and survives restarts.

Design notes for scale:
* state per key is 4 scalars (O(keys) total, no payload bytes — html
  never enters the state store);
* Arrow-batched: each group's events arrive as pandas DataFrames, and
  the per-batch reduction is a vectorized idxmax, not a Python row loop;
* timestamps are carried as epoch-milliseconds in state/output — Arrow
  round-trips of tz-naive timestamps through the state store are a
  known foot-gun, and the consumer can cast back losslessly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "url string, events_total long, latest_ts_ms long, latest_seq long, deleted boolean"
)
STATE_SCHEMA = "events_total long, latest_ts_ms long, latest_seq long, deleted boolean"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        total, ts_ms, seq, deleted = state.get
    else:
        total, ts_ms, seq, deleted = 0, -1, -1, False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        total += len(pdf)
        # normalize to epoch-ms regardless of the Arrow-delivered unit
        # (pandas 2 may materialize timestamps at ns OR us precision)
        ms = pdf["warc_ts"].to_numpy().astype("datetime64[ms]").astype("int64")
        sq = pdf["seq"].to_numpy().astype("int64")
        # LWW total order (warc_ts, seq): vectorized lexicographic argmax
        i = int(np.lexsort((sq, ms))[-1])
        if (int(ms[i]), int(sq[i])) > (ts_ms, seq):
            ts_ms, seq = int(ms[i]), int(sq[i])
            deleted = bool(pdf["op"].iloc[i] == "D")
    state.update((total, ts_ms, seq, deleted))
    yield pd.DataFrame(
        [[key[0], total, ts_ms, seq, deleted]],
        columns=["url", "events_total", "latest_ts_ms", "latest_seq", "deleted"],
    )


def stateful_key_progress(stream: DataFrame, key: str = "url") -> DataFrame:
    """Running per-key progress, one output row per touched key per
    micro-batch (update mode). Requires columns (url, warc_ts, seq, op)."""
    return stream.groupBy(key).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
