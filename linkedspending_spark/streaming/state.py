"""Custom stateful streaming operator: per-conversation progress state.

Upgrades the lambda split in :mod:`.ingest` — dataset-level aggregates
(turn counts, missing-value counters feeding the completeness ratio,
ConvertWorker.java:798-814) maintained *incrementally* on the stream
with ``applyInPandasWithState`` instead of batch re-aggregation. Each
micro-batch updates one state row per ``conv_id`` (Arrow-batched; no
per-row Python) and emits the running snapshot, so downstream sinks
always hold the newest per-conversation completeness without ever
rescanning landed data.

State is tiny (3 longs per conversation) and keyed by ``conv_id`` — at
10^9 conversations this is a few tens of GB spread across executors'
state stores, which Structured Streaming checkpoints (RocksDB-backed on
a real cluster) — the streaming analog of the batch manifest resume.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_missing", LongType()),
        StructField("max_turn_idx", LongType()),
        StructField("completeness", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_missing", LongType()),
        StructField("max_turn_idx", LongType()),
    ]
)

_N_PROPS = 4  # role, text, tool, ts — mirrors the batch completeness basis


def _update_conversation(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n_turns, n_missing, max_idx = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        tool = pdf["tool"].astype("string")
        tool_missing = tool.isna() | tool.str.strip().isin(["", "null"])
        n_missing += int(
            tool_missing.sum()
            + pdf["role"].isna().sum()
            + pdf["text"].isna().sum()
            + pdf["ts"].isna().sum()
        )
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_missing, max_idx))
    completeness = 1.0 - n_missing / (n_turns * _N_PROPS) if n_turns else 0.0
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_missing": [n_missing],
            "max_turn_idx": [max_idx],
            "completeness": [completeness],
        }
    )


def stream_conversation_progress(transcripts: DataFrame) -> DataFrame:
    """Running per-conversation completeness state over a stream."""
    return transcripts.groupBy("conv_id").applyInPandasWithState(
        _update_conversation,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
