"""Structured Streaming surface.

* :mod:`.ingest` — file-arrival transcript streams, stateless per-turn
  triple emission, windowed watermark aggregates;
* :mod:`.state` — ``applyInPandasWithState`` per-conversation running
  completeness state;
* :mod:`.sink` — ``foreachBatch`` triple landing with per-batch
  manifest rows (exactly-once via batch-keyed idempotence);
* :mod:`.canon` — incremental canonicalization: per-batch sameAs waves
  folded into a versioned ``(node, component)`` store with
  ``merge_components`` (O(wave) CC per batch, exactly-once).
"""

from .canon import read_assignments, stream_sameas_merge
from .ingest import (
    read_transcript_stream,
    run_stream_to_memory,
    stream_observation_triples,
    stream_turn_rate,
)
from .sink import stream_triples_to_table
from .state import stream_conversation_progress

__all__ = [
    "read_transcript_stream",
    "read_assignments",
    "run_stream_to_memory",
    "stream_observation_triples",
    "stream_sameas_merge",
    "stream_turn_rate",
    "stream_triples_to_table",
    "stream_conversation_progress",
]
