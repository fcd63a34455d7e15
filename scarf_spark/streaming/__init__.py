"""Structured Streaming surface (SURVEY.md §2.11).

The reference has no event-time streaming — its "streaming" is chunked
sequential passes for bounded memory (``scarf/readers.py`` consume()
generators, ``scarf/ann.py:187-189`` iter_blocks). Spark subsumes that
with ordinary batch DataFrames; this package adds the *natural Spark
extension* the survey calls out (§2.11): incremental ingest and
event-time analytics over an append-only event table via Structured
Streaming — watermarks, tumbling/sliding windows, stateful
sessionization — with batch twins for oracle verification.
"""

from scarf_spark.streaming.events import (  # noqa: F401
    attribution_join,
    attribution_stream,
    cms_sketch_stream,
    decontaminate_stream,
    enrich_events,
    read_documents_stream,
    event_type_rate,
    first_event_dedup,
    hll_distinct_stream,
    kmv_distinct_stream,
    read_events_stream,
    sessionize_batch,
    sessionize_stream,
    sliding_window_counts,
    stream_to_parquet,
    stream_upsert_parquet,
    tumbling_window_counts,
)
