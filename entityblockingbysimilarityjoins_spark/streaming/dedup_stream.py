"""Structured-streaming ingest dedup (beyond the batch-only reference).

The reference is batch-only (SURVEY §2.11); this module adds the streaming
shape a continuously-crawled corpus needs: incremental exact/near-canonical
dedup of arriving pages by content fingerprint, with a watermark bounding
state. ``dropDuplicatesWithinWatermark`` keyed on the md5 fingerprint is the
built-in stateful operator — fingerprints older than the watermark horizon
are purged from state (plain ``dropDuplicates`` on a non-event-time key would
grow state unboundedly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_stats import fingerprint


def dedup_stream(
    pages_stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DF -> streaming DF keeping the first page per content
    fingerprint within the watermark horizon. State for a fingerprint is
    dropped once the watermark passes its event time, so the store is bounded
    by the ingest rate x horizon, not the corpus size."""
    return (
        pages_stream.withColumn("__fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def page_rate(
    pages_stream: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window page counts per lang (late data handled by watermark)."""
    return (
        pages_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("lang"))
        .agg(F.count("*").alias("n_pages"))
    )
