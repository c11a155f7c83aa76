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


def neardup_stream(
    pages_stream: DataFrame,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    hamming_k: int = 3,
    watermark: str = "1 hour",
    state_horizon_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful streaming NEAR-dup suppression (applyInPandasWithState).

    Per arriving page: 60-bit simhash over wspace tokens (same portable
    signature as the batch operator); pages whose signature is within
    ``hamming_k`` of one already seen in their bucket are dropped. Bucket =
    the first pigeonhole block (lowest 15 signature bits) — an approximate
    single-probe valve (a near-dup pair is caught iff it collides in that
    block, ~= (1 - k/60*15/...) of them); the batch ``simhash_pairs``
    remains the exact operator. State per bucket = the signature list, and
    it EXPIRES: an event-time timeout clears a bucket once the watermark
    passes its horizon, so the store is bounded by rate x horizon.

    Output: (id_col, ts_col, sig) of surviving pages.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.tokenize import tokens_wspace
    from ..operators.dedup import md5_token_hash, simhash_signature

    sig = simhash_signature(F.transform(tokens_wspace(F.col(text_col)), md5_token_hash))
    base = (
        pages_stream.withColumn("__sig", sig)
        .withColumn("__bucket", F.col("__sig").bitwiseAND(F.lit((1 << 15) - 1)))
        .withWatermark(ts_col, watermark)
        .select(id_col, ts_col, "__sig", "__bucket")
    )

    id_type = dict(pages_stream.dtypes)[id_col]  # urls or numeric doc ids
    out_schema = f"{id_col} {id_type}, {ts_col} timestamp, sig long"
    state_schema = "sigs array<long>"

    def dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (sigs,) = state.get if state.exists else ([],)
        sigs = list(sigs)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            keep = []
            for _, row in pdf.iterrows():
                s = int(row["__sig"])
                if all(bin(s ^ t).count("1") > hamming_k for t in sigs):
                    sigs.append(s)
                    keep.append((row[id_col], row[ts_col], s))
            if keep:
                import pandas as pd

                yield pd.DataFrame(keep, columns=[id_col, ts_col, "sig"])
        state.update((sigs,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + state_horizon_ms)

    return base.groupBy("__bucket").applyInPandasWithState(
        dedup, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
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
