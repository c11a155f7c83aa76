"""Session-scoped registry for operator-internal persisted DataFrames.

Several operators persist an intermediate frame that the returned (lazy)
result references more than once — the encoded-token table in the set joins,
the signature/band tables in the dedup and ANN LSH paths. The cache is only
useful during the action that materializes the result, but a plain
``.persist()`` keeps the blocks alive for the whole session, so repeated
operator calls accumulate storage (ADVICE r3).

``persist_tracked`` is a drop-in replacement for ``.persist()`` that records
the frame in a module-level registry; callers invoke ``release_cached()``
once the result has been materialized (bench does this between queries, the
pipeline after every checkpointed stage). Releasing is always safe — an
unpersisted plan that is re-actioned simply recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later bulk release."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked intermediate; returns how many were released.

    Call after the operator result has been materialized (collected /
    written). Non-blocking: block removal proceeds asynchronously.
    """
    n = 0
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:  # session already stopped — nothing to release
            continue
        n += 1  # count only unpersists that actually succeeded (ADVICE r4)
    return n
