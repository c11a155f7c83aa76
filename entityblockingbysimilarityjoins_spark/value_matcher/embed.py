"""Deterministic value embeddings (SURVEY V1 stand-in).

The reference trains gensim Doc2Vec (vector_size=50, min_count=2, epochs=40 —
``simjoin_entitymatching/value_matcher/doc2vec.py:126-171``) over attribute
values. gensim is unavailable here and FIXTURES.md F9 prescribes seeded
deterministic vectors for tests, so we embed values with **character-n-gram
feature hashing**: each 3-gram of ``^value$`` hashes to a bucket and a sign
and contributes ±1 to that bucket. Deterministic across runs/partitionings,
vectorized in an Arrow pandas UDF, and similar strings land near each other —
the property the cosine-grouping stage needs.

Engine-portability (the V2-V5 correctness oracle): the gram hash is the
md5-prefix construction used across this repo — ``x = int(md5(f"{seed}:{gram}")
.hexdigest()[:15], 16)``, bucket ``x % dim``, sign from bit 59 — all
reproducible in ANSI SQL (DuckDB ``('0x'||substr(md5(s),1,15))::BIGINT``).
Components are **raw ±1 counts** (small integers in float64): cosine is
scale-invariant, so L2 normalization is deferred to ``cosine_sim``, and every
dot/norm is integer-exact — two engines agree bit-for-bit on the cosines, so
the grouping threshold has no float ambiguity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _embed_numpy(values: pd.Series, dim: int, seed: int, n: int = 3) -> list:
    out = []
    for v in values:
        vec = np.zeros(dim, dtype=np.float64)
        if v is not None:
            s = f"^{v}$"
            for i in range(max(len(s) - n + 1, 0)):
                x = int(
                    hashlib.md5(f"{seed}:{s[i:i+n]}".encode()).hexdigest()[:15], 16
                )
                vec[x % dim] += 1.0 if (x >> 59) & 1 else -1.0
        out.append(vec)
    return out


def hashed_embedding(col: Column | str, dim: int = 64, seed: int = 0) -> Column:
    """array<double> column: seeded char-3gram feature-hash count embedding."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(DoubleType()))
    def _embed(vals: pd.Series) -> pd.Series:
        return pd.Series(_embed_numpy(vals, dim, seed))

    return _embed(F.col(col) if isinstance(col, str) else col)


def cosine_sim(a: Column, b: Column) -> Column:
    """Native cosine over two array<double> columns (zip_with + aggregate)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
