"""Deterministic value embeddings (SURVEY V1 stand-in).

The reference trains gensim Doc2Vec (vector_size=50, min_count=2, epochs=40 —
``simjoin_entitymatching/value_matcher/doc2vec.py:126-171``) over attribute
values. gensim is unavailable here and FIXTURES.md F9 prescribes seeded
deterministic vectors for tests, so we embed values with **character-n-gram
feature hashing**: each 3-gram hashes (seeded blake2b) to a bucket and a sign,
vectors are L2-normalized. Deterministic across runs/partitionings, vectorized
in an Arrow pandas UDF (no per-row Python calls into the JVM), and similar
strings land near each other — the property the cosine-grouping stage needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def _embed_numpy(values: pd.Series, dim: int, seed: int, n: int = 3) -> list:
    out = []
    for v in values:
        vec = np.zeros(dim, dtype=np.float64)
        if v is not None:
            s = f"^{v}$"
            for i in range(max(len(s) - n + 1, 0)):
                h = hashlib.blake2b(f"{seed}:{s[i:i+n]}".encode(), digest_size=8).digest()
                x = int.from_bytes(h, "big")
                vec[x % dim] += 1.0 if (x >> 62) & 1 else -1.0
            norm = np.linalg.norm(vec)
            if norm > 0:
                vec /= norm
        out.append(vec.astype(np.float32))
    return out


def hashed_embedding(col: Column | str, dim: int = 64, seed: int = 0) -> Column:
    """array<float> column: seeded char-3gram feature-hash embedding, L2-normed."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def _embed(vals: pd.Series) -> pd.Series:
        return pd.Series(_embed_numpy(vals, dim, seed))

    return _embed(F.col(col) if isinstance(col, str) else col)


def cosine_sim(a: Column, b: Column) -> Column:
    """Native cosine over two array<float> columns (zip_with + aggregate)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
