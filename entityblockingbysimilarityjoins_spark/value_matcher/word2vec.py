"""Seeded numpy word2vec (SGNS) + fastText-style subword variant — the V10
value-embedding alternatives.

The reference offers word2vec / fasttext / glove backends for the same
"coherent group" semantic labeling it runs with doc2vec
(``simjoin_entitymatching/value_matcher/word2vec.py:52-55`` trains
``gensim.models.word2vec.Word2Vec(vector_size=50, min_count=1, epochs=40)``
over the attribute corpus and labels a pair by the cosine of its summed
word vectors; ``fasttext.py:23-27`` loads pretrained wiki vectors whose
subword composition also embeds out-of-vocabulary words;
``glove.py:6-9`` is marked "under development — do not include it in
current project", which this port honors by not shipping a glove path).

gensim and pretrained vector files are not in this environment, so both
backends are small deterministic numpy trainers, exactly like the V1
PV-DBOW in ``doc2vec.py``:

- ``SeededWord2Vec`` — skip-gram with negative sampling over the tokenized
  values; every (center, context) pair within ``window`` gets one SGD step
  per epoch (sigmoid positive + ``negative`` unigram^0.75 samples),
  minibatched with scatter-adds so an epoch is a handful of numpy calls.
- ``SeededFastText`` — the same SGNS objective, but a center word's input
  vector is the MEAN of hashed char-n-gram bucket vectors (3..5-grams of
  ``<word>``) plus its own word row, and gradients scatter back onto those
  rows. That is the fastText property the reference relies on: a word never
  seen in training still gets a vector from its character n-grams, so dirty
  value variants ("ultrabok") land near their clean siblings.

All randomness flows from one seeded generator — same corpus + seed =>
identical vectors, which the V2 cosine-grouping stage requires for
reproducible groups.

Scale position (same as V1): training runs DRIVER-SIDE over the distinct
values of one attribute — the value vocabulary is orders of magnitude
smaller than the corpus, and the reference trains in one process too. The
corpus-side work (labeling every value pair, closure, normalization) stays
distributed in ``interchangeable.py``.
"""

from __future__ import annotations

import zlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .doc2vec import simple_tokens


def _char_ngrams(word: str, lo: int = 3, hi: int = 5) -> list[str]:
    """fastText-style subwords of ``<word>`` (boundary markers included)."""
    w = f"<{word}>"
    return [w[i:i + n] for n in range(lo, hi + 1)
            for i in range(len(w) - n + 1)]


class SeededWord2Vec:
    """Skip-gram negative sampling; deterministic given (corpus, seed)."""

    def __init__(self, vector_size: int = 50, min_count: int = 1,
                 epochs: int = 80, window: int = 5, negative: int = 5,
                 alpha: float = 0.025, min_alpha: float = 0.0001,
                 seed: int = 0, batch: int = 2048):
        self.vector_size = vector_size
        self.min_count = min_count
        self.epochs = epochs
        self.window = window
        self.negative = negative
        self.alpha = alpha
        self.min_alpha = min_alpha
        self.seed = seed
        self.batch = batch
        self.vocab: dict[str, int] = {}
        self.W_in: np.ndarray | None = None

    # ---- subword hooks (overridden by SeededFastText) ----
    def _init_input(self, rng: np.random.Generator) -> None:
        dim = self.vector_size
        self.W_in = (rng.random((len(self.vocab), dim)) - 0.5) / dim

    def _center_vectors(self, ci: np.ndarray) -> np.ndarray:
        return self.W_in[ci]

    def _apply_center_grad(self, ci: np.ndarray, grad: np.ndarray) -> None:
        np.add.at(self.W_in, ci, grad)

    def fit(self, docs: list[list[str]]) -> "SeededWord2Vec":
        rng = np.random.default_rng(self.seed)
        counts: dict[str, int] = {}
        for d in docs:
            for w in d:
                counts[w] = counts.get(w, 0) + 1
        self.vocab = {w: i for i, w in enumerate(
            sorted(w for w, c in counts.items() if c >= self.min_count))}
        dim = self.vector_size
        self._init_input(rng)
        if not self.vocab:
            return self
        W_out = np.zeros((len(self.vocab), dim))
        freq = np.array([counts[w] for w in self.vocab],
                        dtype=np.float64) ** 0.75
        noise_p = freq / freq.sum()
        centers, contexts = [], []
        for d in docs:
            ids = [self.vocab[w] for w in d if w in self.vocab]
            for i, c in enumerate(ids):
                for j in range(max(0, i - self.window),
                               min(len(ids), i + self.window + 1)):
                    if j != i:
                        centers.append(c)
                        contexts.append(ids[j])
        if not centers:
            return self
        pair_c = np.array(centers, dtype=np.int64)
        pair_o = np.array(contexts, dtype=np.int64)
        n_pairs = len(pair_c)
        for epoch in range(self.epochs):
            lr = max(self.alpha - (self.alpha - self.min_alpha)
                     * epoch / max(self.epochs - 1, 1), self.min_alpha)
            order = rng.permutation(n_pairs)
            for s in range(0, n_pairs, self.batch):
                ci = pair_c[order[s:s + self.batch]]
                oi = pair_o[order[s:s + self.batch]]
                b = len(ci)
                neg = rng.choice(len(self.vocab), size=(b, self.negative),
                                 p=noise_p)
                tgt = np.concatenate([oi[:, None], neg], axis=1)  # (b, 1+k)
                lbl = np.zeros((b, 1 + self.negative))
                lbl[:, 0] = 1.0
                cv = self._center_vectors(ci)               # (b, dim)
                ov = W_out[tgt]                             # (b, 1+k, dim)
                z = np.clip(np.einsum("bd,bkd->bk", cv, ov), -35.0, 35.0)
                g = (lbl - 1.0 / (1.0 + np.exp(-z))) * lr
                self._apply_center_grad(ci, np.einsum("bk,bkd->bd", g, ov))
                np.add.at(W_out, tgt.reshape(-1),
                          (g[:, :, None] * cv[:, None, :]).reshape(-1, dim))
        return self

    def word_vector(self, word: str) -> np.ndarray | None:
        """None for out-of-vocabulary words (the plain-word2vec contract)."""
        i = self.vocab.get(word)
        return None if i is None else self.W_in[i]

    def value_vector(self, value: str) -> np.ndarray:
        """Mean of token vectors (the reference sums; cosine is
        scale-invariant so mean == sum for the downstream labeling).
        All-OOV / empty values get the zero vector (cosine 0 to anything)."""
        vecs = [v for v in (self.word_vector(t) for t in simple_tokens(value))
                if v is not None]
        if not vecs:
            return np.zeros(self.vector_size)
        return np.mean(vecs, axis=0)


class SeededFastText(SeededWord2Vec):
    """SGNS whose input vectors are subword-bucket compositions — OOV words
    still embed via their char n-grams."""

    def __init__(self, *args, n_buckets: int = 4096, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_buckets = n_buckets
        self.W_sub: np.ndarray | None = None

    def _buckets(self, word: str) -> list[int]:
        # crc32, not hash(): Python string hashing is salted per process,
        # which would break the same-corpus-same-seed reproducibility the
        # V2 grouping stage depends on across driver restarts
        return [zlib.crc32(g.encode("utf-8")) % self.n_buckets
                for g in _char_ngrams(word)]

    def _init_input(self, rng: np.random.Generator) -> None:
        dim = self.vector_size
        # one row per n-gram bucket + one per vocab word (fastText keeps a
        # word-id row alongside the subwords) + one zero'd padding row
        self.W_sub = (rng.random((self.n_buckets + len(self.vocab) + 1, dim))
                      - 0.5) / dim
        pad = self.n_buckets + len(self.vocab)
        subs = [[self.n_buckets + i] + self._buckets(w)
                for w, i in sorted(self.vocab.items(), key=lambda kv: kv[1])]
        width = max((len(s) for s in subs), default=1)
        self._sub_pad = np.full((len(subs), width), pad, dtype=np.int64)
        for i, s in enumerate(subs):
            self._sub_pad[i, :len(s)] = s
        self._sub_mask = (self._sub_pad != pad).astype(np.float64)
        self._sub_n = np.maximum(self._sub_mask.sum(axis=1), 1.0)

    def _center_vectors(self, ci: np.ndarray) -> np.ndarray:
        rows = self.W_sub[self._sub_pad[ci]]            # (b, width, dim)
        return (rows * self._sub_mask[ci, :, None]).sum(axis=1) \
            / self._sub_n[ci, None]

    def _apply_center_grad(self, ci: np.ndarray, grad: np.ndarray) -> None:
        per_row = (grad[:, None, :] * self._sub_mask[ci, :, None]
                   / self._sub_n[ci, None, None])
        np.add.at(self.W_sub, self._sub_pad[ci].reshape(-1),
                  per_row.reshape(-1, self.W_sub.shape[1]))

    def word_vector(self, word: str) -> np.ndarray | None:
        rows = [self.W_sub[b] for b in self._buckets(word)]
        i = self.vocab.get(word)
        if i is not None:
            rows.append(self.W_sub[self.n_buckets + i])
        if not rows:
            return None  # words shorter than the smallest n-gram and OOV
        return np.mean(rows, axis=0)


def _value_vectors(model_cls, values_df: DataFrame, value_col: str,
                   seed: int, **kw) -> DataFrame:
    # valve-guarded collect — see doc2vec._collect_value_vocab (guide §5)
    from .doc2vec import _collect_value_vocab

    spark = values_df.sparkSession
    values = [r[0] for r in _collect_value_vocab(values_df, value_col)]
    model = model_cls(seed=seed, **kw).fit([simple_tokens(v) for v in values])
    rows = [(v, model.value_vector(v).tolist()) for v in values]
    return spark.createDataFrame(rows, f"{value_col} string, vec array<double>")


def word2vec_value_vectors(values_df: DataFrame, value_col: str = "value",
                           seed: int = 0, **kw) -> DataFrame:
    """(value, vec array<double>) for every distinct value — seeded SGNS."""
    return _value_vectors(SeededWord2Vec, values_df, value_col, seed, **kw)


def fasttext_value_vectors(values_df: DataFrame, value_col: str = "value",
                           seed: int = 0, **kw) -> DataFrame:
    """(value, vec) with subword composition — OOV-capable embeddings."""
    return _value_vectors(SeededFastText, values_df, value_col, seed, **kw)


def group_values_w2v(value_pairs: DataFrame, tau: float = 0.6,
                     backend: str = "word2vec", seed: int = 0,
                     closure: str = "cc", **kw) -> DataFrame:
    """V2+V3 with word2vec/fastText embeddings: cosine-label the value
    pairs, group by connectivity (same contract as
    ``interchangeable.group_values`` / ``doc2vec.group_values_doc2vec``)."""
    from .embed import cosine_sim
    from .interchangeable import group_edges

    fn = {"word2vec": word2vec_value_vectors,
          "fasttext": fasttext_value_vectors}[backend]
    vals = value_pairs.select(F.col("v1").alias("value")).unionAll(
        value_pairs.select(F.col("v2").alias("value")))
    vecs = fn(vals, "value", seed=seed, **kw)
    scored = (
        value_pairs
        .join(vecs.withColumnsRenamed({"value": "v1", "vec": "e1"}), "v1")
        .join(vecs.withColumnsRenamed({"value": "v2", "vec": "e2"}), "v2")
        .withColumn("cos", cosine_sim(F.col("e1"), F.col("e2")))
    )
    edges = scored.filter(F.col("cos") >= tau).select("v1", "v2")
    return group_edges(edges, closure)
