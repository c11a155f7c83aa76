"""Exact overlap join: all pairs with |A ∩ B| >= c — SURVEY.md J3.

Output contract of the reference's SIGMOD'18-style overlap join
(``/root/reference/cpp/common/ovlpjoin.cc:592-680``): every pair of records
sharing at least ``c`` tokens; records with fewer than ``c`` tokens are
dropped (short-record drop, ovlpjoin.cc:607-644); tokens of global frequency
< 2 cannot produce a pair and are skipped.

Spark-native plan: instead of the reference's c-sized combination inverted
lists, use the **prefix filter specialized to overlap**: order tokens
rarest-first (functions.dictionary); if |A∩B| >= c, the two records must share
a token among their first ``len - c + 1`` rarest tokens. Explode that prefix,
equi-join on token, dedupe, verify ``size(array_intersect) >= c`` natively.
The c-1 most frequent tokens of every record never enter the shuffle — the
exact skew relief the combination index bought, without driver-side heaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dictionary import build_dictionary, encode_tokens
from .cache import persist_tracked
from .set_join import (
    _InlineVocab,
    _inline_vocab,
    _inline_vocab_unweighted,
    _mask_cols,
    _mask_overlap,
)


def _vocab_and_singletons(df_tokens: DataFrame, dictionary: DataFrame | None):
    """(inline, singleton_tids, dictionary): the one-job probe when no
    dictionary was supplied (singleton tids derived in Python from the
    collected freqs), else the probe over the given dictionary with the
    freq<2 filter as a frame."""
    if dictionary is None:
        inline = _inline_vocab_unweighted(df_tokens)
        if inline is not None:
            singles = [inline.tid_by_token[t]
                       for t, f in inline.freqs.items() if f < 2]
            return inline, singles, None
        dictionary = build_dictionary(df_tokens)
    return _inline_vocab(dictionary), None, dictionary


def _prep(df: DataFrame, id_col: str, tokens_col: str, c: int, dictionary: DataFrame,
          broadcast_dict: bool, inline: _InlineVocab | None = None) -> DataFrame:
    slim = df.select(F.col(id_col).alias("rid"), F.col(tokens_col).alias("toks"))
    if inline is not None:
        # tiny-vocab path (see set_join): literal-map encode, zero exchanges
        tids = F.array_sort(
            F.filter(
                F.transform("toks", lambda t: F.element_at(inline.token_map, t)),
                lambda x: x.isNotNull(),
            )
        ).cast("array<int>")
        enc = slim.select("rid", tids.alias("tids"))
    else:
        enc = encode_tokens(slim, dictionary, id_col="rid", tokens_col="toks",
                            weight_col=None, broadcast_dict=broadcast_dict,
                            drop_empty=True).drop("toks")
    enc = enc.filter(F.size("tids") >= c).withColumn("len", F.size("tids"))
    if inline is not None:
        enc = enc.withColumns(
            {f"__bm{w}": col for w, col in
             enumerate(_mask_cols(F.col("tids"), inline.n_words))})
    return enc


def _prefix(enc: DataFrame, c: int, side: str, singletons,
            n_mask_words: int | None = None) -> DataFrame:
    payload = ([F.col(f"__bm{w}").alias(f"__bm{w}{side}")
                for w in range(n_mask_words)] if n_mask_words else [])
    e = enc.select(
        F.col("rid").alias(f"rid{side}"),
        *payload,
        F.explode(F.slice("tids", 1, F.col("len") - F.lit(c - 1))).alias("tok"),
    )
    if isinstance(singletons, list):
        if singletons:  # Python-derived singleton tids -> codegen NOT IN set
            e = e.filter(~F.col("tok").isin(singletons))
    elif singletons is not None:
        e = e.join(F.broadcast(singletons), e["tok"] == singletons["stid"], "left_anti")
    return e


def overlap_self_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    c: int = 1,
    dictionary: DataFrame | None = None,
    broadcast_dict: bool = True,
    count_col: str = "overlap",
) -> DataFrame:
    """All pairs (id1 < id2) sharing >= c tokens, with the exact overlap count."""
    if c < 1:
        raise ValueError("overlap threshold c must be >= 1")
    inline, singles, dictionary = _vocab_and_singletons(
        df.select(F.col(tokens_col).alias("tokens")), dictionary)
    singletons = (singles if singles is not None else
                  dictionary.filter(F.col("freq") < 2).select(F.col("tid").alias("stid")))
    n_mask = inline.n_words if inline is not None else None
    enc = _prep(df, id_col, tokens_col, c, dictionary, broadcast_dict,
                inline=inline).transform(persist_tracked)
    # fan-out repartition (see set_join): prefix entries are tiny relative
    # to the candidate pairs the join emits
    par = df.sparkSession.sparkContext.defaultParallelism
    l = _prefix(enc, c, "1", singletons, n_mask).repartition(2 * par)
    r = _prefix(enc, c, "2", singletons, n_mask)
    joined = l.join(r, (l["tok"] == r["tok"]) & (F.col("rid1") < F.col("rid2")))
    if n_mask:
        # fused bitset verify: the mask words ride the prefix entries, the
        # exact overlap is bit_count(m1 & m2) INSIDE the join stage, and only
        # verified pairs reach the dedup exchange — no candidate-set shuffle,
        # no re-attach joins (guide §2.4; identical counts)
        return (
            joined.withColumn(count_col, _mask_overlap("1", "2", n_mask))
            .filter(F.col(count_col) >= c)
            .select(F.col("rid1").alias("id1"), F.col("rid2").alias("id2"), count_col)
            .dropDuplicates(["id1", "id2"])
        )
    cand = joined.select("rid1", "rid2").dropDuplicates(["rid1", "rid2"])
    return (
        cand.join(enc.select(F.col("rid").alias("rid1"), F.col("tids").alias("t1")), "rid1")
        .join(enc.select(F.col("rid").alias("rid2"), F.col("tids").alias("t2")), "rid2")
        .withColumn(count_col, F.size(F.array_intersect("t1", "t2")))
        .filter(F.col(count_col) >= c)
        .select(F.col("rid1").alias("id1"), F.col("rid2").alias("id2"), count_col)
    )


def overlap_rs_join(
    df_r: DataFrame,
    df_s: DataFrame,
    id_col: str,
    tokens_col: str,
    c: int = 1,
    dictionary: DataFrame | None = None,
    broadcast_dict: bool = True,
    count_col: str = "overlap",
) -> DataFrame:
    """All (r, s) pairs sharing >= c tokens (ovlpjoin.cc:376-447 contract)."""
    if c < 1:
        raise ValueError("overlap threshold c must be >= 1")
    union = None
    if dictionary is None:
        union = df_r.select(F.col(tokens_col).alias("tokens")).unionAll(
            df_s.select(F.col(tokens_col).alias("tokens")))
    inline, singles, dictionary = _vocab_and_singletons(union, dictionary)
    singletons = (singles if singles is not None else
                  dictionary.filter(F.col("freq") < 2).select(F.col("tid").alias("stid")))
    n_mask = inline.n_words if inline is not None else None
    left = _prep(df_r, id_col, tokens_col, c, dictionary, broadcast_dict,
                 inline=inline).transform(persist_tracked)
    right = _prep(df_s, id_col, tokens_col, c, dictionary, broadcast_dict,
                  inline=inline).transform(persist_tracked)
    l = _prefix(left, c, "1", singletons, n_mask)
    r = _prefix(right, c, "2", singletons, n_mask)
    joined = l.join(r, l["tok"] == r["tok"])
    if n_mask:
        # fused bitset verify — see overlap_self_join
        return (
            joined.withColumn(count_col, _mask_overlap("1", "2", n_mask))
            .filter(F.col(count_col) >= c)
            .select(F.col("rid1").alias("id1"), F.col("rid2").alias("id2"), count_col)
            .dropDuplicates(["id1", "id2"])
        )
    cand = joined.select("rid1", "rid2").dropDuplicates(["rid1", "rid2"])
    return (
        cand.join(left.select(F.col("rid").alias("rid1"), F.col("tids").alias("t1")), "rid1")
        .join(right.select(F.col("rid").alias("rid2"), F.col("tids").alias("t2")), "rid2")
        .withColumn(count_col, F.size(F.array_intersect("t1", "t2")))
        .filter(F.col(count_col) >= c)
        .select(F.col("rid1").alias("id1"), F.col("rid2").alias("id2"), count_col)
    )
