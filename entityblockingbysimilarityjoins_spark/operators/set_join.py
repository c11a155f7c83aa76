"""Exact set-similarity joins (Jaccard / Cosine / Dice) — SURVEY.md J1/J2.

Same output contract as the reference's partition-based set joins
(``/root/reference/cpp/common/setjoin.cc``, ``setjoin_parallel.cc``): every
pair whose (optionally IDF-weighted) similarity meets the threshold, self or
RS flavor, empty token sets never join (setjoin.cc:199-202), self pairs
canonicalized ``id1 < id2`` (blocker_util.cc:37-108).

The *algorithm* is Spark-native instead of the reference's inverted-index +
heap design: the classical prefix-filter candidate join (AllPairs/PPJoin
family, same family the reference's partition scheme descends from):

1. encode tokens as ints ordered rarest-first (``functions.dictionary``),
2. per record keep only the **prefix** (the rarest ``|x| - ceil(f(t)*|x|) + 1``
   tokens) — any qualifying pair must share a prefix token,
3. explode prefixes -> hash-partitioned equi-join on token (narrow rows:
   id/len/pos only, token arrays are NOT shuffled here),
4. prune with the length filter and the positional filter,
5. dropDuplicates -> join token arrays back -> verify the exact similarity
   with native ``array_intersect`` expressions (whole-stage codegen).

Scale levers (north_rule: "salted, skew-aware inverted-index self-join"):
- prefixes contain the *rarest* tokens, which bounds posting-list skew by
  construction; AQE skew-join splits what remains,
- ``max_token_freq`` optionally drops ultra-hot tokens from candidate
  generation (the reference's LIMIT_INV_SIZE/MAX_INV_SIZE valve,
  config.h:109-110) — logged, recall caveat, off by default,
- candidate rows are (token, id, len, pos): shuffle bytes stay minimal at
  100 TB; verification re-joins arrays only for surviving candidates.
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.dictionary import build_dictionary, encode_tokens
from ..functions import sim as S

log = logging.getLogger(__name__)

_EPS = 1e-9  # guard float error in ceil() bounds: prune conservatively


def _prefix_factor(sim: str, t: float) -> float:
    """Fraction of |x| that can be skipped: prefix = |x| - ceil(f*|x|) + 1."""
    if sim == "jac":
        return t
    if sim == "cos":
        return t * t
    if sim == "dice":
        return t / (2.0 - t)
    raise ValueError(f"set join does not support sim={sim!r}")


def _length_lb(sim: str, t: float, length: Column) -> Column:
    """Minimum partner size for a record of `length` tokens."""
    f = _prefix_factor(sim, t)
    return F.ceil(F.lit(f) * length - F.lit(_EPS))


def _min_overlap(sim: str, t: float, l1: Column, l2: Column) -> Column:
    """alpha(l1,l2): minimum |A∩B| required for sim >= t."""
    s = (l1 + l2).cast("double")
    if sim == "jac":
        v = F.lit(t / (1.0 + t)) * s
    elif sim == "cos":
        v = F.lit(t) * F.sqrt(l1.cast("double") * l2.cast("double"))
    elif sim == "dice":
        v = F.lit(t / 2.0) * s
    else:
        raise ValueError(sim)
    return F.ceil(v - F.lit(_EPS))


def _prepare(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    dictionary: DataFrame,
    weighted: bool,
    broadcast_dict: bool,
) -> DataFrame:
    """slim (rid, tids, len[, wt, idf_map]) with empties dropped (DROP_EMPTY)."""
    slim = df.select(F.col(id_col).alias("rid"), F.col(tokens_col).alias("toks"))
    enc = encode_tokens(
        slim, dictionary, id_col="rid", tokens_col="toks",
        weight_col="wt" if weighted else None, broadcast_dict=broadcast_dict,
    ).drop("toks")
    enc = enc.filter(F.size("tids") > 0).withColumn("len", F.size("tids"))
    if weighted:
        # per-record token->idf map so weighted overlap verifies natively
        d = dictionary.select("tid", "idf")
        if broadcast_dict:
            d = F.broadcast(d)
        m = (
            enc.select("rid", F.explode("tids").alias("tid"))
            .join(d, "tid")
            .groupBy("rid")
            .agg(F.map_from_arrays(F.collect_list("tid"), F.collect_list("idf")).alias("idf_map"))
        )
        enc = enc.join(m, "rid")
    return enc


def _candidates(
    left: DataFrame,
    right: DataFrame | None,
    sim: str,
    threshold: float,
    max_token_freq: int | None,
    dictionary: DataFrame,
) -> DataFrame:
    """Narrow candidate pairs (rid1, rid2) sharing a prefix token, pruned."""
    f = _prefix_factor(sim, threshold)

    def prefixed(df: DataFrame, side: str) -> DataFrame:
        plen = (F.col("len") - F.ceil(F.lit(f) * F.col("len") - F.lit(_EPS)) + 1).cast("int")
        e = df.select(
            F.col("rid").alias(f"rid{side}"),
            F.col("len").alias(f"len{side}"),
            F.posexplode(F.slice("tids", 1, plen)).alias(f"pos{side}", "tok"),
        )
        if max_token_freq is not None:
            hot = dictionary.filter(F.col("freq") > max_token_freq).select(F.col("tid").alias("tok"))
            e = e.join(F.broadcast(hot), "tok", "left_anti")
            log.warning(
                "set_join: dropping prefix tokens with freq > %d from candidate "
                "generation — recall may drop below the exact contract", max_token_freq,
            )
        return e

    l = prefixed(left, "1")
    r = prefixed(right if right is not None else left, "2")
    cond = [l["tok"] == r["tok"]]
    if right is None:
        cond.append(F.col("rid1") < F.col("rid2"))
    cand = l.join(r, cond)
    # length filter: least >= ceil(f * greatest)
    lo, hi = F.least("len1", "len2"), F.greatest("len1", "len2")
    cand = cand.filter(lo >= F.ceil(F.lit(f) * hi - F.lit(_EPS)))
    # positional filter: remaining tokens after the shared prefix token must
    # still allow alpha(l1,l2) overlaps (ppjoin bound; per-occurrence => safe superset)
    ub = F.lit(1) + F.least(F.col("len1") - F.col("pos1") - 1, F.col("len2") - F.col("pos2") - 1)
    cand = cand.filter(ub >= _min_overlap(sim, threshold, F.col("len1"), F.col("len2")))
    return cand.select("rid1", "rid2").dropDuplicates(["rid1", "rid2"])


def _verify(
    cand: DataFrame,
    left: DataFrame,
    right: DataFrame | None,
    sim: str,
    threshold: float,
    weighted: bool,
    sim_col: str,
) -> DataFrame:
    r = right if right is not None else left
    lcols = ["rid", "tids"] + (["wt", "idf_map"] if weighted else [])
    rcols = ["rid", "tids"] + (["wt"] if weighted else [])
    j = (
        cand.join(left.select(*lcols).withColumnsRenamed({"rid": "rid1", "tids": "t1", "wt": "w1"}), "rid1")
        .join(r.select(*rcols).withColumnsRenamed({"rid": "rid2", "tids": "t2", "wt": "w2"}), "rid2")
    )
    t1, t2 = F.col("t1"), F.col("t2")
    if weighted:
        wo = F.aggregate(
            F.array_intersect(t1, t2), F.lit(0.0),
            lambda acc, t: acc + F.element_at(F.col("idf_map"), t),
        )
        w1, w2 = F.col("w1"), F.col("w2")
        if sim == "jac":
            value = wo / (w1 + w2 - wo)
        elif sim == "cos":
            value = wo / F.sqrt(w1 * w2)
        else:
            value = F.lit(2.0) * wo / (w1 + w2)
    else:
        value = S.SET_SIMS[sim](t1, t2)
    return (
        j.withColumn(sim_col, value)
        .filter(F.col(sim_col) >= threshold)
        .select(F.col("rid1").alias("id1"), F.col("rid2").alias("id2"), sim_col)
    )


def set_similarity_self_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    sim: str = "jac",
    threshold: float = 0.8,
    weighted: bool = False,
    dictionary: DataFrame | None = None,
    broadcast_dict: bool = True,
    max_token_freq: int | None = None,
    sim_col: str = "sim",
) -> DataFrame:
    """All pairs (id1 < id2) with sim(tokens) >= threshold. See module doc."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if dictionary is None:
        dictionary = build_dictionary(df.select(F.col(tokens_col).alias("tokens")))
    # persist: the encoded table feeds both candidate generation and verification
    enc = _prepare(df, id_col, tokens_col, dictionary, weighted, broadcast_dict).persist()
    cand = _candidates(enc, None, sim, threshold, max_token_freq, dictionary)
    return _verify(cand, enc, None, sim, threshold, weighted, sim_col)


def set_similarity_rs_join(
    df_r: DataFrame,
    df_s: DataFrame,
    id_col: str,
    tokens_col: str,
    sim: str = "jac",
    threshold: float = 0.8,
    weighted: bool = False,
    dictionary: DataFrame | None = None,
    broadcast_dict: bool = True,
    max_token_freq: int | None = None,
    sim_col: str = "sim",
) -> DataFrame:
    """All (r, s) pairs with sim >= threshold; dictionary/IDF over R ∪ S."""
    if dictionary is None:
        union = df_r.select(F.col(tokens_col).alias("tokens")).unionAll(
            df_s.select(F.col(tokens_col).alias("tokens"))
        )
        dictionary = build_dictionary(union)
    left = _prepare(df_r, id_col, tokens_col, dictionary, weighted, broadcast_dict)
    right = _prepare(df_s, id_col, tokens_col, dictionary, weighted, broadcast_dict)
    cand = _candidates(left, right, sim, threshold, max_token_freq, dictionary)
    return _verify(cand, left, right, sim, threshold, weighted, sim_col)
