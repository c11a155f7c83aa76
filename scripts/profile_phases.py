"""Phase-level profiler for the heavy queries (guide §1.1 empirical loop).

Times each internal phase of set_similarity_self_join / topk_via_ta /
rematch by materializing the persisted intermediates one at a time, so the
incremental cost of every stage group is visible without the Spark UI.

Usage: python scripts/profile_phases.py [setjoin|weighted|topk|rematch|cc] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.operators.cache import release_cached
from entityblockingbysimilarityjoins_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time() - t0:.3f}s" + (f"  (n={out})" if isinstance(out, int) else ""))
    return out


def profile_setjoin(spark, sim="jac", threshold=0.8):
    import entityblockingbysimilarityjoins_spark.operators.set_join as SJ
    from entityblockingbysimilarityjoins_spark.functions.tokenize import tokens_dlm

    print(f"== set_join {sim}@{threshold} ==")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.col("doc_id").alias("rid"), tokens_dlm(F.col("text")).alias("tokens"))
    t_all = time.time()
    inline = _t("vocab probe", lambda: SJ._inline_vocab_unweighted(toks.select(F.col("tokens"))))
    n_mask = inline.n_words if inline is not None else None
    enc = SJ._prepare(toks, "rid", "tokens", None, False, True, n_mask_words=n_mask, inline=inline)
    _t("prepare/encode (persist)", lambda: enc.count())
    groups = enc.groupBy("tids").agg(
        F.collect_list("rid").alias("members"), F.min("rid").alias("rid"),
        F.first("len").alias("len"),
        *[F.first(f"__bm{w}").alias(f"__bm{w}") for w in range(n_mask or 0)])
    from entityblockingbysimilarityjoins_spark.operators.cache import persist_tracked
    groups = persist_tracked(groups)
    _t("group identical (persist)", lambda: groups.count())
    e = SJ._entries(groups, "1", sim, threshold, False, None, None, n_mask_words=n_mask)
    par = spark.sparkContext.defaultParallelism
    a = e.filter(F.col("short1")).repartition(2 * par)
    b_renames = {"rid1": "rid2", "t1": "t2", "len1": "len2",
                 "short1": "short2", "pos1": "pos2"}
    b_renames.update({f"__bm{w}1": f"__bm{w}2" for w in range(n_mask or 0)})
    b = e.withColumnsRenamed(b_renames)
    joined = a.join(b, "tok").filter(
        (F.col("len1") < F.col("len2"))
        | ((F.col("len1") == F.col("len2")) & (F.col("rid1") < F.col("rid2"))))
    verified = SJ._fused_verify(joined, sim, threshold, False, "sim", True,
                                n_mask_words=n_mask, inline=inline)
    _t("entries+join+verify", lambda: verified.count())
    g1 = groups.select(F.col("rid").alias("id1"), F.col("members").alias("m1"))
    g2 = groups.select(F.col("rid").alias("id2"), F.col("members").alias("m2"))
    cross = (verified.join(g1, "id1").join(g2, "id2")
             .withColumn("a", F.explode("m1")).withColumn("b", F.explode("m2"))
             .select(F.least("a", "b").alias("id1"), F.greatest("a", "b").alias("id2"), "sim"))
    intra = (groups.filter(F.size("members") >= 2)
             .select(F.explode("members").alias("a"), "members")
             .select("a", F.explode("members").alias("b"))
             .filter(F.col("a") < F.col("b"))
             .select(F.col("a").alias("id1"), F.col("b").alias("id2"), F.lit(1.0).alias("sim")))
    _t("expand+count", lambda: cross.unionByName(intra).count())
    print(f"  TOTAL: {time.time() - t_all:.3f}s")
    release_cached()


def profile_weighted(spark):
    from entityblockingbysimilarityjoins_spark.functions.dictionary import build_dictionary
    from entityblockingbysimilarityjoins_spark.functions.tokenize import tokens_dlm
    import entityblockingbysimilarityjoins_spark.operators.set_join as SJ
    from entityblockingbysimilarityjoins_spark.operators.cache import persist_tracked

    print("== weighted_jaccard_join phases ==")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.col("doc_id").alias("rid"), tokens_dlm(F.col("text")).alias("tokens"))
    t_all = time.time()
    d = build_dictionary(toks.select("tokens"))
    d = persist_tracked(d)
    _t("build_dictionary (persist)", lambda: d.count())
    inline = _t("inline vocab collect", lambda: SJ._inline_vocab(d))
    t0 = time.time()
    out = SJ.set_similarity_self_join(toks, "rid", "tokens", "jac", 0.7,
                                      weighted=True, dictionary=d)
    print(f"  full weighted join (given dict): {time.time() - t0:.3f}s pre-count")
    _t("count", lambda: out.count())
    print(f"  TOTAL: {time.time() - t_all:.3f}s")
    release_cached()


def profile_rematch(spark):
    import __spark_entry__ as E

    print("== rematch_res phases ==")
    from entityblockingbysimilarityjoins_spark.matcher.features import extract_features
    from entityblockingbysimilarityjoins_spark.matcher.persist import load_model, packaged_model_path
    from entityblockingbysimilarityjoins_spark.matcher.random_forest import apply_matcher
    from entityblockingbysimilarityjoins_spark.value_matcher.interchangeable import (
        extract_features_ic, group_values, value_pairs_from_matches)
    from entityblockingbysimilarityjoins_spark.operators.cache import persist_tracked

    t_all = time.time()
    model = _t("load model", lambda: load_model(packaged_model_path()))
    docs = E._docs(spark, SF)
    feats = E.doc_features()
    m = extract_features(E._pairs_only(spark, SF), docs, "doc_id", feats)
    predicted = apply_matcher(m, model)
    predicted = persist_tracked(predicted.select("id1", "id2", "match"))
    _t("pass1 features+predict (persist)", lambda: predicted.count())
    d = docs.select("doc_id", F.substring("text", 1, 16).alias("h16"))
    matches = (d.withColumnsRenamed({"doc_id": "id1", "h16": "h"})
               .join(d.withColumnsRenamed({"doc_id": "id2", "h16": "h"}), "h")
               .filter(F.col("id1") < F.col("id2")).select("id1", "id2"))
    vp = value_pairs_from_matches(matches, docs, "doc_id", "source")
    groups = _t("value grouping", lambda: group_values(vp, tau=0.5, dim=64, seed=0))
    negatives = predicted.filter(~F.col("match")).select("id1", "id2")
    t0 = time.time()
    neg_feats = extract_features_ic(negatives, docs, "doc_id", feats, {"source": groups})
    ckpt = neg_feats.localCheckpoint()
    print(f"  IC features + localCheckpoint: {time.time() - t0:.3f}s")
    rescored = apply_matcher(ckpt, model, threshold=0.25)
    recovered = rescored.filter(F.col("match")).select("id1", "id2")
    out = predicted.filter(F.col("match")).select("id1", "id2").unionByName(recovered)
    _t("rescore+union count", lambda: out.count())
    print(f"  TOTAL: {time.time() - t_all:.3f}s")
    release_cached()


def profile_cc(spark):
    import __spark_entry__ as E
    from entityblockingbysimilarityjoins_spark.operators.set_join import set_similarity_self_join
    from entityblockingbysimilarityjoins_spark.operators.connected_components import (
        DRIVER_CC_MAX_EDGES, _driver_cc)

    print("== connected_components phases ==")
    t_all = time.time()
    toks = E._doc_tokens(spark, SF)
    pairs = set_similarity_self_join(toks, "rid", "tokens", "jac", 0.9).select("id1", "id2")
    edges = (pairs.select(F.col("id1").alias("u"), F.col("id2").alias("v"))
             .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
             .filter(F.col("u") != F.col("v")))
    t0 = time.time()
    edges = edges.localCheckpoint()
    print(f"  join + localCheckpoint: {time.time() - t0:.3f}s")
    _t("limit probe", lambda: edges.limit(DRIVER_CC_MAX_EDGES + 1).count())
    pdf = _t("toPandas", lambda: edges.toPandas())
    t0 = time.time()
    out = _driver_cc(pdf, spark, "bigint")
    print(f"  driver cc + createDataFrame: {time.time() - t0:.3f}s")
    _t("final count", lambda: out.count())
    print(f"  TOTAL: {time.time() - t_all:.3f}s")
    release_cached()


def profile_topk(spark):
    import __spark_entry__ as E
    from entityblockingbysimilarityjoins_spark.operators.set_join import set_similarity_self_join
    from entityblockingbysimilarityjoins_spark.operators.topk import topk_via_ta

    print("== topk_ta phases ==")
    t_all = time.time()
    toks = E._doc_tokens(spark, SF)
    t0 = time.time()
    pairs = set_similarity_self_join(toks, "rid", "tokens", "jac", 0.8).select("id1", "id2")
    out = topk_via_ta(pairs, toks, k=200)
    print(f"  build: {time.time() - t0:.3f}s")
    _t("count", lambda: out.count())
    print(f"  TOTAL: {time.time() - t_all:.3f}s")
    release_cached()


def main():
    spark = get_spark(app_name="profile-phases", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{SF}/{t}.parquet").count()
    which = sys.argv[1:] or ["setjoin"]
    for w in which:
        for rep in range(int(os.environ.get("PROFILE_REPS", "2"))):
            print(f"--- rep {rep} ---")
            if w == "setjoin":
                profile_setjoin(spark)
            elif w == "weighted":
                profile_weighted(spark)
            elif w == "topk":
                profile_topk(spark)
            elif w == "rematch":
                profile_rematch(spark)
            elif w == "cc":
                profile_cc(spark)
    spark.stop()


if __name__ == "__main__":
    main()
