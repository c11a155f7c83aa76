"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 over the
driver-generated testdata tables; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for the side-by-side correctness gate. Column names and float
arithmetic are kept bit-compatible between both engines (same operand order).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.functions.tokenize import tokens_dlm
from entityblockingbysimilarityjoins_spark.operators.blocker import block_self
from entityblockingbysimilarityjoins_spark.operators.connected_components import (
    connected_components,
)
from entityblockingbysimilarityjoins_spark.operators.edit_join import (
    edit_distance_self_join,
)
from entityblockingbysimilarityjoins_spark.operators.exact_join import (
    absolute_norm_self_join,
    exact_self_join,
)
from entityblockingbysimilarityjoins_spark.operators.overlap_join import (
    overlap_self_join,
)
from entityblockingbysimilarityjoins_spark.operators.set_join import (
    set_similarity_self_join,
)
from entityblockingbysimilarityjoins_spark.operators.topk import topk_via_ta
from entityblockingbysimilarityjoins_spark.functions.text_stats import (
    fingerprint,
    lang_id,
    quality_score,
    subword_count,
    token_count,
    winnow_fingerprint,
)
from entityblockingbysimilarityjoins_spark.functions.tokenize import tokens_wspace
from entityblockingbysimilarityjoins_spark.operators.ann import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
)
from entityblockingbysimilarityjoins_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from entityblockingbysimilarityjoins_spark.sources.rules import Rule

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

#: DuckDB regex for the blocking delimiter set " \"',\\\t\r\n"
_DLM_RE_SQL = "[ \"'',\\\\\t\r\n]+"

#: DuckDB CTE producing the same token sets as functions.tokenize.tokens_dlm
_TOK_CTE = (
    "WITH tk AS (SELECT doc_id, "
    f"list_sort(list_distinct(list_filter(string_split_regex(text, '{_DLM_RE_SQL}'), "
    "x -> x <> ''))) AS tokens FROM documents)"
)

_OVLP = "len(list_intersect(a.tokens, b.tokens))"

#: whitespace tokens (single-space delimiter runs), matching tokens_wspace
_WS_CTE = (
    "WITH tk AS (SELECT doc_id, "
    "list_sort(list_distinct(list_filter(string_split_regex(text, ' +'), "
    "x -> x <> ''))) AS tokens FROM documents)"
)

#: character 5-grams: fully-alphanumeric 5-char windows, matching tokens_qgram
_QG5_CTE = (
    "WITH tk AS (SELECT doc_id, "
    "list_sort(list_distinct(list_filter("
    "list_transform(range(1, greatest(length(text) - 4, 0) + 1), "
    "i -> substring(text, i, 5)), "
    "x -> regexp_matches(x, '^[a-zA-Z0-9]{5}$')))) AS tokens FROM documents)"
)

from entityblockingbysimilarityjoins_spark.functions.text_stats import LANG_MARKERS as _LM

_ALL_MARKERS_SQL = "[" + ", ".join(
    f"'{w}'" for ws in _LM.values() for w in ws) + "]"
_LANG_HITS_SQL = ", ".join(
    "len(list_intersect(list_distinct(list_transform(wtoks, x -> lower(x))), ["
    + ", ".join(f"'{w}'" for w in ws) + f"])) AS h_{lang}"
    for lang, ws in _LM.items()
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        F.col("doc_id").alias("rid"), tokens_dlm(F.col("text")).alias("tokens")
    )


# ---------------------------------------------------------------------------
# queries (Spark side)
# ---------------------------------------------------------------------------

def _q_set_join(kind: str, threshold: float):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return set_similarity_self_join(
            _doc_tokens(spark, sf_dir), "rid", "tokens", sim=kind, threshold=threshold
        ).select("id1", "id2", "sim")

    return run


def _q_overlap(c: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return overlap_self_join(_doc_tokens(spark, sf_dir), "rid", "tokens", c=c)

    return run


def _q_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir).select("doc_id", F.substring("text", 1, 24).alias("head"))
    return edit_distance_self_join(df, "doc_id", "head", d=4)


def _q_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 16-char text heads have real duplicate groups in the corpus — a
    # non-vacuous exercise of the exact join (full text is duplicate-free)
    df = _docs(spark, sf_dir).withColumn("head16", F.substring("text", 1, 16))
    return exact_self_join(df, "doc_id", "head16")


def _q_anm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return absolute_norm_self_join(_docs(spark, sf_dir), "doc_id", "n_chars", threshold=0.98)


_BLOCK_RULES = [
    Rule("text", "jac", "dlm", None, 0.85),
    Rule("head", "lev", None, None, 3.0, "-"),
    Rule("n_chars", "anm", None, None, 0.995),
]


def _q_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir).withColumn("head", F.substring("text", 1, 24))
    return block_self(df, "doc_id", _BLOCK_RULES)


def _q_blocking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 as a one-row query: recall / |C| / CSSR of the rule-union blocker
    against the h16 pseudo-gold (blocker.py::blocking_metrics semantics,
    ref block.cc:316-321), computed declaratively so the whole metric rides
    one job: three aggregates cross-joined."""
    cand = _q_block(spark, sf_dir).select("id1", "id2")
    gold = _h16_gold(spark, sf_dir)
    hits = cand.join(gold, ["id1", "id2"], "left_semi")         .agg(F.count("*").alias("hits"))
    n_gold = gold.agg(F.count("*").alias("n_gold"))
    n_cand = cand.agg(F.count("*").alias("n_cand"))
    n_rows = _docs(spark, sf_dir).agg(F.count("*").alias("n_rows"))
    return (
        hits.crossJoin(n_gold).crossJoin(n_cand).crossJoin(n_rows)
        .select(
            F.round(F.col("hits") / F.col("n_gold"), 6).alias("recall"),
            F.col("n_cand").alias("candidates"),
            F.col("n_gold").alias("gold"),
            F.round(F.col("n_cand")
                    / (F.col("n_rows") * (F.col("n_rows") - 1) / 2), 9)
            .alias("cssr"),
        )
    )


def _h16_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-gold for blocking metrics: pairs sharing a 16-char text head."""
    d = _docs(spark, sf_dir).select("doc_id", F.substring("text", 1, 16).alias("h16"))
    return (
        d.withColumnsRenamed({"doc_id": "id1", "h16": "h"})
        .join(d.withColumnsRenamed({"doc_id": "id2", "h16": "h"}), "h")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )


def _q_rule_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule recall table (getRecall4Rules, ref block.cc:325-398): one row
    per blocking rule with recall / |C_rule| / hits / contribution (pairs only
    that rule found) / CSSR against the h16 pseudo-gold — the table a user
    tuning rules reads first (VERDICT r4 missing #2)."""
    from entityblockingbysimilarityjoins_spark.operators.blocker import (
        per_rule_recall,
    )

    df = _docs(spark, sf_dir).withColumn("head", F.substring("text", 1, 24))
    return per_rule_recall(df, "doc_id", _BLOCK_RULES, _h16_gold(spark, sf_dir))


def _q_block_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3/K4 valve, oracled (VERDICT r4 #7): block_union with
    max_pairs_per_rule=500. At sf0.01 this truncates r1 (16,771 pairs) and r3
    (762) to their TA-top-500 (score DESC, id1, id2 — deterministic) while r2
    (25) passes through untouched, so both the capped and uncapped branches
    are exercised in one query."""
    df = _docs(spark, sf_dir).withColumn("head", F.substring("text", 1, 24))
    return block_self(df, "doc_id", _BLOCK_RULES, max_pairs_per_rule=500)


def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused K1: identical rows to topk_via_ta over the jac>=0.8 self join,
    # computed at the token-set-group level (operators/topk.py docstring)
    from entityblockingbysimilarityjoins_spark.operators.topk import (
        topk_over_self_join,
    )

    toks = _doc_tokens(spark, sf_dir)
    return topk_over_self_join(toks, k=200, sim="jac", threshold=0.8)


def _q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # identical rows to connected_components over the expanded jac>=0.9 join:
    # CC runs on the set-level graph and members inherit their group's label
    # (connected_components_over_groups docstring has the equivalence proof)
    from entityblockingbysimilarityjoins_spark.operators.connected_components import (
        connected_components_over_groups,
    )
    from entityblockingbysimilarityjoins_spark.operators.set_join import (
        _self_join_parts,
    )

    verified, groups = _self_join_parts(
        _doc_tokens(spark, sf_dir), "rid", "tokens", "jac", 0.9)
    return connected_components_over_groups(
        verified.select("id1", "id2"), groups)


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicate_groups(_docs(spark, sf_dir), "doc_id", ["text"])


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("rid"), tokens_wspace(F.col("text")).alias("tokens"))
    return minhash_lsh_pairs(toks, "rid", "tokens", threshold=0.9)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("rid"), tokens_wspace(F.col("text")).alias("tokens"))
    return simhash_pairs(toks, "rid", "tokens", hamming_k=3)


def _q_ngram_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), "doc_id", "text",
                               threshold=0.7, q=5).withColumn("sim", F.round("sim", 6))


def _q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.3,
                                   method="blas").withColumn("cos", F.round("cos", 6))


def _q_emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH scale path of embedding near-dup (md5 hyperplane bands +
    id-only band join + exact verify) — full approximate pipeline reproduced
    in the SQL oracle, like ann_lsh_topk."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.3,
                                   method="lsh", n_planes=6, n_bands=8,
                                   ).withColumn("cos", F.round("cos", 6))


def _q_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_bruteforce_topk(emb, emb, "vec_id", "embedding", k=5).withColumn(
        "cos", F.round("cos", 6))


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(emb, emb, "vec_id", "embedding", k=5).withColumn(
        "cos", F.round("cos", 6))


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN scale path: md5-seeded deterministic coarse quantizer
    (8 cells), 2-probe search, exact cosine re-rank within the probed
    inverted lists — the whole approximate pipeline mirrored in SQL."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivf_topk(emb, emb, "vec_id", "embedding", k=5, n_cells=8,
                        n_probe=2, seed=7).withColumn("cos", F.round("cos", 6))


_STREAM_SEQ = itertools.count()


def _run_stream_to_table(out, name_prefix: str) -> str:
    """Drive a streaming DF to a memory sink with Trigger.AvailableNow and
    return the (unique) table name once the source is exhausted."""
    name = f"{name_prefix}_{next(_STREAM_SEQ)}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    # awaitTermination returns False on timeout with the query still running;
    # reading the memory sink then would present PARTIAL results as verified
    # output. Fail loudly instead (ADVICE r4).
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"stream {name} did not drain within 300s")
    return name


def _doc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a stream with deterministic event times
    (epoch + doc_id seconds — the table carries no timestamp column)."""
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long")
        .option("pathGlobFilter", "documents.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    return stream.withColumn(
        "warc_ts",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")))


def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup == batch one-survivor-per-fingerprint:
    dedup_stream (dropDuplicatesWithinWatermark on the content fingerprint)
    over the document corpus replayed as one AvailableNow batch.

    The check is ORDER-INDEPENDENT (ADVICE r4): which row survives a
    fingerprint group is "first seen", which with a multi-split source is
    shuffle-order nondeterministic — so the verified invariant is group
    membership, not the kept id: exactly one survivor per fingerprint and
    every fingerprint covered. Output: (fp, n_kept=1) per group."""
    from entityblockingbysimilarityjoins_spark.functions.text_stats import (
        fingerprint,
    )
    from entityblockingbysimilarityjoins_spark.streaming.dedup_stream import (
        dedup_stream,
    )

    src = _doc_stream(spark, sf_dir).withColumn(
        "head8", F.substring("text", 1, 8))  # corpus has no full-text dups;
    # the 8-char head (the blocking key) collides on real duplicate groups
    out = dedup_stream(src, ts_col="warc_ts", text_col="head8")
    name = _run_stream_to_table(out, "stream_dedup")
    return (
        spark.table(name)
        .withColumn("fp", fingerprint(F.col("head8")))
        .groupBy("fp")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .orderBy("fp")
    )


def _q_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming simhash near-dup suppression (applyInPandasWithState) over
    the corpus replayed as one AvailableNow batch. Sequential greedy
    suppression per bucket is not SQL-expressible — rows-only driver check;
    the row-for-row batch equivalence lives in
    tests/test_io_density_streaming.py::test_neardup_stream_equals_batch_greedy."""
    from entityblockingbysimilarityjoins_spark.streaming.dedup_stream import (
        neardup_stream,
    )

    out = neardup_stream(_doc_stream(spark, sf_dir), id_col="doc_id",
                         ts_col="warc_ts", text_col="text", hamming_k=3)
    name = _run_stream_to_table(out, "stream_neardup")
    return spark.table(name).select("doc_id", "sig").orderBy("doc_id")


def _q_knn_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 KNN-filter slice: mod-97 bucketed candidate pairs over the
    embeddings table, kept only when each side is in the other's cosine
    top-3 among its partners (reference matcher/search.py:28-219 forward +
    reverse passes; operators.ann.knn_filter_matches)."""
    from entityblockingbysimilarityjoins_spark.operators.ann import (
        knn_filter_matches,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    g = emb.select("vec_id", (F.col("vec_id") % 97).alias("g"))
    pairs = (
        g.withColumnsRenamed({"vec_id": "id1"})
        .join(g.withColumnsRenamed({"vec_id": "id2"}), "g")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    out = knn_filter_matches(pairs, emb, "vec_id", "embedding", k=3,
                             keep_cos=True)
    return out.select("id1", "id2", F.round("knn_cos", 6).alias("knn_cos"))


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        subword_count(F.col("text")).alias("n_subwords"),
        lang_id(F.col("text")).alias("lang_guess"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    )


def _q_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprint (SIGMOD'03), exploded to
    (doc_id, fp) rows — k=5-token shingles, window w=4, 60-bit md5-prefix
    shingle hash that DuckDB replicates bit-for-bit."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(winnow_fingerprint(F.col("text"), k=5, w=4)).alias("fp"))


def _q_weighted_jac(spark: SparkSession, sf_dir: str) -> DataFrame:
    return set_similarity_self_join(
        _doc_tokens(spark, sf_dir), "rid", "tokens", "jac", 0.75, weighted=True
    ).withColumn("sim", F.round("sim", 6))


def _q_down_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entityblockingbysimilarityjoins_spark.operators.sampler import down_sample

    toks = _doc_tokens(spark, sf_dir)
    return down_sample(toks, toks, "rid", "tokens", n_probe=50, y=10, seed=7,
                       pool_size=64)


def _q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entityblockingbysimilarityjoins_spark.operators.sampler import (
        cluster_sample_self,
    )

    return cluster_sample_self(_doc_tokens(spark, sf_dir), "rid", "tokens",
                               cluster_tau=0.9, blk_tau=0.85, max_pairs=5000,
                               seed=7)


def _rs_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """R = even doc_ids, S = odd — the RS-join testbed split."""
    docs = _docs(spark, sf_dir)
    return docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)


def _q_set_join_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entityblockingbysimilarityjoins_spark.operators.set_join import (
        set_similarity_rs_join,
    )

    r, s = _rs_split(spark, sf_dir)

    def tok(df: DataFrame) -> DataFrame:
        return df.select(F.col("doc_id").alias("rid"), tokens_dlm(F.col("text")).alias("tokens"))

    return set_similarity_rs_join(tok(r), tok(s), "rid", "tokens", "jac", 0.8)


def _q_edit_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entityblockingbysimilarityjoins_spark.operators.edit_join import (
        edit_distance_rs_join,
    )

    r, s = _rs_split(spark, sf_dir)

    def head(df: DataFrame) -> DataFrame:
        return df.select("doc_id", F.substring("text", 1, 24).alias("head"))

    return edit_distance_rs_join(head(r), head(s), "doc_id", "head", d=4)


def _q_cluster_sample_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entityblockingbysimilarityjoins_spark.operators.sampler import (
        cluster_sample_rs,
    )

    r, s = _rs_split(spark, sf_dir)

    def tok(df: DataFrame) -> DataFrame:
        return df.select(F.col("doc_id").alias("rid"),
                         tokens_dlm(F.col("text")).alias("tokens"), "text")

    # gold = RS pairs sharing a 16-char text head; density << 0.1 so the
    # 2-step q-gram re-verification (sample.cc:254-259) always triggers
    gold = (
        r.select(F.col("doc_id").alias("id1"), F.substring("text", 1, 16).alias("h"))
        .join(s.select(F.col("doc_id").alias("id2"), F.substring("text", 1, 16).alias("h")), "h")
        .select("id1", "id2")
    )
    return cluster_sample_rs(tok(r), tok(s), "rid", "tokens", "text", gold,
                             blk_tau=0.6, step2_tau=0.5, max_pairs=100_000, seed=7)


def _head_blocked_pairs(spark: SparkSession, sf_dir: str, head_len: int) -> DataFrame:
    """Pairs blocked on an 8-char text-head key (real duplicate groups),
    carrying `head_len`-char heads for character-sim scoring."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring("text", 1, 8).alias("blk"),
        F.substring("text", 1, head_len).alias("head"),
    )
    a = d.select(F.col("doc_id").alias("id1"), "blk", F.col("head").alias("h1"))
    b = d.select(F.col("doc_id").alias("id2"), "blk", F.col("head").alias("h2"))
    return a.join(b, "blk").filter(F.col("id1") < F.col("id2"))


def _q_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entityblockingbysimilarityjoins_spark.functions.sim import jaro_winkler

    p = _head_blocked_pairs(spark, sf_dir, 40)
    return p.select("id1", "id2",
                    F.round(jaro_winkler(F.col("h1"), F.col("h2")), 6).alias("jw"))


def _q_monge_elkan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entityblockingbysimilarityjoins_spark.functions.sim import monge_elkan

    p = _head_blocked_pairs(spark, sf_dir, 60)
    return p.select("id1", "id2",
                    F.round(monge_elkan(F.col("h1"), F.col("h2")), 6).alias("me"))


# ---------------------------------------------------------------------------
# matcher-stack queries (F2 feature matrix, M2 forest predict, K2/M4 rule
# top-K, V2-V5 value grouping) — each with a full DuckDB oracle below
# ---------------------------------------------------------------------------

#: fixed attribute typing for the documents table (datasets.py:18-22 classes)
_DOC_ATTR_TYPES = {"text": "str_gt_10w", "source": "str_eq_1w", "n_chars": "numeric"}


def doc_features():
    """The F1 feature set for the documents schema — the single source of
    truth shared by the feature_matrix/rf_predict queries, the frozen-model
    training script and the SQL oracle generator."""
    from entityblockingbysimilarityjoins_spark.matcher.features import (
        generate_features,
    )

    return generate_features(_DOC_ATTR_TYPES)


def _pairs_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-char-head blocked candidate pairs (real duplicate groups)."""
    d = _docs(spark, sf_dir).select("doc_id", F.substring("text", 1, 8).alias("blk"))
    a = d.select(F.col("doc_id").alias("id1"), "blk")
    b = d.select(F.col("doc_id").alias("id2"), "blk")
    return a.join(b, "blk").filter(F.col("id1") < F.col("id2")).select("id1", "id2")


def _q_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: the py_em-style feature matrix over blocked pairs
    (matcher/features.py; reference cpp/feature/cal_feature.cc:10-35 with the
    NaN-on-empty rules of feature_utils.h:36-41)."""
    from entityblockingbysimilarityjoins_spark.matcher.features import (
        extract_features,
    )

    feats = doc_features()
    m = extract_features(_pairs_only(spark, sf_dir), _docs(spark, sf_dir),
                         "doc_id", feats)
    return m.select(
        "id1", "id2",
        *[F.round(F.col(f.name), 6).alias(f.name) for f in feats],
    )


def _q_rf_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: batch-predict with the frozen seeded forest (Arrow UDF broadcast
    scoring, matcher/random_forest.py:243; ref random_forest.py:618-780).
    The oracle evaluates the SAME tree arrays as SQL CASE expressions."""
    from entityblockingbysimilarityjoins_spark.matcher.features import (
        extract_features,
    )
    from entityblockingbysimilarityjoins_spark.matcher.persist import (
        load_model,
        packaged_model_path,
    )
    from entityblockingbysimilarityjoins_spark.matcher.random_forest import (
        apply_matcher,
    )

    model = load_model(packaged_model_path())
    m = extract_features(_pairs_only(spark, sf_dir), _docs(spark, sf_dir),
                         "doc_id", doc_features())
    scored = apply_matcher(m, model)
    return scored.select("id1", "id2",
                         F.round("match_proba", 6).alias("proba"), "match")


def _q_pipeline_match_res(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed end-to-end inference chain (VERDICT r3 #1): 8-char-head
    blocking -> F2 feature matrix -> frozen-forest M2 predict -> V8
    connected components over the positive matches — every stage is the same
    operator the per-stage oracles exercise, but composed, so schema drift or
    NaN-imputation-order bugs between stages surface here. Reference
    lifecycle: simjoin_entitymatching/matcher/match.py:103-132 driven by
    test/exp/amazon_google.py:31-106 (block -> features -> predict ->
    cluster)."""
    from entityblockingbysimilarityjoins_spark.matcher.features import (
        extract_features,
    )
    from entityblockingbysimilarityjoins_spark.matcher.persist import (
        load_model,
        packaged_model_path,
    )
    from entityblockingbysimilarityjoins_spark.matcher.random_forest import (
        apply_matcher,
    )

    model = load_model(packaged_model_path())
    m = extract_features(_pairs_only(spark, sf_dir), _docs(spark, sf_dir),
                         "doc_id", doc_features())
    pos = apply_matcher(m, model).filter(F.col("match")).select("id1", "id2")
    return connected_components(pos)


#: rules for the density-weighted top-K query (M4 + K2)
_DENSITY_RULES = [
    Rule("text", "jac", "dlm", None, 0.8),
    Rule("head", "lev", None, None, 3.0, "-"),
    Rule("n_chars", "anm", None, None, 0.98),
]


def _q_rule_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4+K2: estimate per-rule F1 weights on a labeled sample
    (matcher/density.py:51; ref simjoin_blocker.cc:383-537), then rank pairs
    by the weight-blended rule similarities (ref topk.cc:1053-1523)."""
    from entityblockingbysimilarityjoins_spark.matcher.density import (
        estimate_rule_density,
        score_pairs_by_rules,
    )
    from entityblockingbysimilarityjoins_spark.operators.topk import (
        topk_by_weighted_score,
    )

    docs = _docs(spark, sf_dir).withColumn("head", F.substring("text", 1, 24))
    pairs = _pairs_only(spark, sf_dir)
    h = docs.select("doc_id", F.substring("text", 1, 16).alias("h16"))
    labeled = (
        pairs.join(h.withColumnsRenamed({"doc_id": "id1", "h16": "h1"}), "id1")
        .join(h.withColumnsRenamed({"doc_id": "id2", "h16": "h2"}), "id2")
        .select("id1", "id2", (F.col("h1") == F.col("h2")).cast("int").alias("label"))
    )
    weights = estimate_rule_density(labeled, docs, "doc_id", _DENSITY_RULES)
    scored = score_pairs_by_rules(pairs, docs, "doc_id", _DENSITY_RULES, weights)
    return topk_by_weighted_score(scored, 200).select(
        "id1", "id2", F.round("score", 6).alias("score"))


def _q_value_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2+V3+V5: value pairs from matched records -> cosine-labeled edges ->
    CC groups -> normalize the attribute to group representatives
    (value_matcher/interchangeable.py; ref doc2vec.py:290-326,
    interchangeable.py:17-67). The md5 count embeddings make every cosine
    integer-exact, so DuckDB reproduces the grouping bit-for-bit."""
    from entityblockingbysimilarityjoins_spark.value_matcher.interchangeable import (
        group_values,
        normalize_values,
        value_pairs_from_matches,
    )

    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", F.substring("text", 1, 16).alias("h16"))
    matches = (
        d.withColumnsRenamed({"doc_id": "id1", "h16": "h"})
        .join(d.withColumnsRenamed({"doc_id": "id2", "h16": "h"}), "h")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    vp = value_pairs_from_matches(matches, docs, "doc_id", "source")
    groups = group_values(vp, tau=0.5, dim=64, seed=0)
    out = normalize_values(docs.select("doc_id", "source"), "source", groups)
    return out.select("doc_id", F.col("source").alias("source_norm"))


def _q_ic_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/V6: IC-aware feature matrix over the source attribute — feature =
    MAX over all member-value combinations of the two sides' IC groups (min
    for lev_dist; same-group short-circuits), ref cpp/feature/cal_feature.cc:
    37-317. Groups come from the SAME md5-count-embedding value grouping the
    value_grouping oracle proves; the 8-char-head pairs are the feature_matrix
    blocking. Upgrades the F3 pillar from pytest-only to a full oracle."""
    from entityblockingbysimilarityjoins_spark.value_matcher.interchangeable import (
        extract_features_ic,
        group_values,
        value_pairs_from_matches,
    )

    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", F.substring("text", 1, 16).alias("h16"))
    matches = (
        d.withColumnsRenamed({"doc_id": "id1", "h16": "h"})
        .join(d.withColumnsRenamed({"doc_id": "id2", "h16": "h"}), "h")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    vp = value_pairs_from_matches(matches, docs, "doc_id", "source")
    groups = group_values(vp, tau=0.5, dim=64, seed=0)
    feats = [f for f in doc_features() if f.attr == "source"]
    m = extract_features_ic(_pairs_only(spark, sf_dir), docs, "doc_id", feats,
                            {"source": groups})
    return m.select("id1", "id2",
                    *[F.round(F.col(f.name), 6).alias(f.name) for f in feats])


def _q_value_grouping_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4: the reference's BOUNDED closure mode (cpp/group/graph.h:69-71 —
    only two-hop neighbors are deduced, further hops are NOT followed) over
    the same integer-exact cosine edges as value_grouping. Output is the
    (value, representative) table; representative = min over the <=2-hop
    neighborhood, so noisy embeddings give tighter groups than full CC."""
    from entityblockingbysimilarityjoins_spark.value_matcher.interchangeable import (
        group_values,
        value_pairs_from_matches,
    )

    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", F.substring("text", 1, 16).alias("h16"))
    matches = (
        d.withColumnsRenamed({"doc_id": "id1", "h16": "h"})
        .join(d.withColumnsRenamed({"doc_id": "id2", "h16": "h"}), "h")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    vp = value_pairs_from_matches(matches, docs, "doc_id", "source")
    return group_values(vp, tau=0.5, dim=64, seed=0, closure="2hop")


def _q_rematch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 composed: first-pass frozen-forest predictions over the blocked
    pairs, then rematch_negatives re-scores the negatives with IC-max
    features (source grouped by the proven value grouping) and returns
    positives UNION recovered (ref matcher/match.py:135-166). The oracle
    rebuilds the identical chain: F2 features + CASE-tree forest for pass 1,
    the icf CTE's unrounded IC source features swapped in for pass 2."""
    from entityblockingbysimilarityjoins_spark.matcher.features import (
        extract_features,
    )
    from entityblockingbysimilarityjoins_spark.matcher.persist import (
        load_model,
        packaged_model_path,
    )
    from entityblockingbysimilarityjoins_spark.matcher.random_forest import (
        apply_matcher,
    )
    from entityblockingbysimilarityjoins_spark.value_matcher.interchangeable import (
        group_values,
        rematch_negatives,
        value_pairs_from_matches,
    )

    model = load_model(packaged_model_path())
    docs = _docs(spark, sf_dir)
    feats = doc_features()
    m = extract_features(_pairs_only(spark, sf_dir), docs, "doc_id", feats)
    predicted = apply_matcher(m, model)
    d = docs.select("doc_id", F.substring("text", 1, 16).alias("h16"))
    matches = (
        d.withColumnsRenamed({"doc_id": "id1", "h16": "h"})
        .join(d.withColumnsRenamed({"doc_id": "id2", "h16": "h"}), "h")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    vp = value_pairs_from_matches(matches, docs, "doc_id", "source")
    groups = group_values(vp, tau=0.5, dim=64, seed=0)
    # recovery threshold 0.25: the frozen forest lifts IC-consistent pairs
    # to ~0.29 max on this corpus, so 0.5 would recover nothing (vacuous);
    # 0.25 recovers pairs INCLUDING ones at p0 = 0 that only pass because
    # the IC features changed them — the V7 semantics under test
    return rematch_negatives(predicted, docs, "doc_id", feats, model,
                             {"source": groups}, threshold=0.25)


def _q_string_sim_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoring-scale string sims: ~30 pairs per document (10^5-pair regime at
    sf0.1) through the numpy-vectorized Jaro-Winkler + Monge-Elkan batch path
    (functions/jw_numpy.py) — the bench variant the r2 VERDICT asked for."""
    from entityblockingbysimilarityjoins_spark.functions.sim import (
        jaro_winkler,
        monge_elkan,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring("text", 1, 40).alias("h40"),
        F.substring("text", 1, 60).alias("h60"),
    )
    pairs = (
        d.select("doc_id", F.explode(F.sequence(F.lit(1), F.lit(30))).alias("k"))
        .select(F.col("doc_id").alias("id1"),
                (F.col("doc_id") + F.col("k") * 37).alias("id2"))
    )
    l = d.withColumnsRenamed({"doc_id": "id1", "h40": "a40", "h60": "a60"})
    r = d.withColumnsRenamed({"doc_id": "id2", "h40": "b40", "h60": "b60"})
    return (
        pairs.join(l, "id1").join(r, "id2")
        .select("id1", "id2",
                F.round(jaro_winkler(F.col("a40"), F.col("b40")), 6).alias("jw"),
                F.round(monge_elkan(F.col("a60"), F.col("b60")), 6).alias("me"))
    )


def _synthetic_pairs(d: DataFrame, per_doc: int) -> DataFrame:
    """EXACTLY per_doc synthetic partners per document (deterministic stride,
    wrapping modulo the contiguous id range) — the scoring-scale pair
    generator: per_doc=200 over the 5,000-doc sf0.1 corpus = 10^6 pairs."""
    n = d.count()  # doc_id is 0..n-1 contiguous in the synthetic corpus
    spark = d.sparkSession
    return (
        d.select("doc_id",
                 F.explode(F.sequence(F.lit(1), F.lit(per_doc))).alias("k"))
        .select(F.col("doc_id").alias("id1"),
                F.pmod(F.col("doc_id") + F.col("k") * 37, F.lit(n)).alias("id2"))
        .filter(F.col("id1") != F.col("id2"))
        # the exploded list inherits the tiny input's ONE partition and the
        # dimension joins broadcast — without this the 10^6-pair scoring
        # would run on a single core
        .repartition(2 * spark.sparkContext.defaultParallelism)
    )


def _q_string_sim_bulk_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoring-scale bench variant (VERDICT r3 #7): ~200 partners/doc ->
    ~10^6 JW+ME scorings at sf0.1, the regime the numpy batch path
    (functions/jw_numpy.py) was built for. Rows-only driver check: values
    are the same code path string_sim_bulk already hash-verifies."""
    from entityblockingbysimilarityjoins_spark.functions.sim import (
        jaro_winkler,
        monge_elkan,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring("text", 1, 40).alias("h40"),
        F.substring("text", 1, 60).alias("h60"),
    )
    pairs = _synthetic_pairs(d, 200)
    l = d.withColumnsRenamed({"doc_id": "id1", "h40": "a40", "h60": "a60"})
    r = d.withColumnsRenamed({"doc_id": "id2", "h40": "b40", "h60": "b60"})
    out = (
        pairs.join(l, "id1").join(r, "id2")
        .select("id1", "id2",
                F.round(jaro_winkler(F.col("a40"), F.col("b40")), 6).alias("jw"),
                F.round(monge_elkan(F.col("a60"), F.col("b60")), 6).alias("me"))
    )
    # always-true filter over BOTH scores: bench counts rows, and without
    # this Catalyst would prune the score columns right out of a count()
    return out.filter(F.col("jw") + F.col("me") > F.lit(-1.0))


def _q_feature_matrix_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoring-scale feature matrix (VERDICT r3 #7): the full 17-column
    native feature matrix over ~10^6 synthetic pairs at sf0.1. Rows-only
    driver check: per-feature values are hash-verified by feature_matrix."""
    from entityblockingbysimilarityjoins_spark.matcher.features import (
        extract_features,
    )

    docs = _docs(spark, sf_dir)
    pairs = _synthetic_pairs(docs.select("doc_id"), 200)
    feats = doc_features()
    m = extract_features(pairs, docs, "doc_id", feats)
    out = m.select("id1", "id2",
                   *[F.round(F.col(f.name), 6).alias(f.name) for f in feats])
    # force every feature column under count() (NULL-able -> coalesce);
    # always true, so the row set is unchanged. The predicate tests a
    # GENERATE output (explode of a one-element array) instead of a plain
    # projection: a bare filter was pushed below the payload projections all
    # the way into the second join's condition, where every feature was
    # re-evaluated per joined row with none of the shared-triple reuse —
    # the whole matrix computed twice (guide §7.2 "duplicated subtrees").
    # Predicates referencing generator output cannot be pushed through the
    # Generate, so the features are computed exactly once.
    total = sum((F.coalesce(F.col(f.name), F.lit(0.0)) for f in feats[1:]),
                F.coalesce(F.col(feats[0].name), F.lit(0.0)))
    return (
        out.select("*", F.explode(F.array(total)).alias("__force"))
        .filter(F.col("__force") > F.lit(float("-1e18")))
        .drop("__force")
    )


def _q_weighted_ovlp_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """weightedOverlapCoeff over jac>=0.8 candidate pairs (simfunc.cc:265)."""
    from entityblockingbysimilarityjoins_spark.functions.dictionary import (
        build_dictionary,
    )

    toks = _doc_tokens(spark, sf_dir)
    dictionary = build_dictionary(toks.select("tokens"))
    pairs = set_similarity_self_join(toks, "rid", "tokens", "jac", 0.8).select("id1", "id2")
    enc = toks.join(
        toks.select(F.explode("tokens").alias("token"), F.col("rid"))
        .join(F.broadcast(dictionary.select("token", "idf")), "token")
        .groupBy("rid").agg(F.sum("idf").alias("wt")),
        "rid",
    )
    l = enc.select(F.col("rid").alias("id1"), F.col("tokens").alias("t1"), F.col("wt").alias("w1"))
    r = enc.select(F.col("rid").alias("id2"), F.col("tokens").alias("t2"), F.col("wt").alias("w2"))
    inter = (
        pairs.join(l, "id1").join(r, "id2")
        .select("id1", "id2", "w1", "w2", F.explode(F.array_intersect("t1", "t2")).alias("token"))
        .join(F.broadcast(dictionary.select("token", "idf")), "token")
        .groupBy("id1", "id2", "w1", "w2")
        .agg(F.sum("idf").alias("wov"))
    )
    return inter.select(
        "id1", "id2", F.round(F.col("wov") / F.least("w1", "w2"), 6).alias("wocoeff"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: rule-union blocker over sf0.001 pages-like documents."""
    return _q_block(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "set_join_jaccard": _q_set_join("jac", 0.8),
        "set_join_cosine": _q_set_join("cos", 0.85),
        "set_join_dice": _q_set_join("dice", 0.85),
        "overlap_join": _q_overlap(25),
        "edit_distance_join": _q_edit,
        "exact_join": _q_exact,
        "absolute_norm_join": _q_anm,
        "block_union": _q_block,
        "topk_ta": _q_topk,
        "connected_components": _q_cc,
        "exact_dedup_groups": _q_exact_dedup,
        "minhash_dedup": _q_minhash,
        "simhash_dedup": _q_simhash,
        "ngram_dedup": _q_ngram_dedup,
        "embedding_neardup": _q_emb_neardup,
        "embedding_neardup_lsh": _q_emb_neardup_lsh,
        "ann_topk": _q_ann,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "text_stats": _q_text_stats,
        "winnow_fingerprint": _q_winnow_fp,
        "weighted_jaccard_join": _q_weighted_jac,
        "down_sample": _q_down_sample,
        "cluster_sample": _q_cluster_sample,
        "set_join_rs": _q_set_join_rs,
        "edit_distance_rs": _q_edit_rs,
        "cluster_sample_rs": _q_cluster_sample_rs,
        "jaro_winkler": _q_jaro_winkler,
        "monge_elkan": _q_monge_elkan,
        "weighted_overlap_coeff": _q_weighted_ovlp_coeff,
        "feature_matrix": _q_feature_matrix,
        "rf_predict": _q_rf_predict,
        "rule_topk": _q_rule_topk,
        "value_grouping": _q_value_grouping,
        "string_sim_bulk": _q_string_sim_bulk,
        "pipeline_match_res": _q_pipeline_match_res,
        "knn_filter": _q_knn_filter,
        "stream_dedup": _q_stream_dedup,
        "stream_neardup": _q_stream_neardup,
        "blocking_metrics": _q_blocking_metrics,
        "rule_recall": _q_rule_recall,
        "block_union_capped": _q_block_capped,
        "ic_features": _q_ic_features,
        "rematch_res": _q_rematch,
        "value_grouping_2hop": _q_value_grouping_2hop,
        "string_sim_bulk_1m": _q_string_sim_bulk_1m,
        "feature_matrix_1m": _q_feature_matrix_1m,
    }


# ---------------------------------------------------------------------------
# matcher-stack SQL oracle generators (shared with the frozen model artifact)
# ---------------------------------------------------------------------------

#: DuckDB list expr: dlm token set of a column (matches tokens_dlm)
def _dlm_sql(col: str) -> str:
    return ("list_sort(list_distinct(list_filter(string_split_regex("
            f"{col}, '{_DLM_RE_SQL}'), x -> x <> '')))")


#: DuckDB list expr: char 3-gram set (matches tokens_qgram q=3)
def _qgm3_sql(col: str) -> str:
    return ("list_sort(list_distinct(list_filter("
            f"list_transform(range(1, greatest(length({col}) - 2, 0) + 1), "
            f"i -> substring({col}, i, 3)), "
            "x -> regexp_matches(x, '^[a-zA-Z0-9]{3}$'))))")


def _feat_sql(feat) -> str:
    """One feature as a DuckDB expression over the `fp` pair CTE — the same
    value and NULL-on-empty rules as matcher.features._feature_col."""
    a, b = f"a_{feat.attr}", f"b_{feat.attr}"
    empty = (f"{a} IS NULL OR CAST({a} AS VARCHAR) = '' "
             f"OR {b} IS NULL OR CAST({b} AS VARCHAR) = ''")
    if feat.tok:
        tok = "dlm" if feat.tok == "dlm" else "qgm"
        ta, tb = f"a_{feat.attr}_{tok}", f"b_{feat.attr}_{tok}"
        o = f"len(list_intersect({ta}, {tb}))"
        la, lb = f"len({ta})", f"len({tb})"
        if feat.sim == "jac":
            val = f"{o}::DOUBLE / ({la} + {lb} - {o})"
        elif feat.sim == "cos":
            val = f"{o}::DOUBLE / sqrt(({la} * {lb})::DOUBLE)"
        elif feat.sim == "dice":
            val = f"2.0 * {o} / ({la} + {lb})"
        elif feat.sim == "overlap":
            val = f"{o}::DOUBLE"
        elif feat.sim == "overlap_coeff":
            val = f"{o}::DOUBLE / least({la}, {lb})"
        else:
            raise ValueError(feat.sim)
        return f"CASE WHEN {empty} OR {la} = 0 OR {lb} = 0 THEN NULL ELSE {val} END"
    if feat.sim == "lev_dist":
        val = f"levenshtein(CAST({a} AS VARCHAR), CAST({b} AS VARCHAR))::DOUBLE"
    elif feat.sim == "exact_match":
        val = (f"CASE WHEN CAST({a} AS VARCHAR) = CAST({b} AS VARCHAR) "
               "THEN 1.0 ELSE 0.0 END")
    elif feat.sim == "abs_norm":
        x, y = f"{a}::DOUBLE", f"{b}::DOUBLE"
        mx = f"greatest(abs({x}), abs({y}))"
        val = (f"CASE WHEN {a} = 0 AND {b} = 0 THEN 1.0 "
               f"WHEN {mx} > 0 THEN 1.0 - abs({x} - {y}) / {mx} ELSE 0.0 END")
    else:
        raise ValueError(feat.sim)
    return f"CASE WHEN {empty} THEN NULL ELSE {val} END"


#: pair CTE over 8-char-head blocks with raw attrs + tokenizations per side
_FEAT_PAIR_CTE = f"""
frec AS (SELECT doc_id, text, source, n_chars, substring(text, 1, 8) AS blk,
         {_dlm_sql('text')} AS tok_text_dlm,
         {_qgm3_sql('text')} AS tok_text_qgm,
         {_qgm3_sql('source')} AS tok_source_qgm
         FROM documents),
fp AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
       a.text AS a_text, b.text AS b_text,
       a.source AS a_source, b.source AS b_source,
       a.n_chars AS a_n_chars, b.n_chars AS b_n_chars,
       a.tok_text_dlm AS a_text_dlm, b.tok_text_dlm AS b_text_dlm,
       a.tok_text_qgm AS a_text_qgm, b.tok_text_qgm AS b_text_qgm,
       a.tok_source_qgm AS a_source_qgm, b.tok_source_qgm AS b_source_qgm
       FROM frec a JOIN frec b ON a.blk = b.blk AND a.doc_id < b.doc_id)"""


def _sql_feature_matrix() -> str:
    feats = doc_features()
    cols = ",\n  ".join(f'round({_feat_sql(f)}, 6) AS "{f.name}"' for f in feats)
    return f"WITH {_FEAT_PAIR_CTE}\nSELECT id1, id2,\n  {cols}\nFROM fp"


def _sql_rf_predict() -> str:
    from entityblockingbysimilarityjoins_spark.matcher.persist import (
        forest_proba_sql,
        load_model,
        packaged_model_path,
    )

    model = load_model(packaged_model_path())
    feats = {f.name: f for f in doc_features()}
    # unrounded features feed the trees, exactly like the Arrow predict path
    fcols = ",\n  ".join(f'{_feat_sql(feats[n])} AS "{n}"'
                         for n in model.feature_names)
    proba = forest_proba_sql(model, [f'"{n}"' for n in model.feature_names])
    return f"""WITH {_FEAT_PAIR_CTE},
fm AS (SELECT id1, id2,\n  {fcols}\nFROM fp),
pr AS (SELECT id1, id2, {proba} AS p0 FROM fm)
SELECT id1, id2, round(p0, 6) AS proba, p0 >= 0.5 AS "match" FROM pr"""


def _sql_pipeline_match_res() -> str:
    """The composed chain in ONE DuckDB statement: the feature CTE of
    _sql_feature_matrix, the CASE-tree forest of _sql_rf_predict (unrounded
    probabilities feed the 0.5 threshold, exactly like the Arrow path), and
    the recursive-CTE connected components of the connected_components
    oracle, over the predicted positives."""
    from entityblockingbysimilarityjoins_spark.matcher.persist import (
        forest_proba_sql,
        load_model,
        packaged_model_path,
    )

    model = load_model(packaged_model_path())
    feats = {f.name: f for f in doc_features()}
    fcols = ",\n  ".join(f'{_feat_sql(feats[n])} AS "{n}"'
                          for n in model.feature_names)
    proba = forest_proba_sql(model, [f'"{n}"' for n in model.feature_names])
    return f"""WITH {_FEAT_PAIR_CTE},
fm AS (SELECT id1, id2,\n  {fcols}\nFROM fp),
pr AS (SELECT id1, id2, {proba} AS p0 FROM fm),
pos AS (SELECT id1, id2 FROM pr WHERE p0 >= 0.5),
edges AS (SELECT id1 AS u, id2 AS v FROM pos UNION SELECT id2, id1 FROM pos),
nodes AS (SELECT DISTINCT u AS node FROM edges)
SELECT node, min(comp) AS component FROM (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.node WHERE w.comp < e.v
  ) SELECT node, comp FROM walk
) GROUP BY node"""


def _sql_ic_core() -> tuple[str, str]:
    """(CTE chunk, final-select) for the IC-max source features — the CTE
    chunk ends in ``icf(id1, id2, 4 UNROUNDED feature cols)`` so the V7
    rematch oracle can feed the exact doubles into the CASE-tree forest;
    the final select rounds for the ic_features oracle row."""
    qgm = ("list_sort(list_distinct(list_filter("
           "list_transform(range(1, greatest(length(m) - 2, 0) + 1), "
           "i -> substring(m, i, 3)), "
           "x -> regexp_matches(x, '^[a-zA-Z0-9]{3}$'))))")
    jac = ("CASE WHEN (len(ta) + len(tb) - len(list_intersect(ta, tb))) > 0 "
           "THEN len(list_intersect(ta, tb))::DOUBLE "
           "/ (len(ta) + len(tb) - len(list_intersect(ta, tb))) ELSE 0.0 END")
    cos = ("CASE WHEN sqrt((len(ta) * len(tb))::DOUBLE) > 0 "
           "THEN len(list_intersect(ta, tb))::DOUBLE "
           "/ sqrt((len(ta) * len(tb))::DOUBLE) ELSE 0.0 END")

    def cross(expr: str, agg: str = "list_max") -> str:
        # max/min over the member cross product (a from left, b from right)
        return (f"{agg}(flatten(list_transform(l.mem, "
                f"a -> list_transform(r.mem, b -> {expr}))))")

    def cross_tok(expr: str) -> str:
        return (f"list_max(flatten(list_transform(l.mt, "
                f"ta -> list_transform(r.mt, tb -> {expr}))))")

    empty = ("l.source IS NULL OR l.source = '' "
             "OR r.source IS NULL OR r.source = ''")
    same = "l.rep = r.rep"
    f_exm = (f"CASE WHEN {empty} THEN NULL WHEN {same} THEN 1.0 "
             f"ELSE {cross('CASE WHEN a = b THEN 1.0 ELSE 0.0 END')} END")
    f_lev = (f"CASE WHEN {empty} THEN NULL WHEN {same} THEN 0.0 "
             f"ELSE {cross('abs(levenshtein(a, b)::DOUBLE)', 'list_min')} END")
    f_jac = (f"CASE WHEN {empty} THEN NULL WHEN {same} THEN 1.0 "
             f"ELSE {cross_tok(jac)} END")
    f_cos = (f"CASE WHEN {empty} THEN NULL WHEN {same} THEN 1.0 "
             f"ELSE {cross_tok(cos)} END")
    ctes = f"""{_VG_CTES},
mem AS (SELECT rep, list_sort(list(node)) AS ms FROM comp GROUP BY rep),
recm AS (SELECT d0.doc_id, d0.source,
         substring(d0.text, 1, 8) AS blk,
         coalesce(comp.rep, d0.source) AS rep,
         coalesce(mem.ms, [d0.source]) AS mem
         FROM documents d0
         LEFT JOIN comp ON comp.node = d0.source
         LEFT JOIN mem ON mem.rep = coalesce(comp.rep, d0.source)),
rect AS (SELECT *, list_transform(mem, m -> {qgm}) AS mt FROM recm),
icf AS (SELECT l.doc_id AS id1, r.doc_id AS id2,
  {f_exm} AS ic_exm,
  {f_lev} AS ic_lev,
  {f_jac} AS ic_jac,
  {f_cos} AS ic_cos
FROM rect l JOIN rect r ON l.blk = r.blk AND l.doc_id < r.doc_id)"""
    final = """SELECT id1, id2,
  round(ic_exm, 6) AS source_source_exact_match,
  round(ic_lev, 6) AS source_source_lev_dist,
  round(ic_jac, 6) AS source_source_jac_qgm_3_qgm_3,
  round(ic_cos, 6) AS source_source_cos_qgm_3_qgm_3
FROM icf"""
    return ctes, final


def _sql_ic_features() -> str:
    ctes, final = _sql_ic_core()
    return f"WITH {ctes}\n{final}"


def _sql_rematch() -> str:
    """V7 in one statement: F2 features -> forest pass 1 -> negatives get
    the icf CTE's UNROUNDED IC source features (identity-group attrs are
    provably equal to their F2 columns, so they are reused) -> forest pass 2
    at the 0.25 recovery threshold -> positives UNION recovered."""
    from entityblockingbysimilarityjoins_spark.matcher.persist import (
        forest_proba_sql,
        load_model,
        packaged_model_path,
    )

    model = load_model(packaged_model_path())
    feats = {f.name: f for f in doc_features()}
    fcols = ",\n  ".join(f'{_feat_sql(feats[n])} AS "{n}"'
                          for n in model.feature_names)
    proba1 = forest_proba_sql(model, [f'"{n}"' for n in model.feature_names])
    ic_name = {"source_source_exact_match": "ic_exm",
               "source_source_lev_dist": "ic_lev",
               "source_source_jac_qgm_3_qgm_3": "ic_jac",
               "source_source_cos_qgm_3_qgm_3": "ic_cos"}
    cols2 = [f"icf.{ic_name[n]}" if n in ic_name else f'fm."{n}"'
             for n in model.feature_names]
    proba2 = forest_proba_sql(model, cols2)
    ic_ctes, _ = _sql_ic_core()
    return f"""WITH {ic_ctes},
{_FEAT_PAIR_CTE.lstrip()},
fm AS (SELECT id1, id2,\n  {fcols}\nFROM fp),
pr AS (SELECT id1, id2, {proba1} AS p0 FROM fm),
rec2 AS (SELECT fm.id1, fm.id2, {proba2} AS p1
         FROM pr JOIN fm ON fm.id1 = pr.id1 AND fm.id2 = pr.id2
                 JOIN icf ON icf.id1 = pr.id1 AND icf.id2 = pr.id2
         WHERE pr.p0 < 0.5)
SELECT id1, id2 FROM pr WHERE p0 >= 0.5
UNION ALL
SELECT id1, id2 FROM rec2 WHERE p1 >= 0.25"""


def _sql_rule_topk() -> str:
    """SQL replica of estimate_rule_density + score_pairs_by_rules + top-K
    for _DENSITY_RULES (jac-dlm text >= 0.8; lev head <= 3; anm n_chars >=
    0.98) — identical float operation order, so the weights and scores match
    the Spark path bit-for-bit."""
    o = "len(list_intersect(a.td, b.td))"
    jac = (f"CASE WHEN (len(a.td) + len(b.td) - {o}) > 0 "
           f"THEN {o}::DOUBLE / (len(a.td) + len(b.td) - {o}) ELSE 0.0 END")
    anm = ("CASE WHEN a.n_chars = 0 AND b.n_chars = 0 THEN 1.0 "
           "WHEN greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) > 0 "
           "THEN 1.0 - abs(a.n_chars::DOUBLE - b.n_chars::DOUBLE) "
           "/ greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) "
           "ELSE 0.0 END")
    prec = "CASE WHEN pp{i} > 0 THEN tp{i}::DOUBLE / pp{i} ELSE 0.0 END"
    rec = "CASE WHEN pos > 0 THEN tp{i}::DOUBLE / pos ELSE 0.0 END"
    f1 = ("CASE WHEN (prec{i} + rec{i}) > 0 "
          "THEN 2 * prec{i} * rec{i} / (prec{i} + rec{i}) ELSE 0.0 END")
    pr_cols = ", ".join(f"{prec.format(i=i)} AS prec{i}, {rec.format(i=i)} AS rec{i}"
                        for i in range(3))
    f1_cols = ", ".join(f"{f1.format(i=i)} AS f{i}" for i in range(3))
    w_cols = ", ".join(
        f"CASE WHEN (f0 + f1 + f2) <> 0 THEN f{i} / (f0 + f1 + f2) "
        f"ELSE 1.0 / 3 END AS w{i}" for i in range(3))
    return f"""
WITH d AS (SELECT doc_id, n_chars, substring(text, 1, 24) AS head,
           substring(text, 1, 8) AS blk, substring(text, 1, 16) AS h16,
           {_dlm_sql('text')} AS td FROM documents),
v AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
      {jac} AS r0,
      levenshtein(a.head, b.head)::DOUBLE AS r1,
      {anm} AS r2,
      (a.h16 = b.h16)::INT AS label
      FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id),
agg AS (SELECT
        sum(((r0 >= 0.8) AND label = 1)::INT) AS tp0, sum((r0 >= 0.8)::INT) AS pp0,
        sum(((r1 <= 3.0) AND label = 1)::INT) AS tp1, sum((r1 <= 3.0)::INT) AS pp1,
        sum(((r2 >= 0.98) AND label = 1)::INT) AS tp2, sum((r2 >= 0.98)::INT) AS pp2,
        sum((label = 1)::INT) AS pos FROM v),
pr AS (SELECT {pr_cols} FROM agg),
f AS (SELECT {f1_cols} FROM pr),
w AS (SELECT {w_cols} FROM f)
SELECT id1, id2,
       round(0.0 + w0 * r0 + w1 * (1.0 / (1.0 + r1)) + w2 * r2, 6) AS score
FROM v CROSS JOIN w
ORDER BY (0.0 + w0 * r0 + w1 * (1.0 / (1.0 + r1)) + w2 * r2) DESC,
         id1 ASC, id2 ASC
LIMIT 200"""


#: value-grouping CTE chain (md5 count embedding -> integer-exact cosine
#: edges at tau 0.5 -> recursive-CTE CC) ending in comp(node, rep); shared by
#: the value_grouping and ic_features oracles
_VG_CTES = """d AS (SELECT doc_id, source, substring(text, 1, 16) AS h16 FROM documents),
m AS (SELECT a.source AS s1, b.source AS s2
      FROM d a JOIN d b ON a.h16 = b.h16 AND a.doc_id < b.doc_id),
vp AS (SELECT DISTINCT least(s1, s2) AS v1, greatest(s1, s2) AS v2 FROM m
       WHERE s1 IS NOT NULL AND s2 IS NOT NULL
         AND s1 <> s2 AND s1 <> '' AND s2 <> ''),
vals AS (SELECT DISTINCT v FROM (SELECT v1 AS v FROM vp UNION SELECT v2 FROM vp)),
grams AS (SELECT v, unnest(list_transform(range(1, length(v) + 1),
                   i -> substring('^' || v || '$', i, 3))) AS g FROM vals),
hx AS (SELECT v, ('0x' || substr(md5('0:' || g), 1, 15))::BIGINT AS x FROM grams),
vec AS (SELECT v, x % 64 AS b,
        sum(CASE WHEN (x >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS c
        FROM hx GROUP BY 1, 2),
nrm AS (SELECT v, sqrt(sum(c * c)) AS n FROM vec GROUP BY v),
dots AS (SELECT p.v1, p.v2, sum(a.c * b.c) AS dot
         FROM vp p JOIN vec a ON a.v = p.v1
                   JOIN vec b ON b.v = p.v2 AND b.b = a.b
         GROUP BY 1, 2),
edges AS (SELECT p.v1, p.v2 FROM vp p
          JOIN nrm n1 ON n1.v = p.v1 JOIN nrm n2 ON n2.v = p.v2
          LEFT JOIN dots dd ON dd.v1 = p.v1 AND dd.v2 = p.v2
          WHERE n1.n > 0 AND n2.n > 0
            AND coalesce(dd.dot, 0.0) / (n1.n * n2.n) >= 0.5),
ed2 AS (SELECT v1 AS u, v2 AS v FROM edges UNION SELECT v2, v1 FROM edges),
nodes AS (SELECT DISTINCT u AS node FROM ed2),
comp AS (SELECT node, min(c) AS rep FROM (
  WITH RECURSIVE walk(node, c) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.v, w.c FROM walk w JOIN ed2 e ON e.u = w.node WHERE w.c < e.v
  ) SELECT node, c FROM walk
) GROUP BY node)"""


def _sql_value_grouping() -> str:
    """SQL replica of the md5 char-3gram count embedding, integer-exact
    cosine edges (tau 0.5), recursive-CTE connected components, and value
    normalization to the min-of-group representative."""
    return f"""
WITH {_VG_CTES}
SELECT d0.doc_id, coalesce(comp.rep, d0.source) AS source_norm
FROM documents d0 LEFT JOIN comp ON comp.node = d0.source"""


# ---------------------------------------------------------------------------
# DuckDB oracles (identical math, identical column names)
# ---------------------------------------------------------------------------

def _sql_set_join(kind: str, threshold: float) -> str:
    o = _OVLP
    la, lb = "len(a.tokens)", "len(b.tokens)"
    if kind == "jac":
        sim = f"{o}::DOUBLE / ({la} + {lb} - {o})"
    elif kind == "cos":
        sim = f"{o}::DOUBLE / sqrt(({la} * {lb})::DOUBLE)"
    else:  # dice
        sim = f"2.0 * {o} / ({la} + {lb})"
    return f"""{_TOK_CTE}
SELECT a.doc_id AS id1, b.doc_id AS id2, {sim} AS sim
FROM tk a JOIN tk b ON a.doc_id < b.doc_id
WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {sim} >= {threshold}"""


_SQL_TA_SCORE = (
    f"({_OVLP}::DOUBLE / (len(a.tokens) + len(b.tokens) - {_OVLP})"
    f" + {_OVLP}::DOUBLE / sqrt((len(a.tokens) * len(b.tokens))::DOUBLE)"
    f" + 2.0 * {_OVLP} / (len(a.tokens) + len(b.tokens))"
    f" + {_OVLP}::DOUBLE / least(len(a.tokens), len(b.tokens)))"
)


def _sql_ta_guarded(ta: str, tb: str) -> str:
    """Guarded 4-sim TA score over two token-array expressions — same
    zero-on-empty rules as operators.topk.ta_score (each term CASE-guarded,
    unlike _SQL_TA_SCORE which assumes non-empty sets)."""
    o = f"len(list_intersect({ta}, {tb}))::DOUBLE"
    la, lb = f"len({ta})::DOUBLE", f"len({tb})::DOUBLE"
    return (
        f"(CASE WHEN {la} + {lb} - {o} > 0 THEN {o} / ({la} + {lb} - {o}) ELSE 0.0 END"
        f" + CASE WHEN {la} * {lb} > 0 THEN {o} / sqrt({la} * {lb}) ELSE 0.0 END"
        f" + CASE WHEN {la} + {lb} > 0 THEN 2.0 * {o} / ({la} + {lb}) ELSE 0.0 END"
        f" + CASE WHEN least({la}, {lb}) > 0 THEN {o} / least({la}, {lb}) ELSE 0.0 END)"
    )


def oracle_sql() -> dict[str, str]:
    jac = f"{_OVLP}::DOUBLE / (len(a.tokens) + len(b.tokens) - {_OVLP})"
    # the three _BLOCK_RULES as per-rule CTEs — shared by block_union,
    # rule_recall, and block_union_capped
    rule_ctes = f"""docs AS (SELECT doc_id, text, n_chars, substring(text, 1, 24) AS head FROM documents),
r1 AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM tk a JOIN tk b ON a.doc_id < b.doc_id
       WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.85),
r2 AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       WHERE length(a.head) > 0 AND length(b.head) > 0 AND levenshtein(a.head, b.head) <= 3),
r3 AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       WHERE CASE WHEN a.n_chars = 0 AND b.n_chars = 0 THEN 1.0
                  WHEN greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) > 0
                    THEN 1.0 - abs(a.n_chars::DOUBLE - b.n_chars::DOUBLE) / greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE))
                  ELSE 0.0 END >= 0.995)"""
    out = {
        "set_join_jaccard": _sql_set_join("jac", 0.8),
        "set_join_cosine": _sql_set_join("cos", 0.85),
        "set_join_dice": _sql_set_join("dice", 0.85),
        "overlap_join": f"""{_TOK_CTE}
SELECT a.doc_id AS id1, b.doc_id AS id2, {_OVLP}::INT AS overlap
FROM tk a JOIN tk b ON a.doc_id < b.doc_id
WHERE {_OVLP} >= 25""",
        "edit_distance_join": """
SELECT a.doc_id AS id1, b.doc_id AS id2,
       levenshtein(substring(a.text, 1, 24), substring(b.text, 1, 24))::INT AS dist
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE length(substring(a.text, 1, 24)) > 0 AND length(substring(b.text, 1, 24)) > 0
  AND levenshtein(substring(a.text, 1, 24), substring(b.text, 1, 24)) <= 4""",
        "exact_join": """
WITH d AS (SELECT doc_id, substring(text, 1, 16) AS head16 FROM documents)
SELECT a.doc_id AS id1, b.doc_id AS id2
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE a.head16 = b.head16 AND a.head16 IS NOT NULL AND a.head16 <> ''""",
        "absolute_norm_join": """
SELECT a.doc_id AS id1, b.doc_id AS id2,
       1.0 - abs(a.n_chars::DOUBLE - b.n_chars::DOUBLE) / greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) AS sim
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE CASE WHEN a.n_chars = 0 AND b.n_chars = 0 THEN 1.0
           WHEN greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) > 0
             THEN 1.0 - abs(a.n_chars::DOUBLE - b.n_chars::DOUBLE) / greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE))
           ELSE 0.0 END >= 0.98""",
        "block_union": f"""{_TOK_CTE},
{rule_ctes},
uni AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
SELECT id1, id2, count(*)::INT AS rules_passed FROM uni GROUP BY id1, id2""",
        "rule_recall": f"""{_TOK_CTE},
{rule_ctes},
tagged AS (SELECT 0::INT AS rule_id, id1, id2 FROM r1
           UNION ALL SELECT 1::INT, id1, id2 FROM r2
           UNION ALL SELECT 2::INT, id1, id2 FROM r3),
pp AS (SELECT id1, id2, count(*) AS nr FROM tagged GROUP BY 1, 2),
d16 AS (SELECT doc_id, substring(text, 1, 16) AS h16 FROM documents),
gold AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         FROM d16 a JOIN d16 b ON a.h16 = b.h16 AND a.doc_id < b.doc_id),
consts AS (SELECT (SELECT count(*) FROM gold) AS n_gold,
                  (SELECT count(*) FROM documents) AS n_rows),
agg AS (SELECT t.rule_id, count(*) AS candidates, count(g.id1) AS hits,
               sum(CASE WHEN pp.nr = 1 THEN 1 ELSE 0 END) AS contribution
        FROM tagged t JOIN pp ON pp.id1 = t.id1 AND pp.id2 = t.id2
        LEFT JOIN gold g ON g.id1 = t.id1 AND g.id2 = t.id2
        GROUP BY t.rule_id)
SELECT rule_id, round(hits::DOUBLE / n_gold, 6) AS recall, candidates, hits,
       contribution,
       round(candidates::DOUBLE / (n_rows::DOUBLE * (n_rows - 1) / 2), 9) AS cssr
FROM agg, consts ORDER BY rule_id""",
        "block_union_capped": f"""{_TOK_CTE},
{rule_ctes},
hk AS (SELECT doc_id, {_dlm_sql('head')} AS tokens FROM docs),
nk AS (SELECT doc_id, {_dlm_sql('n_chars::VARCHAR')} AS tokens FROM documents),
rc1 AS (SELECT r1.id1, r1.id2 FROM r1 JOIN tk a ON a.doc_id = r1.id1
        JOIN tk b ON b.doc_id = r1.id2
        ORDER BY {_sql_ta_guarded('a.tokens', 'b.tokens')} DESC, r1.id1 ASC, r1.id2 ASC
        LIMIT 500),
rc2 AS (SELECT r2.id1, r2.id2 FROM r2 JOIN hk a ON a.doc_id = r2.id1
        JOIN hk b ON b.doc_id = r2.id2
        ORDER BY {_sql_ta_guarded('a.tokens', 'b.tokens')} DESC, r2.id1 ASC, r2.id2 ASC
        LIMIT 500),
rc3 AS (SELECT r3.id1, r3.id2 FROM r3 JOIN nk a ON a.doc_id = r3.id1
        JOIN nk b ON b.doc_id = r3.id2
        ORDER BY {_sql_ta_guarded('a.tokens', 'b.tokens')} DESC, r3.id1 ASC, r3.id2 ASC
        LIMIT 500),
uni AS (SELECT * FROM rc1 UNION ALL SELECT * FROM rc2 UNION ALL SELECT * FROM rc3)
SELECT id1, id2, count(*)::INT AS rules_passed FROM uni GROUP BY id1, id2""",
        "topk_ta": f"""{_TOK_CTE},
pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, {_SQL_TA_SCORE} AS score
          FROM tk a JOIN tk b ON a.doc_id < b.doc_id
          WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.8)
SELECT id1, id2, score FROM pairs ORDER BY score DESC, id1 ASC, id2 ASC LIMIT 200""",
        "connected_components": f"""{_TOK_CTE},
pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
          FROM tk a JOIN tk b ON a.doc_id < b.doc_id
          WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.9),
edges AS (SELECT id1 AS u, id2 AS v FROM pairs UNION SELECT id2, id1 FROM pairs),
nodes AS (SELECT DISTINCT u AS node FROM edges)
SELECT node, min(comp) AS component FROM (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.node WHERE w.comp < e.v
  ) SELECT node, comp FROM walk
) GROUP BY node""",
        "exact_dedup_groups": """
SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY text) AS group_id FROM documents""",
        # 60-bit md5-derived simhash recomputed bit-for-bit in SQL (same hash,
        # same strict-majority tie rule as operators.dedup.simhash_signature);
        # the oracle brute-forces all pairs — the Spark side must agree while
        # using the pigeonhole block join.
        "simhash_dedup": """
WITH tk AS (SELECT doc_id,
    list_sort(list_distinct(list_filter(string_split_regex(text, ' +'),
    x -> x <> ''))) AS tokens FROM documents),
ex AS (SELECT doc_id, ('0x' || substr(md5(unnest(tokens)), 1, 15))::BIGINT AS h
       FROM tk WHERE len(tokens) > 0),
bits AS (SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
         FROM ex CROSS JOIN (SELECT unnest(range(60)) AS b) b GROUP BY 1, 2),
sig AS (SELECT doc_id, sum(CASE WHEN cnt > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS s
        FROM bits GROUP BY doc_id)
SELECT a.doc_id AS id1, b.doc_id AS id2, bit_count(xor(a.s, b.s))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 3""",
        "minhash_dedup": f"""{_WS_CTE}
SELECT a.doc_id AS id1, b.doc_id AS id2,
       {_OVLP}::DOUBLE / (len(a.tokens) + len(b.tokens) - {_OVLP}) AS jac
FROM tk a JOIN tk b ON a.doc_id < b.doc_id
WHERE len(a.tokens) > 0 AND len(b.tokens) > 0
  AND {_OVLP}::DOUBLE / (len(a.tokens) + len(b.tokens) - {_OVLP}) >= 0.9""",
        "ngram_dedup": f"""{_QG5_CTE}
SELECT a.doc_id AS id1, b.doc_id AS id2,
       round({_OVLP}::DOUBLE / (len(a.tokens) + len(b.tokens) - {_OVLP}), 6) AS sim
FROM tk a JOIN tk b ON a.doc_id < b.doc_id
WHERE len(a.tokens) > 0 AND len(b.tokens) > 0
  AND {_OVLP}::DOUBLE / (len(a.tokens) + len(b.tokens) - {_OVLP}) >= 0.7""",
        "embedding_neardup": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3""",
        # the LSH scale path of embedding near-dup, fully reproduced: md5
        # hyperplanes (seed 7), 8 bands x 6 sign bits, band-bucket
        # candidates, exact cosine verify at the threshold
        "embedding_neardup_lsh": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
pl AS (SELECT qq.q AS q, dd.d AS d,
        ((('0x' || substr(md5('pl:7:' || qq.q::VARCHAR || ':' || dd.d::VARCHAR), 1, 15))::BIGINT % 2001) - 1000) / 1000.0 AS w
       FROM (SELECT unnest(range(48)) AS q) qq, (SELECT unnest(range(64)) AS d) dd),
proj AS (SELECT e.vec_id, pl.q, sum(e.emb[pl.d + 1] * pl.w) AS s
         FROM e, pl GROUP BY 1, 2),
sig AS (SELECT vec_id, q // 6 AS band,
               sum(CASE WHEN s >= 0 THEN (1::BIGINT << (q % 6)) ELSE 0 END) AS bv
        FROM proj GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
         FROM sig a JOIN sig b ON a.band = b.band AND a.bv = b.bv
         WHERE a.vec_id < b.vec_id)
SELECT c.id1, c.id2, round(list_cosine_similarity(ea.emb, eb.emb), 6) AS cos
FROM cand c JOIN e ea ON ea.vec_id = c.id1 JOIN e eb ON eb.vec_id = c.id2
WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.3""",
        "ann_topk": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(a.emb, b.emb) AS c
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, round(c, 6) AS cos,
       row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC)::INT AS rank
FROM scored
QUALIFY rank <= 5""",
        # the FULL approximate pipeline reproduced in SQL: md5-derived
        # hyperplanes (ann.md5_planes formula), 6 bands x 12 sign bits,
        # bucket-cohort candidates, exact cosine re-rank
        "ann_lsh_topk": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
pl AS (SELECT qq.q AS q, dd.d AS d,
        ((('0x' || substr(md5('pl:11:' || qq.q::VARCHAR || ':' || dd.d::VARCHAR), 1, 15))::BIGINT % 2001) - 1000) / 1000.0 AS w
       FROM (SELECT unnest(range(72)) AS q) qq, (SELECT unnest(range(64)) AS d) dd),
proj AS (SELECT e.vec_id, pl.q, sum(e.emb[pl.d + 1] * pl.w) AS s
         FROM e, pl GROUP BY 1, 2),
sig AS (SELECT vec_id, q // 12 AS band,
               sum(CASE WHEN s >= 0 THEN (1::BIGINT << (q % 12)) ELSE 0 END) AS bv
        FROM proj GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         FROM sig a JOIN sig b ON a.band = b.band AND a.bv = b.bv
         WHERE a.vec_id <> b.vec_id),
scored AS (SELECT c.query_id, c.neighbor_id,
                  list_cosine_similarity(ea.emb, eb.emb) AS c0
           FROM cand c JOIN e ea ON ea.vec_id = c.query_id
                       JOIN e eb ON eb.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, round(c0, 6) AS cos,
       row_number() OVER (PARTITION BY query_id ORDER BY c0 DESC, neighbor_id ASC)::INT AS rank
FROM scored QUALIFY rank <= 5""",
        # IVF-Flat mirrored end-to-end: centroids = the 8 vectors with the
        # smallest md5('ivf:7:'||id) (ann.ann_ivf_topk's seeded quantizer),
        # nearest-cell assignment (cos DESC, cent ASC ties), 2-probe search,
        # exact cosine re-rank inside the probed inverted lists
        "ann_ivf_topk": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cent AS (SELECT vec_id AS cent_id, emb AS cent_e FROM e
         ORDER BY md5('ivf:7:' || vec_id::VARCHAR), vec_id LIMIT 8),
ascore AS (SELECT e.vec_id, c.cent_id,
                  list_cosine_similarity(e.emb, c.cent_e) AS cc,
                  row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_cosine_similarity(e.emb, c.cent_e) DESC,
                               c.cent_id ASC) AS rn
           FROM e, cent c),
assign AS (SELECT vec_id AS neighbor_id, cent_id AS cell FROM ascore WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM ascore WHERE rn <= 2),
cand AS (SELECT DISTINCT p.query_id, a.neighbor_id
         FROM probes p JOIN assign a USING (cell)
         WHERE p.query_id <> a.neighbor_id),
scored AS (SELECT c.query_id, c.neighbor_id,
                  list_cosine_similarity(ea.emb, eb.emb) AS c0
           FROM cand c JOIN e ea ON ea.vec_id = c.query_id
                       JOIN e eb ON eb.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, round(c0, 6) AS cos,
       row_number() OVER (PARTITION BY query_id ORDER BY c0 DESC, neighbor_id ASC)::INT AS rank
FROM scored QUALIFY rank <= 5""",
        "text_stats": f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS wtoks
  FROM documents
), h AS (
  SELECT doc_id, text, wtoks,
         len(list_intersect(list_distinct(list_transform(wtoks, x -> lower(x))),
             {_ALL_MARKERS_SQL})) AS stop_hits,
         {_LANG_HITS_SQL}
  FROM t
)
SELECT doc_id,
       len(wtoks)::INT AS n_tokens,
       (len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
        + len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')))::INT AS n_subwords,
       CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unk'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
            WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
            ELSE 'es' END AS lang_guess,
       round(0.4 * (CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE / length(text)
                    ELSE 0.0 END)
           + 0.2 * least(stop_hits::DOUBLE / 3.0, 1.0)
           + 0.2 * (CASE WHEN len(wtoks) > 0
                         AND length(text)::DOUBLE / len(wtoks) >= 3.0
                         AND length(text)::DOUBLE / len(wtoks) <= 12.0
                    THEN 1.0 ELSE 0.5 END)
           + 0.2 * least(length(text)::DOUBLE / 200.0, 1.0), 6) AS quality,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
FROM h""",
        # winnowing: same k=5 shingles / w=4 windows / 60-bit md5-prefix hash
        # as functions/text_stats.py::winnow_fingerprint; range() is
        # exclusive-stop and list_slice is inclusive, hence the +2 / +4 / +3
        "winnow_fingerprint": """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(ts) >= 5 THEN
      list_transform(range(1, len(ts) - 5 + 2),
        i -> ('0x' || substr(md5(array_to_string(list_slice(ts, i, i + 4), ' ')), 1, 15))::BIGINT)
      ELSE [] END AS hs FROM toks
), mn AS (
  SELECT doc_id, CASE WHEN len(hs) >= 4 THEN
      list_transform(range(1, len(hs) - 4 + 2), j -> list_min(list_slice(hs, j, j + 3)))
      ELSE [] END AS ms FROM sh
)
SELECT doc_id, unnest(list_sort(list_distinct(ms))) AS fp FROM mn""",
        "weighted_jaccard_join": f"""{_TOK_CTE},
ex AS (SELECT doc_id, unnest(tokens) AS token FROM tk),
idf AS (SELECT token, log10((SELECT count(*) FROM documents)::DOUBLE / count(*)) AS w
        FROM ex GROUP BY token),
rw AS (SELECT doc_id, sum(w) AS wt FROM ex JOIN idf USING (token) GROUP BY doc_id),
wo AS (SELECT a.doc_id AS id1, b.doc_id AS id2, sum(i.w) AS wov
       FROM ex a JOIN ex b ON a.token = b.token AND a.doc_id < b.doc_id
       JOIN idf i ON i.token = a.token
       GROUP BY 1, 2)
SELECT id1, id2, round(wov / (r1.wt + r2.wt - wov), 6) AS sim
FROM wo JOIN rw r1 ON r1.doc_id = id1 JOIN rw r2 ON r2.doc_id = id2
WHERE wov / (r1.wt + r2.wt - wov) >= 0.75""",
        # Falcon down-sampler: hash-chosen probes, top-y/2 partners by shared
        # tokens + y/2 from the hash-ordered pool (operators.sampler.down_sample)
        "down_sample": f"""{_TOK_CTE},
probe AS (SELECT doc_id, tokens FROM tk ORDER BY md5(doc_id::VARCHAR || ':7') LIMIT 50),
pool AS (SELECT doc_id FROM tk ORDER BY md5(doc_id::VARCHAR || ':8') LIMIT 64),
ex1 AS (SELECT doc_id, unnest(tokens) AS tok FROM probe),
ex2 AS (SELECT doc_id, unnest(tokens) AS tok FROM tk),
shared AS (SELECT ex1.doc_id AS id1, ex2.doc_id AS id2, count(*) AS c
           FROM ex1 JOIN ex2 USING (tok) WHERE ex1.doc_id <> ex2.doc_id
           GROUP BY 1, 2),
top AS (SELECT id1, id2 FROM (
          SELECT id1, id2,
                 row_number() OVER (PARTITION BY id1 ORDER BY c DESC, id2 ASC) AS rn
          FROM shared) WHERE rn <= 5),
rnd AS (SELECT id1, id2 FROM (
          SELECT p.doc_id AS id1, q.doc_id AS id2,
                 row_number() OVER (PARTITION BY p.doc_id
                   ORDER BY md5(p.doc_id::VARCHAR || ':' || q.doc_id::VARCHAR || ':7')) AS rn
          FROM probe p CROSS JOIN pool q WHERE p.doc_id <> q.doc_id) WHERE rn <= 5)
SELECT DISTINCT id1, id2 FROM (SELECT * FROM top UNION ALL SELECT * FROM rnd)""",
        # cluster sampler: CC at 0.9, candidate pairs at 0.85 mapped to
        # min-id cluster labels, distinct cross-cluster pairs, hash-capped
        "cluster_sample": f"""{_TOK_CTE},
p1 AS (SELECT a.doc_id AS id1, b.doc_id AS id2
       FROM tk a JOIN tk b ON a.doc_id < b.doc_id
       WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.9),
edges AS (SELECT id1 AS u, id2 AS v FROM p1 UNION SELECT id2, id1 FROM p1),
nodes AS (SELECT DISTINCT u AS node FROM edges),
comp AS (SELECT node, min(c) AS component FROM (
  WITH RECURSIVE walk(node, c) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.v, w.c FROM walk w JOIN edges e ON e.u = w.node WHERE w.c < e.v
  ) SELECT node, c FROM walk
) GROUP BY node),
p2 AS (SELECT a.doc_id AS id1, b.doc_id AS id2
       FROM tk a JOIN tk b ON a.doc_id < b.doc_id
       WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.85),
cp AS (SELECT DISTINCT
         least(coalesce(ca.component, p2.id1), coalesce(cb.component, p2.id2)) AS id1,
         greatest(coalesce(ca.component, p2.id1), coalesce(cb.component, p2.id2)) AS id2
       FROM p2
       LEFT JOIN comp ca ON ca.node = p2.id1
       LEFT JOIN comp cb ON cb.node = p2.id2
       WHERE coalesce(ca.component, p2.id1) <> coalesce(cb.component, p2.id2))
SELECT id1, id2 FROM cp
ORDER BY md5(id1::VARCHAR || ':' || id2::VARCHAR || ':7') LIMIT 5000""",
        "set_join_rs": f"""{_TOK_CTE}
SELECT a.doc_id AS id1, b.doc_id AS id2, {jac} AS sim
FROM tk a JOIN tk b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.8""",
        "edit_distance_rs": """
WITH d AS (SELECT doc_id, substring(text, 1, 24) AS head FROM documents)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       levenshtein(a.head, b.head)::INT AS dist
FROM d a JOIN d b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
WHERE length(a.head) > 0 AND length(b.head) > 0
  AND levenshtein(a.head, b.head) <= 4""",
        # RS sampling path: jac>=0.6 candidates, md5-capped, then the 2-step
        # 3-gram re-verification (gold density << 0.1 always triggers it)
        "cluster_sample_rs": f"""{_TOK_CTE},
cand0 AS (SELECT a.doc_id AS id1, b.doc_id AS id2
          FROM tk a JOIN tk b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
          WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.6),
cand AS (SELECT id1, id2 FROM cand0
         ORDER BY md5(id1::VARCHAR || ':' || id2::VARCHAR || ':7') LIMIT 100000),
g3 AS (SELECT doc_id,
       list_sort(list_distinct(list_filter(
         list_transform(range(1, greatest(length(text) - 2, 0) + 1),
                        i -> substring(text, i, 3)),
         x -> regexp_matches(x, '^[a-zA-Z0-9]{{3}}$')))) AS t FROM documents)
SELECT c.id1, c.id2, 0::INT AS label
FROM cand c JOIN g3 a ON a.doc_id = c.id1 JOIN g3 b ON b.doc_id = c.id2
WHERE len(a.t) > 0 AND len(b.t) > 0
  AND len(list_intersect(a.t, b.t))::DOUBLE
      / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.5""",
        # DuckDB's jaro_winkler_similarity is reference-exact (verified
        # against simfunc.cc:318-384 semantics across the corpus)
        "jaro_winkler": """
WITH d AS (SELECT doc_id, substring(text, 1, 8) AS blk,
                  substring(text, 1, 40) AS head FROM documents)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       round(jaro_winkler_similarity(a.head, b.head), 6) AS jw
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id""",
        "monge_elkan": """
WITH d AS (SELECT doc_id, substring(text, 1, 8) AS blk,
                  list_filter(string_split(substring(text, 1, 60), ' '), x -> x <> '') AS t
           FROM documents)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       round(CASE WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
             ELSE list_avg(list_transform(a.t,
                    x -> list_max(list_transform(b.t,
                           y -> jaro_winkler_similarity(x, y))))) END, 6) AS me
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id""",
        "weighted_overlap_coeff": f"""{_TOK_CTE},
ex AS (SELECT doc_id, unnest(tokens) AS token FROM tk),
idf AS (SELECT token, log10((SELECT count(*) FROM documents)::DOUBLE / count(*)) AS w
        FROM ex GROUP BY token),
rw AS (SELECT doc_id, sum(w) AS wt FROM ex JOIN idf USING (token) GROUP BY doc_id),
pj AS (SELECT a.doc_id AS id1, b.doc_id AS id2
       FROM tk a JOIN tk b ON a.doc_id < b.doc_id
       WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.8),
wo AS (SELECT id1, id2, sum(i.w) AS wov
       FROM pj JOIN ex e1 ON e1.doc_id = id1
               JOIN ex e2 ON e2.doc_id = id2 AND e2.token = e1.token
               JOIN idf i ON i.token = e1.token
       GROUP BY 1, 2)
SELECT id1, id2, round(wov / least(r1.wt, r2.wt), 6) AS wocoeff
FROM wo JOIN rw r1 ON r1.doc_id = id1 JOIN rw r2 ON r2.doc_id = id2""",
        "feature_matrix": _sql_feature_matrix(),
        "rf_predict": _sql_rf_predict(),
        "rule_topk": _sql_rule_topk(),
        "value_grouping": _sql_value_grouping(),
        "pipeline_match_res": _sql_pipeline_match_res(),
        "ic_features": _sql_ic_features(),
        "rematch_res": _sql_rematch(),
        "value_grouping_2hop": f"""
WITH {_VG_CTES},
two AS (SELECT a.u AS u, b.v AS v FROM ed2 a JOIN ed2 b ON a.v = b.u
        WHERE a.u <> b.v),
reach AS (SELECT u, v FROM ed2 UNION ALL SELECT u, v FROM two)
SELECT u AS value, least(min(v), u) AS representative
FROM reach GROUP BY u""",
        "stream_dedup": """
SELECT md5(lower(trim(regexp_replace(substring(text, 1, 8), '\\s+', ' ', 'g')))) AS fp,
       CAST(1 AS BIGINT) AS n_kept
FROM documents
GROUP BY 1
ORDER BY fp""",
        "knn_filter": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
p AS (SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM e a JOIN e b ON a.vec_id % 97 = b.vec_id % 97 AND a.vec_id < b.vec_id),
s AS (SELECT p.id1, p.id2, list_cosine_similarity(e1.emb, e2.emb) AS c
      FROM p JOIN e e1 ON e1.vec_id = p.id1 JOIN e e2 ON e2.vec_id = p.id2),
sym AS (SELECT id1 AS u, id2 AS v, c FROM s
        UNION ALL SELECT id2, id1, c FROM s),
er AS (SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY c DESC, v ASC) AS r
       FROM sym)
SELECT s.id1, s.id2, round(s.c, 6) AS knn_cos
FROM s JOIN er f ON f.u = s.id1 AND f.v = s.id2
       JOIN er b ON b.u = s.id2 AND b.v = s.id1
WHERE f.r <= 3 AND b.r <= 3""",
        "string_sim_bulk": """
WITH d AS (SELECT doc_id, substring(text, 1, 40) AS h40,
                  substring(text, 1, 60) AS h60,
                  list_filter(string_split(substring(text, 1, 60), ' '),
                              x -> x <> '') AS t60
           FROM documents)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       round(jaro_winkler_similarity(a.h40, b.h40), 6) AS jw,
       round(CASE WHEN len(a.t60) = 0 OR len(b.t60) = 0 THEN 0.0
             ELSE list_avg(list_transform(a.t60,
                    x -> list_max(list_transform(b.t60,
                           y -> jaro_winkler_similarity(x, y))))) END, 6) AS me
FROM d a CROSS JOIN (SELECT unnest(range(1, 31)) AS k) k
     JOIN d b ON b.doc_id = a.doc_id + 37 * k.k""",
    }

    # U3 blocking metrics: one row of recall/|C|/CSSR over the SAME
    # block-union candidate set, reusing its oracle SQL as a subquery
    out["blocking_metrics"] = f"""
WITH cand AS (SELECT id1, id2 FROM ({out['block_union']}) bu),
d16 AS (SELECT doc_id, substring(text, 1, 16) AS h16 FROM documents),
gold AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         FROM d16 a JOIN d16 b ON a.h16 = b.h16 AND a.doc_id < b.doc_id),
agg AS (SELECT
  (SELECT count(*) FROM cand c WHERE EXISTS
     (SELECT 1 FROM gold g WHERE g.id1 = c.id1 AND g.id2 = c.id2)) AS hits,
  (SELECT count(*) FROM gold) AS n_gold,
  (SELECT count(*) FROM cand) AS n_cand,
  (SELECT count(*) FROM documents) AS n_rows)
SELECT round(hits::DOUBLE / n_gold, 6) AS recall,
       n_cand AS candidates,
       n_gold AS gold,
       round(n_cand::DOUBLE / (n_rows::DOUBLE * (n_rows - 1) / 2), 9) AS cssr
FROM agg"""
    return out
