"""Readers/writers, rule density weights, streaming dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.matcher.density import (
    estimate_rule_density,
    score_pairs_by_rules,
)
from entityblockingbysimilarityjoins_spark.sources.readers import (
    read_pages,
    read_table,
    with_normalized,
)
from entityblockingbysimilarityjoins_spark.sources.rules import Rule
from entityblockingbysimilarityjoins_spark.sources.writers import (
    read_pair_stats,
    write_pairs,
)


def test_write_pairs_chunked_with_stats(spark, tmp_path):
    pairs = spark.range(1000).select(
        F.col("id").alias("id1"), (F.col("id") + 10000).alias("id2"))
    path = str(tmp_path / "blk")
    stats = write_pairs(pairs, path, max_records_per_file=100)
    assert stats["num_pairs"] == 1000
    assert stats["num_chunks"] >= 10
    assert read_pair_stats(path) == stats
    assert spark.read.parquet(path).count() == 1000


def test_read_table_all_strings(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, 2.5)], ["a", "b"]).write.parquet(p)
    df = read_table(spark, p, all_strings=True)
    assert dict(df.dtypes) == {"a": "string", "b": "string"}


def test_read_pages_validates_schema(spark, tmp_path):
    p = str(tmp_path / "pages")
    spark.createDataFrame([("u",)], ["url"]).write.parquet(p)
    with pytest.raises(ValueError, match="missing columns"):
        read_pages(spark, p)


def test_with_normalized_keeps_raw(spark):
    df = spark.createDataFrame([("A  B!",)], ["text"])
    out = with_normalized(df, "text", strategy=2).collect()[0]
    assert out["text"] == "A  B!" and out["text_norm"] == "a b"


def test_rule_density_weights(spark):
    records = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b x"), (3, "q r s"), (4, "t u v")],
        ["rid", "title"],
    )
    labeled = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (0, 3, 0), (3, 4, 0)], ["id1", "id2", "label"])
    rules = [
        Rule("title", "jac", "dlm", None, 0.5),   # catches both positives
        Rule("title", "exm", None, None, 0.5),    # catches only (0,1)
    ]
    w = estimate_rule_density(labeled, records, "rid", rules)
    assert len(w) == 2 and abs(sum(w) - 1.0) < 1e-9
    assert w[0] > w[1]  # full-recall rule outweighs the exact-only rule
    scored = score_pairs_by_rules(
        labeled.select("id1", "id2"), records, "rid", rules, w)
    vals = {(r["id1"], r["id2"]): r["score"] for r in scored.collect()}
    assert vals[(0, 1)] > vals[(0, 2)] > vals[(0, 3)]


def test_streaming_dedup(spark, tmp_path):
    from entityblockingbysimilarityjoins_spark.streaming.dedup_stream import dedup_stream

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "Hello  World", "en"),
         ("u2", "2024-01-01 00:01:00", "hello world", "en"),   # dup by fingerprint
         ("u3", "2024-01-01 00:02:00", "other text", "en")],
        ["url", "ts", "text", "lang"],
    ).withColumn("warc_ts", F.col("ts").cast("timestamp")).drop("ts") \
     .write.parquet(src)

    stream = spark.readStream.schema(
        "url string, text string, lang string, warc_ts timestamp"
    ).parquet(src)
    out = dedup_stream(stream)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select url from dedup_out").collect()
    urls = {r["url"] for r in rows}
    assert len(urls) == 2 and "u3" in urls and len({"u1", "u2"} & urls) == 1


def test_neardup_stream_stateful(spark, tmp_path):
    from entityblockingbysimilarityjoins_spark.streaming.dedup_stream import (
        neardup_stream,
    )

    src = str(tmp_path / "nd_src")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # same token SET (reordered + repeated word) -> identical signature and
    # bucket: deterministically exercises the stateful suppression path
    near = "kappa iota theta eta zeta epsilon delta gamma beta alpha alpha"
    far = "completely different words everywhere nothing shared at all here now"
    spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", base, "en"),
         ("u2", "2024-01-01 00:01:00", near, "en"),
         ("u3", "2024-01-01 00:02:00", far, "en")],
        ["url", "ts", "text", "lang"],
    ).withColumn("warc_ts", F.col("ts").cast("timestamp")).drop("ts") \
     .write.parquet(src)

    stream = spark.readStream.schema(
        "url string, text string, lang string, warc_ts timestamp"
    ).parquet(src)
    out = neardup_stream(stream, hamming_k=6)
    q = (out.writeStream.format("memory").queryName("nd_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    urls = {r["url"] for r in spark.sql("select url from nd_out").collect()}
    assert "u3" in urls
    assert len({"u1", "u2"} & urls) == 1  # the near-dup pair collapsed
