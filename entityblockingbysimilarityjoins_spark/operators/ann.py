"""Approximate nearest-neighbor search over an embedding column.

- ``ann_bruteforce_topk``: exact cosine top-k per query — block-nested join
  with native zip_with/aggregate dot products + per-query window top-k.
  The baseline and the correctness oracle.
- ``ann_lsh_topk``: random-hyperplane LSH bucket candidates (multi-band
  probing) then exact re-rank within candidates — the 100 TB path: each
  query only scores its bucket cohort instead of the full corpus.

Ordering is deterministic: (cos DESC, neighbor id ASC).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, v: acc + v)


def _prep(df: DataFrame, id_col: str, emb_col: str, out: str) -> DataFrame:
    return (
        df.select(F.col(id_col).alias(f"{out}_id"),
                  F.col(emb_col).cast("array<double>").alias(f"{out}_e"))
        .withColumn(f"{out}_n", F.sqrt(_dot(F.col(f"{out}_e"), F.col(f"{out}_e"))))
        .filter(F.col(f"{out}_n") > 0)
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ann_bruteforce_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    emb_col: str,
    k: int = 10,
    exclude_self: bool = True,
    impl: str = "blas",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cos, rank).

    impl='blas': the corpus matrix is broadcast to executors and every query
    batch scores against it with one numpy matmul (Arrow batches, BLAS) —
    the block-nested-loop shape that scales by partitioning queries; the
    corpus side must fit an executor (beyond that, shard the corpus and merge
    per-shard top-k, or switch to ann_lsh_topk).
    impl='native': pure Column expressions (crossJoin + zip_with dot) — the
    oracle path, no Python at all."""
    q = _prep(queries, id_col, emb_col, "query")
    c = _prep(corpus, id_col, emb_col, "neighbor")
    if impl == "native":
        pairs = q.crossJoin(c)
        if exclude_self:
            pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
        scored = pairs.withColumn(
            "cos", _dot(F.col("query_e"), F.col("neighbor_e")) / (F.col("query_n") * F.col("neighbor_n"))
        )
        return _topk(scored, k)

    import pandas as pd

    rows = c.select("neighbor_id", "neighbor_e", "neighbor_n").collect()
    ids = np.array([r["neighbor_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    M = np.array([rows[i]["neighbor_e"] for i in order], dtype=np.float64)
    M /= np.array([rows[i]["neighbor_n"] for i in order], dtype=np.float64)[:, None]
    spark = queries.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_M = spark.sparkContext.broadcast(M)

    def score(batches):
        cid, cM = b_ids.value, b_M.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf["query_e"].to_numpy()).astype(np.float64)
            Q /= pdf["query_n"].to_numpy(dtype=np.float64)[:, None]
            sims = Q @ cM.T
            out_rows = []
            for row_i, qid in enumerate(pdf["query_id"].to_numpy()):
                s = sims[row_i]
                mask = cid != qid if exclude_self else np.ones(len(cid), bool)
                idx = np.flatnonzero(mask)
                kk = min(k, len(idx))
                part = idx[np.argpartition(-s[idx], kk - 1)[:kk]] if kk else idx
                # deterministic total order: (cos desc, neighbor id asc)
                part = part[np.lexsort((cid[part], -s[part]))]
                for rank, j in enumerate(part, 1):
                    out_rows.append((qid, cid[j], float(s[j]), rank))
            yield pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "cos", "rank"])

    qid_type = dict(queries.select(F.col(id_col)).dtypes)[id_col]
    schema = f"query_id {qid_type}, neighbor_id {qid_type}, cos double, rank int"
    return q.select("query_id", "query_e", "query_n").mapInPandas(score, schema=schema)


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    emb_col: str,
    k: int = 10,
    n_planes: int = 12,
    n_bands: int = 6,
    seed: int = 11,
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = same hyperplane-sign band bucket."""
    q = _prep(queries, id_col, emb_col, "query").persist()
    c = _prep(corpus, id_col, emb_col, "neighbor").persist()
    if dim is None:
        dim = len(q.select("query_e").first()["query_e"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * n_planes, dim))

    def sig(df: DataFrame, side: str) -> DataFrame:
        band_cols = []
        for band in range(n_bands):
            acc = F.lit(0)
            for p in range(n_planes):
                w = planes[band * n_planes + p]
                proj = F.aggregate(
                    F.zip_with(F.col(f"{side}_e"), F.array(*[F.lit(float(x)) for x in w]),
                               lambda x, y: x * y),
                    F.lit(0.0), lambda a_, v: a_ + v)
                acc = acc + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            band_cols.append(acc.alias(f"__b{band}"))
        s = df.select(f"{side}_id", f"{side}_e", f"{side}_n", *band_cols)
        return s.select(
            f"{side}_id", f"{side}_e", f"{side}_n",
            F.posexplode(F.array(*[F.col(f"__b{b}") for b in range(n_bands)])).alias("band", "bv"),
        )

    qs = sig(q, "query")
    cs = sig(c, "neighbor")
    cand = qs.join(cs, ["band", "bv"]).dropDuplicates(["query_id", "neighbor_id"])
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn(
        "cos", _dot(F.col("query_e"), F.col("neighbor_e")) / (F.col("query_n") * F.col("neighbor_n"))
    )
    return _topk(scored, k)
