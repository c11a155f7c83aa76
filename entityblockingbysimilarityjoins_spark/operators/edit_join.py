"""Exact edit-distance join: all pairs with levenshtein <= D — SURVEY.md J4.

Output contract of the reference's PassJoin implementation (PVLDB'11;
``/root/reference/cpp/common/stringjoin.cc``): every pair of strings within
edit distance D. Empty strings are excluded (the reference buckets them
out via DROP_EMPTY, config.h:63).

Spark-native plan (segment explode + equi-join, the PassJoin pigeonhole):

- every string s is **indexed** by partitioning it into D+1 contiguous
  segments (PassJoin even-partition scheme: the first (D+1) - (len mod (D+1))
  segments get floor(len/(D+1)) chars, the rest one extra — any fixed scheme
  works as long as probing reproduces it from the partner length alone);
- every string q **probes**: for each candidate partner length l in
  [len(q)-D, len(q)+D] and each segment (pid, start p, seglen sl) of the
  length-l scheme, emit the substrings of q of length sl starting in
  [p-D, p+D] (a correct superset of PassJoin's tightened multi-match window,
  stringjoin.cc:96-103);
- equi-join probe substrings against index segments on
  (partner_len, pid, substring) — a plain hash shuffle join on short keys;
- dedupe candidates, then verify natively with Spark's built-in
  ``levenshtein(s1, s2, threshold)`` (early-abandon banded DP in the JVM —
  the same role as the reference's 2D+1-banded verify matrices,
  stringjoin.cc:26-39).

Cost: each record emits D+1 index rows and at most (2D+1)^2 probe rows per
unit length-window — linear in data size, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .cache import persist_tracked


def _segments_expr(length: Column, d: int) -> Column:
    """array of (pid, start, seglen) structs for the even-partition scheme.

    1-based starts. k = D+1 segments; first k - (len % k) segments have
    floor(len/k) chars, the rest have one extra.
    """
    k = d + 1
    base = F.floor(length / k).cast("int")
    n_small = (F.lit(k) - length % k).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda pid: F.struct(
            pid.cast("int").alias("pid"),
            (
                F.lit(1)
                + pid * base
                + F.greatest(pid - n_small, F.lit(0))
            ).cast("int").alias("start"),
            (base + F.when(pid >= n_small, 1).otherwise(0)).cast("int").alias("seglen"),
        ),
    )


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    d: int = 2,
    dist_col: str = "dist",
) -> DataFrame:
    """All pairs (id1 < id2) with levenshtein(s1, s2) <= d."""
    if d < 0:
        raise ValueError("d must be >= 0")
    if d == 0:
        from .exact_join import exact_self_join

        return exact_self_join(df, id_col, str_col).withColumn(dist_col, F.lit(0))

    slim = (
        df.select(F.col(id_col).alias("rid"), F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull() & (F.length("s") > 0))
        .transform(persist_tracked)
    )

    # ---- index side: own segments keyed by own length ----
    idx = slim.select(
        F.col("rid").alias("rid_i"),
        F.length("s").alias("l"),
        F.explode(_segments_expr(F.length("s"), d)).alias("seg"),
        F.col("s").alias("s_i"),
    ).select(
        "rid_i", "l",
        F.col("seg.pid").alias("pid"),
        F.expr("substring(s_i, seg.start, seg.seglen)").alias("piece"),
    )

    # ---- probe side: for each partner length l in [m-d, m+d], each segment of
    # scheme(l), all substrings of q with that seglen starting within +-d ----
    probe = slim.select(
        F.col("rid").alias("rid_p"),
        F.col("s").alias("q"),
        F.length("s").alias("m"),
        F.explode(F.sequence(F.length("s") - d, F.length("s") + d)).alias("l"),
    ).filter(F.col("l") >= 1)
    probe = probe.select(
        "rid_p", "q", "m", "l",
        F.explode(_segments_expr(F.col("l"), d)).alias("seg"),
    ).select(
        "rid_p", "q", "m", "l",
        F.col("seg.pid").alias("pid"),
        F.col("seg.start").alias("p"),
        F.col("seg.seglen").alias("sl"),
    )
    probe = probe.select(
        "rid_p", "q", "m", "l", "pid", "sl",
        F.explode(
            F.sequence(
                F.greatest(F.col("p") - d, F.lit(1)),
                F.least(F.col("p") + d, F.col("m") - F.col("sl") + 1),
            )
        ).alias("qstart"),
    ).filter(F.col("qstart") >= 1).select(
        "rid_p", "l", "pid",
        F.expr("substring(q, qstart, sl)").alias("piece"),
    )

    cand = (
        probe.join(idx, ["l", "pid", "piece"])
        .filter(F.col("rid_p") != F.col("rid_i"))
        .select(
            F.least("rid_p", "rid_i").alias("rid1"),
            F.greatest("rid_p", "rid_i").alias("rid2"),
        )
        .dropDuplicates(["rid1", "rid2"])
    )

    out = (
        cand.join(slim.select(F.col("rid").alias("rid1"), F.col("s").alias("s1")), "rid1")
        .join(slim.select(F.col("rid").alias("rid2"), F.col("s").alias("s2")), "rid2")
        .withColumn(dist_col, F.levenshtein("s1", "s2", d))
        .filter(F.col(dist_col) >= 0)  # levenshtein(.., threshold) returns -1 when > d
        .select(F.col("rid1").alias("id1"), F.col("rid2").alias("id2"), dist_col)
    )
    return out


def edit_distance_rs_join(
    df_r: DataFrame,
    df_s: DataFrame,
    id_col: str,
    str_col: str,
    d: int = 2,
    dist_col: str = "dist",
) -> DataFrame:
    """All (r, s) pairs with levenshtein <= d: index S's segments, probe with R."""
    if d == 0:
        from .exact_join import exact_rs_join

        return exact_rs_join(df_r, df_s, id_col, str_col).withColumn(dist_col, F.lit(0))

    s_slim = (
        df_s.select(F.col(id_col).alias("rid_i"), F.col(str_col).alias("s_i"))
        .filter(F.col("s_i").isNotNull() & (F.length("s_i") > 0))
        .transform(persist_tracked)
    )
    r_slim = (
        df_r.select(F.col(id_col).alias("rid_p"), F.col(str_col).alias("q"))
        .filter(F.col("q").isNotNull() & (F.length("q") > 0))
        .transform(persist_tracked)
    )
    idx = s_slim.select(
        "rid_i",
        F.length("s_i").alias("l"),
        F.explode(_segments_expr(F.length("s_i"), d)).alias("seg"),
        "s_i",
    ).select("rid_i", "l", F.col("seg.pid").alias("pid"),
             F.expr("substring(s_i, seg.start, seg.seglen)").alias("piece"))
    probe = r_slim.select(
        "rid_p", "q", F.length("q").alias("m"),
        F.explode(F.sequence(F.length("q") - d, F.length("q") + d)).alias("l"),
    ).filter(F.col("l") >= 1)
    probe = probe.select(
        "rid_p", "q", "m", "l", F.explode(_segments_expr(F.col("l"), d)).alias("seg")
    ).select("rid_p", "q", "m", "l", F.col("seg.pid").alias("pid"),
             F.col("seg.start").alias("p"), F.col("seg.seglen").alias("sl"))
    probe = probe.select(
        "rid_p", "l", "pid",
        F.explode(F.sequence(F.greatest(F.col("p") - d, F.lit(1)),
                             F.least(F.col("p") + d, F.col("m") - F.col("sl") + 1))).alias("qstart"),
        "q", "sl",
    ).select("rid_p", "l", "pid", F.expr("substring(q, qstart, sl)").alias("piece"))
    cand = probe.join(idx, ["l", "pid", "piece"]).select("rid_p", "rid_i").dropDuplicates()
    return (
        cand.join(r_slim, "rid_p")
        .join(s_slim, "rid_i")
        .withColumn(dist_col, F.levenshtein("q", "s_i", d))
        .filter(F.col(dist_col) >= 0)
        .select(F.col("rid_p").alias("id1"), F.col("rid_i").alias("id2"), dist_col)
    )
