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

    # ---- index side: own segments keyed by own length; the string rides
    # along so verification is INLINE in the join stage (see below) ----
    idx = slim.select(
        F.col("rid").alias("rid_i"),
        F.length("s").alias("l"),
        F.explode(_segments_expr(F.length("s"), d)).alias("seg"),
        F.col("s").alias("s_i"),
    ).select(
        "rid_i", "l", "s_i",
        F.col("seg.pid").alias("pid"),
        F.expr("substring(s_i, seg.start, seg.seglen)").alias("piece"),
    )

    # ---- probe side: for each partner length l in [m-d, m], each segment
    # (pid, p, sl) of scheme(l), the substrings of q with that seglen whose
    # start lies in PassJoin's multi-match window (stringjoin.cc:96-103):
    # qstart - p in [max(-pid, delta - (d - pid)), min(pid, delta + (d - pid))]
    # with delta = m - l — the tight pigeonhole bound, a strict subset of the
    # naive +-d window (noticeably fewer probe rows and join candidates).
    # ONE-DIRECTIONAL for the self join: the pigeonhole guarantees every
    # qualifying pair in each direction separately, so the longer string
    # probes the shorter's scheme (l <= m) and equal lengths tie-break on
    # rid — each unordered pair generates candidates once, not twice, which
    # halves the dominant verify stage (guide §1.2 "the distributed
    # algorithm"); the RS join keeps the full ±d window (direction is fixed
    # by which side is indexed).
    probe = _probe_pieces(slim, d, one_directional=True)

    # fused verify: the equi-join carries both strings, the banded
    # levenshtein(threshold) runs in the SAME codegen stage, and only the
    # tiny verified pair set is deduplicated — the old plan shuffled the
    # full multi-million-row candidate set through a dropDuplicates exchange
    # and re-attached both strings with two more joins (guide §2.4; the
    # bounded-DP verify is far cheaper than shuffling candidates)
    joined = probe.join(idx, ["l", "pid", "piece"]).filter(
        (F.col("l") < F.length("q")) | (F.col("rid_p") < F.col("rid_i")))
    out = (
        joined.withColumn(dist_col, F.levenshtein("q", "s_i", d))
        .filter(F.col(dist_col) >= 0)  # levenshtein(.., threshold) -> -1 when > d
        .select(F.least("rid_p", "rid_i").alias("id1"),
                F.greatest("rid_p", "rid_i").alias("id2"), dist_col)
        .dropDuplicates(["id1", "id2"])
    )
    return out


def _probe_pieces(slim: DataFrame, d: int, one_directional: bool = False) -> DataFrame:
    """(rid_p, q, l, pid, piece) probe substrings with the tight PassJoin
    multi-match window. ``slim`` must carry (rid, s). ``one_directional``
    probes only partner lengths l <= m (self joins; see caller)."""
    probe = slim.select(
        F.col("rid").alias("rid_p"),
        F.col("s").alias("q"),
        F.length("s").alias("m"),
        F.explode(F.sequence(F.length("s") - d,
                             F.length("s") + (0 if one_directional else d))).alias("l"),
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
    delta = F.col("m") - F.col("l")
    lo = F.col("p") + F.greatest(-F.col("pid"), delta - (F.lit(d) - F.col("pid")))
    hi = F.col("p") + F.least(F.col("pid"), delta + (F.lit(d) - F.col("pid")))
    probe = probe.select(
        "rid_p", "q", "l", "pid", "sl",
        F.explode(
            F.sequence(
                F.greatest(lo, F.lit(1)),
                F.least(hi, F.col("m") - F.col("sl") + 1),
            )
        ).alias("qstart"),
    ).filter(F.col("qstart") >= 1).select(
        "rid_p", "q", "l", "pid",
        F.expr("substring(q, qstart, sl)").alias("piece"),
    )
    return probe


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
        df_r.select(F.col(id_col).alias("rid"), F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull() & (F.length("s") > 0))
        .transform(persist_tracked)
    )
    idx = s_slim.select(
        "rid_i",
        F.length("s_i").alias("l"),
        F.explode(_segments_expr(F.length("s_i"), d)).alias("seg"),
        "s_i",
    ).select("rid_i", "l", "s_i", F.col("seg.pid").alias("pid"),
             F.expr("substring(s_i, seg.start, seg.seglen)").alias("piece"))
    # tight multi-match probe window + fused inline verify (see self join)
    probe = _probe_pieces(r_slim, d)
    return (
        probe.join(idx, ["l", "pid", "piece"])
        .withColumn(dist_col, F.levenshtein("q", "s_i", d))
        .filter(F.col(dist_col) >= 0)
        .select(F.col("rid_p").alias("id1"), F.col("rid_i").alias("id2"), dist_col)
        .dropDuplicates(["id1", "id2"])
    )
