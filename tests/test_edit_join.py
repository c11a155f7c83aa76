"""Edit-distance join vs brute-force oracle (analogue of test_stringjoin.cc)."""

from __future__ import annotations

import itertools
import random

import pytest

from entityblockingbysimilarityjoins_spark.operators.edit_join import (
    edit_distance_rs_join,
    edit_distance_self_join,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _corpus(seed, n):
    rng = random.Random(seed)
    base = ["spark engine", "spark engines", "entity matching", "entity matchings",
            "block join", "blocc join", "web page dedup", "web page dedupe"]
    rows = []
    for i in range(n):
        s = list(rng.choice(base))
        for _ in range(rng.randint(0, 2)):
            op = rng.randint(0, 2)
            p = rng.randrange(len(s))
            if op == 0:
                s[p] = rng.choice("abcxyz ")
            elif op == 1:
                del s[p]
            else:
                s.insert(p, rng.choice("abcxyz"))
        rows.append((i, "".join(s)))
    rows += [(n, ""), (n + 1, "a"), (n + 2, "b"), (n + 3, rows[0][1])]
    return rows


@pytest.mark.parametrize("d", [1, 2, 3])
def test_edit_self_join(spark, d):
    rows = _corpus(29, 60)
    strs = {i: s for i, s in rows if s}
    want = {(i, j): _lev(strs[i], strs[j])
            for i, j in itertools.combinations(sorted(strs), 2)
            if _lev(strs[i], strs[j]) <= d}
    df = spark.createDataFrame(rows, ["rid", "s"])
    got = {(r["id1"], r["id2"]): r["dist"]
           for r in edit_distance_self_join(df, "rid", "s", d=d).collect()}
    assert got == want


def test_edit_rs_join(spark):
    rows_r, rows_s = _corpus(31, 30), _corpus(37, 40)
    d = 2
    sr = {i: s for i, s in rows_r if s}
    ss = {i: s for i, s in rows_s if s}
    want = {(i, j) for i in sr for j in ss if _lev(sr[i], ss[j]) <= d}
    df_r = spark.createDataFrame(rows_r, ["rid", "s"])
    df_s = spark.createDataFrame(rows_s, ["rid", "s"])
    got = {(r["id1"], r["id2"])
           for r in edit_distance_rs_join(df_r, df_s, "rid", "s", d=d).collect()}
    assert got == want


def test_edit_d0_is_exact(spark):
    df = spark.createDataFrame([(0, "x"), (1, "x"), (2, "y")], ["rid", "s"])
    got = {(r["id1"], r["id2"]) for r in edit_distance_self_join(df, "rid", "s", d=0).collect()}
    assert got == {(0, 1)}
