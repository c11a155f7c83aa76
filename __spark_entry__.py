"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 over the
driver-generated testdata tables; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for the side-by-side correctness gate. Column names and float
arithmetic are kept bit-compatible between both engines (same operand order).
"""

from __future__ import annotations

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
    return exact_self_join(_docs(spark, sf_dir), "doc_id", "text")


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


def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _doc_tokens(spark, sf_dir)
    pairs = set_similarity_self_join(toks, "rid", "tokens", "jac", 0.8).select("id1", "id2")
    return topk_via_ta(pairs, toks, k=200)


def _q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = set_similarity_self_join(
        _doc_tokens(spark, sf_dir), "rid", "tokens", "jac", 0.9
    ).select("id1", "id2")
    return connected_components(pairs)


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
    }


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


def oracle_sql() -> dict[str, str]:
    jac = f"{_OVLP}::DOUBLE / (len(a.tokens) + len(b.tokens) - {_OVLP})"
    return {
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
SELECT a.doc_id AS id1, b.doc_id AS id2
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE a.text = b.text AND a.text IS NOT NULL AND a.text <> ''""",
        "absolute_norm_join": """
SELECT a.doc_id AS id1, b.doc_id AS id2,
       1.0 - abs(a.n_chars::DOUBLE - b.n_chars::DOUBLE) / greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) AS sim
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE CASE WHEN a.n_chars = 0 AND b.n_chars = 0 THEN 1.0
           WHEN greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) > 0
             THEN 1.0 - abs(a.n_chars::DOUBLE - b.n_chars::DOUBLE) / greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE))
           ELSE 0.0 END >= 0.98""",
        "block_union": f"""{_TOK_CTE},
docs AS (SELECT doc_id, text, n_chars, substring(text, 1, 24) AS head FROM documents),
r1 AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM tk a JOIN tk b ON a.doc_id < b.doc_id
       WHERE len(a.tokens) > 0 AND len(b.tokens) > 0 AND {jac} >= 0.85),
r2 AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       WHERE length(a.head) > 0 AND length(b.head) > 0 AND levenshtein(a.head, b.head) <= 3),
r3 AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM docs a JOIN docs b ON a.doc_id < b.doc_id
       WHERE CASE WHEN a.n_chars = 0 AND b.n_chars = 0 THEN 1.0
                  WHEN greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE)) > 0
                    THEN 1.0 - abs(a.n_chars::DOUBLE - b.n_chars::DOUBLE) / greatest(abs(a.n_chars::DOUBLE), abs(b.n_chars::DOUBLE))
                  ELSE 0.0 END >= 0.995),
uni AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
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
    }
