"""Text analysis for web-corpus pipelines: language id, quality scoring,
token counting, document fingerprinting.

All native Column expressions (SQL-oracle-expressible, whole-stage codegen):

- ``token_count``: whitespace tokens + a BPE-ish alnum-run count.
- ``lang_id``: stopword-hit heuristic over tiny per-language marker lists;
  deterministic argmax with fixed tie order (en > de > fr > es > unk).
- ``quality_score``: bounded [0,1] combination of alphanumeric ratio,
  stopword ratio, mean word length sanity, and length saturation.
- ``fingerprint``: md5 of case-folded whitespace-collapsed text (the
  canonical content fingerprint used for exact near-canonical dedup).
- ``winnow_fingerprint``: rolling-hash winnowing (Schleimer/Wilkerson/
  Aiken, SIGMOD'03) — k-token shingle hashes, min per w-window, distinct
  sorted selections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "de": ["der", "die", "und", "ist", "mit", "das"],
    "fr": ["le", "la", "et", "est", "les", "des"],
    "es": ["el", "los", "es", "las", "una", "por"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]


def _ws_tokens(c: Column) -> Column:
    return F.filter(F.split(c, "\\s+"), lambda t: t != "")


def token_count(c: Column) -> Column:
    """Whitespace token count (int)."""
    return F.size(_ws_tokens(c)).cast("int")


def subword_count(c: Column) -> Column:
    """BPE-ish unit count: alphanumeric runs + standalone non-space symbols."""
    runs = F.size(F.regexp_extract_all(c, F.lit("[a-zA-Z0-9]+"), 0))
    syms = F.size(F.regexp_extract_all(c, F.lit("[^a-zA-Z0-9\\s]"), 0))
    return (runs + syms).cast("int")


def lang_id(c: Column) -> Column:
    """Deterministic stopword-hit language guess; 'unk' when nothing hits."""
    toks = F.array_distinct(_ws_tokens(F.lower(c)))
    hits = {lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
            for lang, words in LANG_MARKERS.items()}
    best = F.lit("unk")
    best_n = F.lit(0)
    for lang in reversed(_LANG_ORDER):        # earlier language wins ties
        best = F.when(hits[lang] >= F.greatest(best_n, F.lit(1)), F.lit(lang)).otherwise(best)
        best_n = F.greatest(best_n, hits[lang])
    return best


def quality_score(c: Column) -> Column:
    """[0,1] heuristic quality: alnum ratio, stopword presence, word-length
    sanity, length saturation. Deterministic, SQL-expressible."""
    length = F.length(c).cast("double")
    alnum = F.length(F.regexp_replace(c, "[^a-zA-Z0-9]", "")).cast("double")
    alnum_ratio = F.when(length > 0, alnum / length).otherwise(F.lit(0.0))
    toks = _ws_tokens(c)
    n_tok = F.size(toks).cast("double")
    mean_wlen = F.when(n_tok > 0, length / n_tok).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    all_markers = [w for ws in LANG_MARKERS.values() for w in ws]
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.transform(toks, F.lower)), F.array(*[F.lit(w) for w in all_markers])
    )).cast("double")
    stop_ratio = F.least(stop_hits / F.lit(3.0), F.lit(1.0))
    sat = F.least(length / F.lit(200.0), F.lit(1.0))
    return (F.lit(0.4) * alnum_ratio + F.lit(0.2) * stop_ratio
            + F.lit(0.2) * wlen_ok + F.lit(0.2) * sat)


def fingerprint(c: Column) -> Column:
    """md5 of lower(trim(collapse-whitespace(text))) — canonical content hash."""
    canon = F.lower(F.trim(F.regexp_replace(c, "\\s+", " ")))
    return F.md5(canon)


def _let(value: Column, body) -> Column:
    """Let-bind ``value`` so higher-order-function lambdas can reference it
    as a BOUND VARIABLE instead of re-evaluating the free expression once
    per array element (transform over a single-element array = a let
    binding). Without this, e.g. ``transform(idx, j -> slice(hashes, j, w))``
    recomputes the whole ``hashes`` expression for every window — O(n^2)
    hashing per row."""
    return F.transform(F.array(value), body)[0]


def winnow_fingerprint(c: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing rolling-hash document fingerprint (Schleimer, Wilkerson &
    Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03): hash every k-token shingle, keep the minimum hash of every
    window of w consecutive shingle hashes, return the sorted distinct
    selections as ``array<bigint>``.

    The winnowing guarantee: any token run of length >= k + w - 1 shared by
    two documents contributes at least one common selected hash, so
    fingerprint intersection detects copied passages at ~1/w the index size
    of full shingle sets. Documents with fewer than k tokens, or fewer than
    w shingles (incl. NULL / empty / all-whitespace text), yield an empty
    array.

    Shingle hash = first 60 bits of md5 (15 hex chars), the same
    engine-portable construction the value-grouping and simhash oracles
    use, so DuckDB replicates the fingerprint bit-for-bit. Pure Column
    expressions — one projection, whole-stage codegen, no UDF, no shuffle;
    the ``_let`` bindings keep it O(tokens * (k + w)) per row.
    """
    empty_i = F.array().cast("array<int>")

    def with_hashes(hs: Column) -> Column:
        m = F.size(hs)
        # sequence(1, 0) would count DOWN in Spark; gate short inputs
        win_idx = F.when(m >= w, F.sequence(F.lit(1), m - w + 1)) \
            .otherwise(empty_i)
        minima = F.transform(win_idx, lambda j: F.array_min(F.slice(hs, j, w)))
        return F.array_sort(F.array_distinct(minima))

    def with_toks(ts: Column) -> Column:
        n = F.size(ts)
        sh_idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)) \
            .otherwise(empty_i)
        hashes = F.transform(
            sh_idx,
            lambda i: F.conv(F.substring(F.md5(
                F.concat_ws(" ", F.slice(ts, i, k))), 1, 15), 16, 10
            ).cast("long"))
        return _let(hashes, with_hashes)

    return _let(_ws_tokens(F.lower(c)), with_toks)
