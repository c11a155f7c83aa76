"""End-to-end entity-matching pipeline over pages (SURVEY §3 lifecycle).

sample -> train RF -> extract blocking rules -> block -> score+match ->
transitively cluster — the Spark re-expression of the reference's canonical
driver (``/root/reference/test/exp/amazon_google.py:31-106``), with stage
boundaries as parquet checkpoint tables instead of CSV chunks (resumability
per BASELINE.json north_rule: a stage whose output table already exists is
skipped and read back).

Input contract (input_hint): pages(url, warc_ts, html, text, lang). The
pipeline derives blocking/feature attributes (title = first line of text,
body = rest) and never rewrites ``text`` — byte identity per url is audited
by ``audit_text_identity``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_dlm
from ..matcher.features import (
    Feature,
    extract_features,
    generate_features,
    infer_attr_types,
)
from ..matcher.random_forest import (
    RandomForestMatcher,
    apply_matcher,
    matcher_metrics,
)
from ..matcher.rules_extract import extract_blocking_rules
from ..operators.blocker import block_self, blocking_metrics
from ..operators.connected_components import cluster_pairs
from ..operators.sampler import build_training_sample
from ..sources.rules import Rule
from ..operators.cache import persist_tracked

log = logging.getLogger(__name__)

ATTRS = ["title", "body", "lang"]


@dataclass
class PipelineConfig:
    id_col: str = "url"
    sample_threshold: float = 0.35
    n_random_negatives: int = 2000
    n_trees: int = 12
    max_depth: int = 10
    #: cross-validated grid search over the reference's param grid
    #: (random_forest.py:441-459) instead of the fixed depth/leaf above
    tune: bool = False
    match_threshold: float = 0.5
    #: P7: rebalance the labeled sample before training — None | 'over' |
    #: 'under' (reference random_forest.py:148-175 Random{Over,Under}Sampler)
    resample: str | None = None
    seed: int = 0
    # V7/V8: interchangeable-value second round (re-match negatives with
    # IC-normalized attributes, expand clusters with IC groups)
    use_value_matcher: bool = False
    ic_attrs: tuple[str, ...] = ("title",)
    ic_tau: float = 0.85
    fallback_rules: list[Rule] = field(default_factory=lambda: [
        Rule("title", "jac", "dlm", None, 0.6),
    ])
    checkpoint_dir: str | None = None


def derive_attrs(pages: DataFrame) -> DataFrame:
    """title = first line of text, body = rest; text untouched."""
    first_nl = F.instr(F.col("text"), "\n")
    return pages.withColumn(
        "title", F.when(first_nl > 0, F.substring_index("text", "\n", 1)).otherwise(F.col("text"))
    ).withColumn(
        "body", F.when(first_nl > 0, F.expr("substring(text, instr(text, '\n') + 1)")).otherwise(F.lit(""))
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    gold: DataFrame,
    config: PipelineConfig | None = None,
) -> dict:
    """Returns dict with rules, model, candidates, matches, clusters, metrics."""
    from .checkpoint import StageCheckpointer

    cfg = config or PipelineConfig()
    stages = StageCheckpointer(spark, cfg.checkpoint_dir, config_fingerprint=repr(cfg))
    idc = cfg.id_col
    if "id1" not in gold.columns:  # accept gold(url1, url2) per FIXTURES F2
        c1, c2 = gold.columns[:2]
        gold = gold.select(F.col(c1).alias("id1"), F.col(c2).alias("id2"))

    records = derive_attrs(pages).transform(persist_tracked)
    toks = records.select(F.col(idc), tokens_dlm(F.col("title")).alias("tokens"))

    # E1: labeled training sample (gold used for labels only, as in the reference)
    sample = stages.run("sample_res", lambda: build_training_sample(
        toks, gold, idc, "tokens",
        candidate_threshold=cfg.sample_threshold,
        n_random_negatives=cfg.n_random_negatives, seed=cfg.seed,
    ))

    # E1b (optional): P7 class rebalancing of the training sample
    if cfg.resample:
        from ..operators.sampler import resample_labeled

        sample = resample_labeled(sample, "label", mode=cfg.resample, seed=cfg.seed)

    # E2a: features + training (driver-side — the sample is small).
    # Features once per DISTINCT pair; oversampled duplicates re-enter
    # through the label join below.
    attr_types = infer_attr_types(records, ATTRS)
    features = generate_features(attr_types)
    feat_df = extract_features(sample.select("id1", "id2").distinct(), records,
                               idc, features)
    train_pdf = feat_df.join(sample.select("id1", "id2", "label"), ["id1", "id2"]).toPandas()
    feat_names = [f.name for f in features]
    if cfg.tune:
        from ..matcher.random_forest import tune_matcher

        model = tune_matcher(
            train_pdf[feat_names].to_numpy(), train_pdf["label"].to_numpy(),
            feature_names=feat_names, n_trees=cfg.n_trees, random_state=cfg.seed,
        )
    else:
        model = RandomForestMatcher(
            n_trees=cfg.n_trees, max_depth=cfg.max_depth, random_state=cfg.seed,
            feature_names=feat_names,
        ).fit(train_pdf[feat_names].to_numpy(), train_pdf["label"].to_numpy())

    # E2b: blocking rules from the forest's decision paths
    rules, uncovered = extract_blocking_rules(model, features)
    if not rules:
        rules = list(cfg.fallback_rules)
    log.info("extracted %d blocking rules (%d uncovered paths): %s",
             len(rules), uncovered, rules)

    # E2c: block
    candidates = stages.run("blk_res", lambda: block_self(records, idc, rules), inputs=("sample_res",))

    # E3: features on candidates + RF predict
    cand_feats = extract_features(
        candidates.select("id1", "id2"), records, idc, features,
    )
    predicted = stages.run("match_res", lambda: apply_matcher(
        cand_feats, model, threshold=cfg.match_threshold
    ).select("id1", "id2", "match_proba", "match"), inputs=("blk_res",))

    matches = predicted.filter(F.col("match")).select("id1", "id2")

    # E3b (optional): interchangeable values — group values over matched
    # pairs, re-score the negatives on the normalized table (V1-V3, V7)
    groups_per_attr: dict[str, DataFrame] = {}
    if cfg.use_value_matcher:
        from ..value_matcher.interchangeable import (
            group_values,
            rematch_negatives,
            value_pairs_from_matches,
        )

        for attr in cfg.ic_attrs:
            vp = value_pairs_from_matches(matches, records, idc, attr)
            groups_per_attr[attr] = group_values(vp, tau=cfg.ic_tau).transform(persist_tracked)
        matches = stages.run("match_res_ic", lambda: rematch_negatives(
            predicted, records, idc, features, model, groups_per_attr,
            threshold=cfg.match_threshold,
        ), inputs=("match_res",))

    # E4: transitive clustering
    clusters = stages.run("clusters", lambda: cluster_pairs(matches), inputs=("match_res",))

    n_rows = records.count()
    final_predicted = (
        matches.withColumn("match", F.lit(True)) if cfg.use_value_matcher else predicted
    )
    metrics = {
        "blocking": blocking_metrics(candidates, gold, n_rows),
        "matching": matcher_metrics(final_predicted, gold),
        "n_rules": len(rules),
        "uncovered_paths": uncovered,
        "n_clusters": clusters.select("component").distinct().count(),
    }
    return {
        "records": records,
        "rules": rules,
        "model": model,
        "features": features,
        "candidates": candidates,
        "predicted": predicted,
        "matches": matches,
        "clusters": clusters,
        "ic_groups": groups_per_attr,
        "metrics": metrics,
    }


def audit_text_identity(pages_in: DataFrame, pages_out: DataFrame,
                        id_col: str = "url") -> bool:
    """Byte-identity invariant (input_hint): text per url unchanged."""
    a = pages_in.select(F.col(id_col), F.sha2(F.col("text"), 256).alias("h1"))
    b = pages_out.select(F.col(id_col), F.sha2(F.col("text"), 256).alias("h2"))
    bad = a.join(b, id_col).filter(F.col("h1") != F.col("h2")).count()
    missing = a.join(b, id_col, "left_anti").count()
    return bad == 0 and missing == 0
