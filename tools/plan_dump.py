"""Dump formatted physical plans for the headline queries → PLANS.md.

The artifact the scale review reads: per query, the `.explain
("formatted")` output plus a one-line summary of scan pruning
(ReadSchema / PushedFilters), join strategies, and exchange count.

Usage: python tools/plan_dump.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "qc_ncounts",
    "qc_percent_feature",
    "norm_tf_idf",
    "agg_make_bulk",
    "agg_rollup",
    "win_ntile_bins",
    "join_interval_overlap",
    "join_asof",
    "dedup_minhash_bands",
    "mark_stats",
    "ml_silhouette",
    "ann_ivf",
    "stream_sessionize",
    "stream_dedup",
    "text_chunk",
    "text_pii_redact",
    "samp_stratified",
    # round-6 additions
    "agg_pivot",
    "agg_exact_median",
    "sketch_kmv",
    "graph_pagerank",
    "graph_triangles",
    "ann_pq",
    "text_boilerplate",
    "samp_temperature",
    "win_lead_lag",
    "agg_corr",
    "sql_q1",
    "sql_q3",
    "join_anti_orphans",
    "win_percentile",
    "agg_moments",
    "text_quality_filter",
    "mm_phash_dedup",
    "dedup_decontaminate",
    "agg_salted_distinct",
    "norm_pearson_residual",
    "norm_quantile",
    "text_tfidf_top",
    "ml_logreg_gd",
    "evt_funnel",
    "evt_retention",
    "norm_size_factors",
    "agg_entropy",
    "text_unigram_logprob",
    "win_range_frame",
    "ml_centroid_classify",
    "agg_salted_distinct",
    # round-7 additions
    "agg_cooccur",
    "agg_cooccur_hvg",
    "knn_cross_topk",
    "knn_cross_sharded",
    "text_minhash_cluster",
    "mm_ocr_stub",
    "ml_sgtsne_rescale",
    "src_zarr_blosc",
    "text_repetition",
    "text_hashing_tf",
    "samp_pack_sequences",
    "dedup_semdedup",
    "dedup_semantic_decon",
    "sketch_cms",
    "ml_nb_scores",
    "stream_enrich",
    "stream_join_attrib",
    "sql_q10",
    "sql_q17",
    "sql_q18",
    "ml_quality_logreg",
    "ml_auc",
    "qc_drift_psi",
    "sort_zorder",
    "samp_mixture",
    "text_zipf_fit",
    "qc_digest",
    # round-8 additions
    "knn_lsh_topk",
    "knn_radius",
    "text_segment_dedup",
    "dedup_ngram_decon",
    "samp_dsir",
    "sql_q4",
    "sql_q7",
    "sql_q8",
    "sql_q13",
    "sql_q14",
    "sql_q15",
    "sql_q19",
    "sql_q22",
    # round-8 third batch
    "sql_q2",
    "sql_q9",
    "sql_q17",
    "sql_q21",
    "graph_adamic_adar",
    "graph_reciprocity",
    "evt_rfm",
    "evt_attribution",
    "samp_curriculum",
    "text_ccnet_buckets",
    "text_readability",
    "knn_purity",
    "ml_ridge",
    "ml_conformal",
    "ml_calibration",
    "mm_image_tiles",
    "qc_table_diff",
    # round-8 fourth batch
    "evt_active_users",
    "dedup_bloom_decon",
    "graph_clustering_coeff",
    "graph_eigencentrality",
    "qc_benford",
    "ml_pr_curve",
    "agg_boxplot",
    "evt_conversion",
    "win_rolling_median",
    "evt_stage_latency",
    "text_bpe_encode",
    "pipe_text_ann",
    # round-8 final batch
    "src_csv_docs",
    "win_cusum",
    "evt_cohort_ltv",
    "dedup_keep_best",
    "evt_seasonality",
    "text_drift_terms",
    "evt_streaks",
    "text_ttr",
    # round-9 additions
    "pipe_mm_prep",
    "graph_jaccard_sim",
    "agg_weighted_median",
    "evt_churn",
    "evt_interarrival",
    "evt_pareto",
    "evt_wow",
    "samp_kcenter",
    "dedup_cross_source",
    "dedup_lsh_recall",
    "ml_ndcg",
    "src_orc_docs",
    "win_hampel",
    "evt_trend",
    "agg_log_hist",
    "stream_cms",
    "text_novelty",
    "text_jsd_drift",
    "evt_concurrency",
    "dedup_normalized",
    "sketch_hll_merge",
    "evt_drawdown",
    "evt_welch_t",
    "win_bollinger",
    "agg_grouped_p90",
    # round-10/11 additions
    "ann_ivf_persisted",
    "ann_ivf_append",
    "evt_holt",
    "evt_holt_winters",
    "evt_acf",
    "ml_spectral_cluster",
    "pipe_atlas_prep",
    "pipe_mapping",
    "ml_kmeans",
    "ml_leiden",
    "clust_paris_cut",
    # round-13 additions: the two re-planned operators (two-phase
    # prefix sweep; identical-class-collapsed LSH chain feeding the
    # star-contraction components) and the scan-fused harmony
    "join_interval_sweep",
    "dedup_components",
    "ml_harmony",
    # round-14 additions: the de-hinted graph/label joins (forced
    # node-sized broadcasts removed — at this sf AQE still picks a
    # broadcast join on its own, which is the point; at scale the
    # same plan shuffles on the entity key)
    "graph_membership",
    "graph_magic_t1",
    "graph_modularity",
    "graph_mapping_score",
    "ml_lisi",
]


def formatted_plan(df) -> str:
    from pyspark.sql import SparkSession

    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def summarize(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_bhj = len(re.findall(r"\bBroadcastHashJoin\b", plan))
    n_smj = len(re.findall(r"\bSortMergeJoin\b", plan))
    n_cart = len(re.findall(r"\bCartesianProduct\b", plan))
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    pushed = re.findall(r"PushedFilters: (\[[^\]]*\])", plan)
    lines = [
        f"exchanges={n_ex}, broadcast_joins={n_bhj}, sort_merge_joins={n_smj}, "
        f"cartesian={n_cart}"
    ]
    for s in schemas[:4]:
        lines.append(f"scan: {s[:120]}")
    for p in pushed[:4]:
        if p != "[]":
            lines.append(f"pushed: {p[:120]}")
    return "\n".join(lines)


def main() -> int:
    import __spark_entry__ as entry_mod
    from scarf_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    spark = get_spark("plan-dump")
    qs = entry_mod.queries()
    parts = [
        "# PLANS — formatted physical plans for the headline queries\n",
        f"Generated by `tools/plan_dump.py` at `{sf_dir}`. Summary first,",
        "full `.explain(\"formatted\")` output folded below each query.",
        "Scan lines show column pruning (ReadSchema) and predicate",
        "pushdown reaching the parquet reader.\n",
    ]
    for name in HEADLINE:
        if name not in qs:
            continue
        plan = formatted_plan(qs[name](spark, sf_dir))
        parts.append(f"## {name}\n")
        parts.append("```\n" + summarize(plan) + "\n```\n")
        parts.append(
            "<details><summary>full plan</summary>\n\n```\n"
            + plan.strip()
            + "\n```\n</details>\n"
        )
    with open(out_md, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {out_md} ({len(parts)} sections)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
