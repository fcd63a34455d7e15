"""Scale smoke: run the engine's scale-critical kernels on synthetic
10M–50M-row inputs (100–1000× the sf0.1 fixtures) and print one JSON
line per kernel — wall seconds and the rows-per-second the local[N] box
sustains. This is the local evidence behind SCALE.md's claims: the same
plans at 100 TB only change by partition count, not shape.

Inputs are generated with spark.range (no driver materialization, no
files): this harness exercises PLANS, shuffles, and memory behavior —
correctness at these sizes is covered by the partitioning-invariance
properties and the oracle gate at the fixture SFs.

Usage: python tools/scale_smoke.py [rows_millions]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


_ONLY = [s for s in os.environ.get("SMOKE_ONLY", "").split(",") if s]


def timed(name, df, results):
    """df: a DataFrame, or a zero-arg callable returning one (use the
    callable form when the operator does eager work — persists,
    counts — at construction time, so that work is inside the timer).

    SMOKE_ONLY=substr1,substr2 runs only kernels whose name matches a
    substring — inputs are lazy spark.range expressions, so skipped
    kernels cost nothing."""
    if _ONLY and not any(s in name for s in _ONLY):
        return
    t0 = time.time()
    if callable(df):
        df = df()
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    results[name] = round(dt, 2)
    print(f"  {name}: {dt:.1f}s", file=sys.stderr)


def main() -> None:
    from scarf_spark.session import get_spark

    mrows = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    n = int(mrows * 1e6)
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}

    # synthetic COO fact table: ~n rows, 100k cells x 2k feats
    counts = (
        spark.range(n)
        .select(
            (F.col("id") % 100_000).alias("cell_id"),
            ((F.col("id") * 7919) % 2_000).alias("feat_id"),
            ((F.col("id") % 50) + 1.0).alias("value"),
        )
    )

    # 1. hash-agg QC: the engine's bread-and-butter single shuffle
    timed("qc_agg_ncounts", counts.groupBy("cell_id").agg(F.sum("value")), results)

    # 2. broadcast-join normalization: agg + broadcast back, fact never
    # reshuffled
    tot = counts.groupBy("cell_id").agg(F.sum("value").alias("_t"))
    timed(
        "norm_broadcast_join",
        counts.join(F.broadcast(tot), "cell_id").select(
            "cell_id", "feat_id", (F.col("value") / F.col("_t")).alias("nv")
        ),
        results,
    )

    # 3. distributed exact global ntile — grid branch (the plan that
    # replaces the single-partition window at scale)
    from scarf_spark.operators.windows import global_ntile

    vals = spark.range(n).select(
        F.col("id"), ((F.col("id") * 2654435761) % 1_000_003).cast("double").alias("x")
    )
    timed(
        "global_ntile_grid",
        global_ntile(vals, ["x", "id"], 100, small_threshold=0),
        results,
    )

    # 4. KMV sketch over a high-cardinality key (distinct + window + agg)
    from scarf_spark.operators.aggregate import kmv_distinct

    ev = spark.range(n).select(
        (F.col("id") % 5).cast("string").alias("event_type"),
        ((F.col("id") * 104729) % 10_000_019).alias("user_id"),
    )
    timed("kmv_sketch", kmv_distinct(ev, "event_type", "user_id", k=64), results)

    # 5. one PageRank iteration on a 5M-edge graph (edge join + agg)
    e = spark.range(min(n, 5_000_000)).select(
        (F.col("id") % 1_000_000).alias("src"),
        ((F.col("id") * 31) % 1_000_000).alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = e.select(F.col("src").alias("v")).distinct().select(
        "v", F.lit(1e-6).alias("r")
    )
    timed(
        "pagerank_iteration",
        e.join(deg, "src")
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("r") / F.col("deg"))),
        results,
    )

    # 6. the full marker-stats chain (round-5 single-scan shape:
    # broadcast groups into the scan → contingency cube → one window
    # pass → group aggregates) over synthetic cells/groups
    from scarf_spark.operators.markers import marker_stats

    groups = spark.range(100_000).select(
        F.col("id").alias("cell_id"),
        (F.col("id") % 5).cast("string").alias("group"),
    )
    timed(
        "marker_stats_chain",
        lambda: marker_stats(counts, groups, n_cells=100_000, group_col="group"),
        results,
    )

    # 7. minhash signatures (the real operator: per-seed numeric MIN in
    # ONE hash agg with primitive long state) over synthetic shingles
    from scarf_spark.operators.dedup import minhash_signatures_wide

    sh = spark.range(n).select(
        (F.col("id") % 1_000_000).alias("doc_id"),
        F.md5(((F.col("id") * 31) % 4_000_000).cast("string")).alias("shingle"),
    )
    timed("minhash_signatures", minhash_signatures_wide(sh, 8), results)

    # 8. IVF ANN search over 200k synthetic vectors (dim 32): the
    # centroid-ranking mapInPandas + cogrouped per-list BLAS path
    from scarf_spark.operators.knn import cosine_knn_ivf

    nv = min(200_000, n)
    emb = spark.range(nv).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda d: ((F.col("id") * d * 2654435761) % 1000) / 500.0 - 1.0,
        ).alias("embedding"),
    )
    timed(
        "ivf_ann_200k",
        cosine_knn_ivf(emb, k=5, n_cells=256, n_probe=2),
        results,
    )

    # 9. sharded EXACT knn (round 6): index never collected to the
    # driver; 50k x 50k exact = 2.5e9 scored pairs through per-shard
    # BLAS blocks + one window re-rank
    from scarf_spark.operators.knn import cosine_knn_sharded

    emb_s = emb.limit(50_000)
    timed(
        "sharded_exact_knn_50k",
        lambda: cosine_knn_sharded(emb_s, k=5, n_shards=8),
        results,
    )

    # 10. zarr sink+scan roundtrip (round 6): one shuffle on chunk
    # coordinate, executor-side chunk writes, then the distributed
    # chunk decode
    import tempfile

    from scarf_spark.sources.zarr import coo_to_zarr, read_zarr_2d_coo

    zdir = os.path.join(tempfile.gettempdir(), "scale_smoke_zarr")

    def _zarr_roundtrip():
        coo = counts.limit(2_000_000).select(
            F.col("cell_id").alias("row"), F.col("feat_id").alias("col"), "value"
        )
        coo_to_zarr(coo, zdir, (100_000, 2_000), chunks=(4096, 256))
        return read_zarr_2d_coo(spark, zdir)

    timed("zarr_roundtrip_2m", _zarr_roundtrip, results)

    # 11. count-min sketch build+probe (round 7): the shuffle carries
    # only the d*w=256-cell partial states regardless of n
    from scarf_spark.operators.aggregate import cms_heavy_hitters

    terms = spark.range(n).select(
        ((F.col("id") * 48271) % 100_000).cast("string").alias("term")
    )
    timed("cms_heavy_hitters", cms_heavy_hitters(terms, "term", n_top=20), results)

    # 12. sequence packing (round 7): one hash partition + per-bucket
    # window cumsum over n docs
    from scarf_spark.operators.filters import pack_sequences

    docs_s = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("w w w w w w w w").alias("text")
    )
    timed(
        "pack_sequences",
        pack_sequences(docs_s, budget=4096, n_buckets=64),
        results,
    )

    # 13. z-order keys (round 7): pure projection + one broadcast
    # extent row — should run at scan speed
    from scarf_spark.operators.windows import zorder_key

    ev2 = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7) % 100_000).alias("a"),
        ((F.col("id") * 13) % 1_000).cast("double").alias("b"),
    )
    timed("zorder_keys", zorder_key(ev2, "a", "b"), results)

    # 14. table digest (round 7): one scan into a single XOR-merged row
    from scarf_spark.operators.qc import table_digest

    timed("table_digest", table_digest(ev2), results)

    # 15. skewed sort-merge join: key 0 holds ~30% of the fact side
    # (a 6M-row hot partition at 20M). Timed with AQE on, as every
    # session runs; the split itself engages once the hot partition
    # passes the 256MB skew threshold, which real-scale skew does
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % n)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    timed(
        "skewed_join_smj",
        fact.join(dim, "k").groupBy().agg(F.count("*"), F.sum("w")),
        results,
    )

    # 16. grid radius search (round 8): 50k x 50k all-pairs threshold
    # scan through the (query-block x index-shard) cogroup grid — no
    # index broadcast, per-task memory = one shard
    from scarf_spark.operators.knn import cosine_radius

    timed(
        "radius_grid_50k",
        lambda: cosine_radius(emb_s, radius=0.05, n_shards=8),
        results,
    )

    # 17. star-contraction components (round 8) on a high-diameter
    # graph: 1M-node path ⇒ the min-label fixpoint would need 1M
    # rounds; star contraction closes it in O(log n)
    from scarf_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    path_edges = spark.range(min(n, 1_000_000) - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    star_rounds: list[int] = []
    timed(
        "components_star_path_1m",
        lambda: connected_components_star(path_edges, rounds_out=star_rounds),
        results,
    )
    if star_rounds:
        results["components_star_path_1m_rounds"] = star_rounds[0]

    # 17b. head-to-head round count on a 64-node path (diameter 63):
    # the min-label fixpoint needs O(diameter) rounds — measured here
    # and linear in path length, so the 1M path above would take ~1M
    # rounds vs star contraction's O(log n) measured in 17. (The
    # fixpoint now RAISES past its cap instead of returning unconverged
    # labels.)
    small_path = spark.range(63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    fix_rounds: list[int] = []
    star_rounds_64: list[int] = []
    timed(
        "components_fixpoint_path_64",
        lambda: connected_components(
            small_path, max_rounds=200, rounds_out=fix_rounds
        ),
        results,
    )
    if fix_rounds:
        results["components_fixpoint_path_64_rounds"] = fix_rounds[0]
    timed(
        "components_star_path_64",
        lambda: connected_components_star(
            small_path, rounds_out=star_rounds_64
        ),
        results,
    )
    if star_rounds_64:
        results["components_star_path_64_rounds"] = star_rounds_64[0]

    # 18. semdedup shard grid (round 8): one deliberately skewed
    # mega-cluster (all vectors) forced through the shard-pair grid —
    # per-task BLAS bounded at (2*cap)^2 regardless of cluster size
    from scarf_spark.operators.dedup import semdedup

    emb_k = emb.limit(20_000)
    timed(
        "semdedup_sharded_20k",
        lambda: semdedup(emb_k, k=1, n_iter=1, eps=0.01, shard_cap=2048),
        results,
    )

    # 19. cross-doc segment dedup (round 8): narrow segmentation + one
    # doc-frequency agg keyed by the segment string
    from scarf_spark.operators.text import segment_dedup

    docs_sd = spark.range(min(n, 2_000_000)).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("common header text always the same eight"),
            ((F.col("id") * 31) % 99_991).cast("string"),
            ((F.col("id") * 67) % 99_991).cast("string"),
        ).alias("text"),
    )
    timed("segment_dedup_2m", segment_dedup(docs_sd), results)

    # 20. diagonal-GMM EM (round 8): long-form E-step joins n·d dim
    # rows against the broadcast k·d parameter table; per-iteration
    # shuffle state is k·d weighted-moment rows, never vectors
    from scarf_spark.ml.cluster import gmm_diag

    emb_g = spark.range(100_000).select(
        F.col("id").alias("cell_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda dd: ((F.col("id") * dd * 48271) % 1000) / 500.0 - 1.0,
        ).alias("v"),
    )
    timed(
        "gmm_em_100k",
        lambda: gmm_diag(emb_g, k=4, n_iter=2),
        results,
    )

    # 21. grouped exact ntile / rank (round 8): the per-group fixed-grid
    # rank-arithmetic plan — one skewed giant group (80% of rows) plus
    # many small ones; no single-task sort, offsets stay distributed
    from scarf_spark.operators.windows import grouped_ntile

    gn = spark.range(n).select(
        F.when(F.col("id") % 5 < 4, F.lit("big"))
        .otherwise((F.col("id") % 37).cast("string"))
        .alias("grp"),
        ((F.col("id") * 2654435761) % 999_983).cast("double").alias("x"),
        F.col("id"),
    )
    timed(
        "grouped_ntile_skewed",
        grouped_ntile(gn, ["grp"], ["x", "id"], 10),
        results,
    )

    # 22. Adamic-Adar wedges (round 8): self-join on the middle vertex
    # over a degree-bounded graph — wedge volume n_nodes * deg^2, the
    # shape that stays linear in nodes at any corpus size
    from scarf_spark.operators.graph import adamic_adar

    e_aa = spark.range(min(n, 2_000_000)).select(
        (F.col("id") % 500_000).alias("src"),
        ((F.col("id") * 97) % 500_000).alias("dst"),
    )
    timed("adamic_adar_2m_edges", lambda: adamic_adar(e_aa), results)

    # 23. weighted-median / p90 grid (round 9): the threshold-crossing
    # exact quantile over integer weights — grid bucketing keeps every
    # task bounded by one (group, cell); skewed weights included
    from scarf_spark.operators.windows import grouped_weighted_median

    wm = spark.range(n).select(
        (F.col("id") % 97).cast("string").alias("grp"),
        ((F.col("id") * 2654435761) % 1_000_003).alias("x"),
        ((F.col("id") % 19) + 1).alias("w"),
    )
    timed(
        "weighted_median_grid",
        lambda: grouped_weighted_median(wm, ["grp"], "x", "w"),
        results,
    )

    # 24. session-concurrency sweep line (round 9): sessionize + ±1
    # deltas + day-partitioned running sum — windows bounded by one
    # day's churn, never the full history
    from scarf_spark.operators.windows import session_concurrency

    ev_sc = spark.range(min(n, 20_000_000)).select(
        (F.col("id") % 200_000).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            (F.col("id") * 37) % (30 * 86400)
        ).alias("ts"),
    )
    timed(
        "session_concurrency_sweep",
        lambda: session_concurrency(ev_sc),
        results,
    )

    # 25. greedy k-center (round 9): k BLAS-broadcast rounds; state is
    # the selected-center set (k vectors), never the corpus
    from scarf_spark.operators.filters import kcenter_sample

    emb_kc = spark.range(200_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda dd: ((F.col("id") * dd * 16807) % 1000) / 500.0 - 1.0,
        ).alias("embedding"),
    )
    timed(
        "kcenter_200k_k16",
        lambda: kcenter_sample(emb_kc, k=16),
        results,
    )

    # 26. distributed pseudotime round (round 10): the deflated
    # Richardson matvec — same shape as the pagerank kernel but with
    # the deflation scalar broadcast back; state is one node-sized
    # vector per round regardless of edge count
    from scarf_spark.ml.pseudotime import harmonic_potential

    e_hp = spark.range(min(n, 5_000_000)).select(
        (F.col("id") % 1_000_000).alias("src"),
        ((F.col("id") * 31 + 1) % 1_000_000).alias("dst"),
        ((F.col("id") % 7) + 1.0).alias("weight"),
    ).where(F.col("src") != F.col("dst"))
    timed(
        "harmonic_potential_5m_edges_4rounds",
        lambda: harmonic_potential(e_hp, source_node=0, n_iter=4),
        results,
    )

    # 27. block spectral round (round 10): both embedding columns walk
    # in one join+agg; the Gram aggregate is 5 scalar sums regardless
    # of n — state per round is the 2-column node table
    from scarf_spark.ml.embed import spectral_embedding

    e_sp = spark.range(min(n, 2_000_000)).select(
        (F.col("id") % 400_000).alias("src"),
        ((F.col("id") * 29 + 3) % 400_000).alias("dst"),
        ((F.col("id") % 5) + 1.0).alias("weight"),
    ).where(F.col("src") != F.col("dst"))
    timed(
        "spectral_embed_400k_nodes_3rounds",
        lambda: spectral_embedding(e_sp, dims=2, n_iter=3),
        results,
    )

    # 28. O(batch) IVF append (round 10): centroids persist in the
    # registry (built once, OUTSIDE the timer); the timed append is
    # one broadcast-BLAS assignment pass over the BATCH plus a single
    # columnar id-scan of base for the registry key — no list scan,
    # no rebuild, so cost tracks batch size, not the 10M-vector base
    import shutil
    import tempfile

    from scarf_spark.operators.knn import ivf_append_persisted
    from scarf_spark.plans.registry import RunRegistry

    def _ivf_vec(rows, offset=0):
        return spark.range(rows).select(
            (F.col("id") + offset).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(32)),
                lambda dd: ((F.col("id") * dd * 2654435761) % 1000) / 500.0
                - 1.0,
            ).alias("embedding"),
        )

    base_ivf = _ivf_vec(min(n, 10_000_000))
    reg_root = tempfile.mkdtemp(prefix="smoke_ivf_reg_")
    reg = RunRegistry(spark, reg_root)
    try:
        # warm the registry: the one-time index build is maintenance,
        # not append cost
        ivf_append_persisted(
            base_ivf, _ivf_vec(8, offset=100_000_000), reg, n_cells=16
        ).count()
        timed(
            "ivf_append_10m_base_1m_batch",
            lambda: ivf_append_persisted(
                base_ivf,
                _ivf_vec(1_000_000, offset=200_000_000),
                reg,
                n_cells=16,
            ),
            results,
        )
    finally:
        shutil.rmtree(reg_root, ignore_errors=True)

    # 29. Holt / Holt-Winters / ACF folds (round 10): the per-type
    # daily pre-aggregate is the ONLY full-data pass — the list-state
    # fold itself sees n_types x n_days rows (here 5 x 400 = 2000), so
    # the recursion input is calendar-bounded no matter how many raw
    # events feed it
    from scarf_spark.operators.windows import holt_linear, volume_acf

    ev_sm = spark.range(n).select(
        F.element_at(
            F.array(*[F.lit(t) for t in ["a", "b", "c", "d", "e"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + (F.col("id") % 400) * 86_400_000_000
            + (F.col("id") * 7919) % 86_400_000_000
        ).alias("ts"),
    )
    timed("holt_fold_daily_preagg", lambda: holt_linear(ev_sm), results)
    timed("acf_lag7_daily_preagg", lambda: volume_acf(ev_sm), results)

    # 30. sharded cross-set KNN (round 11): the pipe_mapping hot stage
    # at scale — 20k target vectors scored EXACTLY against a 100k
    # reference index through the shard grid (no driver-side index
    # collect); per-task memory is one index shard + a 1024 x shard
    # distance block. Exact cross-KNN is inherently quadratic in pair
    # count (2e9 pairs here) — the grid bounds MEMORY, and past ~1e10
    # pairs the documented route is the IVF probe (kernel 28 / 8),
    # which bounds WORK as well.
    from scarf_spark.operators.knn import cosine_knn_cross_sharded

    ref_x = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda dd: ((F.col("id") * dd * 48271) % 1000) / 500.0 - 1.0,
        ).alias("embedding"),
    )
    tgt_x = spark.range(20_000).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda dd: ((F.col("id") * dd * 69621) % 1000) / 500.0 - 1.0,
        ).alias("embedding"),
    )
    timed(
        "cross_knn_20k_vs_100k",
        lambda: cosine_knn_cross_sharded(tgt_x, ref_x, k=3, n_shards=8),
        results,
    )

    # 31. salted binned interval join (round 11): n/2 query vs n/2 ref
    # intervals over a value domain sized so output ≈ 4 pairs/query —
    # realistic overlap density. The salt splits each (chrom, bin)
    # key's pair generation across tasks, which AQE cannot do itself
    # (it sizes reduce partitions by shuffle INPUT bytes and a
    # pair-exploding join's input is tiny relative to its output).
    from scarf_spark.operators.joins import interval_overlap_join_binned

    half = n // 2
    dom = float(half) * 25.0  # ~1 ref interval per 25-unit span
    qi_iv = spark.range(half).select(
        F.col("id"),
        F.concat(F.lit("chr"), (F.col("id") % 3).cast("string")).alias("chrom"),
        (((F.col("id") * 48271) % F.lit(int(dom))).cast("double")).alias("start"),
    ).select("id", "chrom", "start", (F.col("start") + 50.0).alias("end"))
    ri_iv = spark.range(half).select(
        (F.col("id") + n).alias("id"),
        F.concat(F.lit("chr"), (F.col("id") % 3).cast("string")).alias("chrom"),
        (((F.col("id") * 69621) % F.lit(int(dom))).cast("double")).alias("start"),
    ).select(
        "id", "chrom", "start", (F.col("start") + 25.0).alias("end"),
        F.lit(1.0).alias("value"),
    )
    timed(
        "interval_join_salted",
        lambda: interval_overlap_join_binned(qi_iv, ri_iv, bin_size=100).select(
            "q_id", "r_id"
        ),
        results,
    )

    # 31b. DENSE single-chromosome meld (round 13): every event in one
    # chromosome — the worst case for the old one-task-per-chrom sweep
    # window and the reason the pair-free plan exists (inputs too
    # dense to pair-join). Same aggregate from three plans: the salted
    # binned pair join (materializes ~4 pairs/query), the single-window
    # sweep (serializes the chromosome onto one task), and the
    # two-phase grid sweep (per-(chrom, bucket) windows + broadcast
    # offsets — the 100× plan, which must beat the pair join here).
    from scarf_spark.operators.joins import overlap_sum, overlap_sum_sweep

    # DENSE means pairs >> inputs: stretch the intervals so each query
    # overlaps ~100 refs — the pair join must materialize ~50x the
    # input rows while the sweep's cost stays linear in events
    qd_iv = qi_iv.withColumn("chrom", F.lit("chr0")).withColumn(
        "end", F.col("start") + 500.0
    )
    rd_iv = ri_iv.withColumn("chrom", F.lit("chr0")).withColumn(
        "end", F.col("start") + 2000.0
    )
    timed(
        "interval_dense_pairjoin",
        lambda: overlap_sum(qd_iv, rd_iv, bin_size=100, value_scale=100),
        results,
    )
    timed(
        "interval_dense_sweep_2phase",
        lambda: overlap_sum_sweep(qd_iv, rd_iv, value_scale=100, two_phase=True),
        results,
    )
    if os.environ.get("SMOKE_SWEEP_1TASK", "0") == "1":
        # opt-in: the one-task baseline is the slow path being replaced
        timed(
            "interval_dense_sweep_1task",
            lambda: overlap_sum_sweep(
                qd_iv, rd_iv, value_scale=100, two_phase=False
            ),
            results,
        )

    # 32. memoized near-dup chain end-to-end (round 12): the shared
    # LSH → df-capped-Jaccard-verify → components prefix exactly as
    # __spark_entry__._verified_dedup_comp builds it (shingle table
    # persisted once and reused by both the minhash MIN-agg and the
    # set-semantics verify). 10M docs, 12 words each, ~10% near-dup
    # pairs differing in one word; run at two doc counts
    # (SMOKE_DEDUP_DOCS env) to check near-linear scaling.
    from scarf_spark.operators import dedup as dd

    n_docs = int(os.environ.get("SMOKE_DEDUP_DOCS", str(min(n, 10_000_000))))
    n_base = int(n_docs * 0.9)
    base = (F.col("id") % n_base)
    is_dup = (F.col("id") >= n_base).cast("long")
    # modulus >> 31 * n_base so word identity never wraps: two BASE
    # docs share a whole text only if the linear codes collide, which
    # the wide modulus prevents (a 200k modulus made every 200k-th doc
    # bit-identical — 45 copies per class at 10M docs — and the LSH
    # candidate set exploded quadratically with the class size instead
    # of tracking the intended 10% near-dup rate)
    words = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda w: F.concat(
            F.lit("w"),
            (
                (base * 31 + w * 7919 + is_dup * F.when(w == 12, 1).otherwise(0))
                % 1_000_000_000
            ).cast("string"),
        ),
    )
    docs_big = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )

    def _dedup_chain():
        # mirrors __spark_entry__._verified_dedup_comp (round 13): the
        # collapsed chain — identical-class map, rep-only shingles,
        # rep-level candidates + Jaccard, star-expanded exact components
        classes = dd.identical_classes(docs_big).persist()
        ch = dd.lsh_collapse_chain(
            docs_big, n=3, n_hashes=8, n_bands=4, classes=classes
        )
        ch["rep_shingles"] = ch["rep_shingles"].persist()
        ch["rep_pairs"] = ch["rep_pairs"].persist()
        rep_jac, capped = dd.collapsed_rep_jaccard(ch, df_cap=100)
        ve = rep_jac.where(F.col("jaccard") >= 0.5).select(
            F.col("ra").alias("a"), F.col("rb").alias("b")
        )
        edges = dd.star_expand_edges(ve, ch["classes"], capped.select("rep"))
        return dd.star_components(edges, docs_big)

    timed(f"dedup_memo_chain_{n_docs // 1_000_000}M", _dedup_chain, results)

    # 32b. boilerplate identical-class hazard (round 13): the same
    # corpus with every 20th doc REPLACED by one fixed boilerplate
    # text — a n_docs/20-member identical class (500k members at 10M
    # docs). Uncollapsed, the bucket self-join alone would materialize
    # 4 × (n/20)² ≈ 10¹¹ rows; the collapse runs the chain on ONE
    # representative and re-joins members as O(class) star edges, so
    # this kernel completing at all — in the same ballpark as the
    # boilerplate-free chain above — IS the result.
    is_boiler = (F.col("doc_id") % 20 == 0)
    docs_boiler = docs_big.select(
        "doc_id",
        F.when(
            is_boiler,
            F.lit("standard legal disclaimer text appended to every crawled page by the template"),
        ).otherwise(F.col("text")).alias("text"),
    )

    def _dedup_chain_boiler():
        classes = dd.identical_classes(docs_boiler).persist()
        ch = dd.lsh_collapse_chain(
            docs_boiler, n=3, n_hashes=8, n_bands=4, classes=classes
        )
        ch["rep_shingles"] = ch["rep_shingles"].persist()
        ch["rep_pairs"] = ch["rep_pairs"].persist()
        rep_jac, capped = dd.collapsed_rep_jaccard(ch, df_cap=100)
        ve = rep_jac.where(F.col("jaccard") >= 0.5).select(
            F.col("ra").alias("a"), F.col("rb").alias("b")
        )
        edges = dd.star_expand_edges(ve, ch["classes"], capped.select("rep"))
        return dd.star_components(edges, docs_boiler)

    timed(
        f"dedup_chain_boilerplate_{n_docs // 1_000_000}M",
        _dedup_chain_boiler,
        results,
    )

    # 32c. many-MEDIUM-classes expansion hazard (round 14): duplicate
    # mass spread across n_docs/10 classes of 10 members each (1M
    # classes × 10 at 10M docs) instead of one giant class. This is
    # the collapse's OTHER extreme: the multi-member class table is
    # now CORPUS-sized (every doc sits in a multi-member class), so
    # the member re-expansion joins cannot broadcast — they must
    # shuffle the full class map — while the rep-level chain runs on
    # 10x fewer texts. Same near-dup structure as kernel 32 at the
    # CLASS level (10% of classes are one-word-off near-dups of a
    # base class), so candidate pairs and Jaccard-verified edges
    # genuinely fan out through the member expansion.
    cls_id = F.expr("id DIV 10")
    n_cls_base = int((n_docs // 10) * 0.9)
    base_c = cls_id % n_cls_base
    is_dup_c = (cls_id >= n_cls_base).cast("long")
    words_c = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda w: F.concat(
            F.lit("w"),
            (
                (base_c * 31 + w * 7919
                 + is_dup_c * F.when(w == 12, 1).otherwise(0))
                % 1_000_000_000
            ).cast("string"),
        ),
    )
    docs_med = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words_c).alias("text")
    )

    def _dedup_chain_medium():
        classes = dd.identical_classes(docs_med).persist()
        ch = dd.lsh_collapse_chain(
            docs_med, n=3, n_hashes=8, n_bands=4, classes=classes
        )
        ch["rep_shingles"] = ch["rep_shingles"].persist()
        ch["rep_pairs"] = ch["rep_pairs"].persist()
        rep_jac, capped = dd.collapsed_rep_jaccard(ch, df_cap=100)
        ve = rep_jac.where(F.col("jaccard") >= 0.5).select(
            F.col("ra").alias("a"), F.col("rb").alias("b")
        )
        edges = dd.star_expand_edges(ve, ch["classes"], capped.select("rep"))
        return dd.star_components(edges, docs_med)

    timed(
        f"dedup_chain_medium_classes_{n_docs // 1_000_000}M",
        _dedup_chain_medium,
        results,
    )

    # 33. graph label join at broadcast-impossible node counts (round
    # 14): membership_strength used to hint-force its label table (one
    # row per cell) into a broadcast; with the hint gone, AQE must
    # take the shuffle path once labels outgrow the threshold. 100M
    # nodes × k=3 neighbors — the label table alone is multiple GB
    # serialized, far past the 8 GB broadcast hard limit at real
    # executor counts — proving the de-hinted plan completes with
    # linear-shuffle economics (join on dst, hash agg on (src, label),
    # per-src top-1 window).
    from scarf_spark.operators.graph import membership_strength

    n_nodes = int(
        os.environ.get("SMOKE_GRAPH_NODES", str(min(n * 5, 100_000_000)))
    )
    k_nb = 3
    ed = spark.range(n_nodes * k_nb).select(
        (F.col("id") % n_nodes).alias("src"),
        ((F.col("id") * 2654435761 + 17) % n_nodes).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    lb = spark.range(n_nodes).select(
        F.col("id").alias("cell_id"),
        (F.col("id") % 100).cast("string").alias("label"),
    )
    timed(
        f"graph_label_shuffle_{n_nodes // 1_000_000}M",
        lambda: membership_strength(ed, lb, k_nb),
        results,
    )

    # 34. de-hinted matrix-power path (round 15): magic_impute t=2
    # chains the edge self-join matmul (n·k² rows after the square)
    # THEN the per-cell value join that round 14 un-hinted — the
    # heaviest de-hinted composition in the engine. The value table is
    # node-count-sized (GBs serialized at 50M nodes, past any real
    # broadcast limit), so AQE must shuffle-join it against the
    # squared operator; the kernel proves that plan completes with
    # linear-shuffle economics (self-join on the middle key, hash agg
    # on (src, dst), value join on dst, final hash agg on src).
    from scarf_spark.operators.graph import magic_impute

    n_mag = int(
        os.environ.get("SMOKE_MAGIC_NODES", str(min(n * 5 // 2, 50_000_000)))
    )
    ed2 = spark.range(n_mag * k_nb).select(
        (F.col("id") % n_mag).alias("src"),
        ((F.col("id") * 2654435761 + 17) % n_mag).alias("dst"),
        (F.pmod(F.col("id"), 7) + F.lit(1.0)).alias("weight"),
    )
    mvals = spark.range(n_mag).select(
        F.col("id").alias("cell_id"),
        (F.pmod(F.col("id"), 1000) / F.lit(10.0)).alias("value"),
    )
    timed(
        f"magic_power_shuffle_{n_mag // 1_000_000}M",
        lambda: magic_impute(ed2, mvals, t=2),
        results,
    )

    total = round(sum(results.values()), 2)
    print(
        json.dumps(
            {
                "metric": "scale_smoke_total",
                "value": total,
                "unit": "sec",
                "rows": n,
                "kernels": results,
                "mrows_per_sec": {
                    k: round(n / 1e6 / v, 1) if v else None
                    for k, v in results.items()
                    # *_rounds entries are iteration counts, not times
                    if not k.endswith("_rounds")
                },
            }
        )
    )


if __name__ == "__main__":
    main()
