"""Round-9 regression tests: the ADVICE fixes — grouped_rank NULL/NaN
sentinel cells, pmod channel attribution (batch ≡ stream for negative
props.k), drift_terms empty-slice guard, nb_pr_curve / conformal_ridge
empty-input behavior — plus the pipe_text_ann sharded-KNN reroute."""

import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from scarf_spark.operators import text, windows


def test_grouped_rank_null_keys_match_window(spark):
    # NULL order keys used to vanish: the grid cell was NULL and the
    # equi-join dropped the row, while row_number() ranks them
    # nulls-first. The sentinel cell (-1) restores bit-equivalence.
    rows = [(0, 0, None), (1, 0, 5.0), (2, 0, None), (3, 0, 1.0),
            (4, 1, None), (5, 1, 2.0)]
    df = spark.createDataFrame(rows, "id long, g int, x double")
    got = {
        r["id"]: r["rank"]
        for r in windows.grouped_rank(df, ["g"], ["x", "id"], grid=4).collect()
    }
    w = Window.partitionBy("g").orderBy("x", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want
    assert len(got) == len(rows)  # no dropped rows


def test_grouped_rank_nan_keys_match_window(spark):
    # NaN sorts LAST in Spark's ascending order (greater than +Inf);
    # the dedicated `grid` cell keeps that without letting one NaN
    # poison the whole group's min/max span.
    rows = [(0, 0, float("nan")), (1, 0, 5.0), (2, 0, 1.0),
            (3, 0, float("nan")), (4, 0, 9.0)]
    df = spark.createDataFrame(rows, "id long, g int, x double")
    got = {
        r["id"]: r["rank"]
        for r in windows.grouped_rank(df, ["g"], ["x", "id"], grid=4).collect()
    }
    w = Window.partitionBy("g").orderBy("x", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_grouped_ntile_null_nan_mix_matches_window(spark):
    rows = [(i, i % 2, v) for i, v in enumerate(
        [None, 3.0, float("nan"), 1.0, None, 2.0, 7.0, float("nan"), 4.0]
    )]
    df = spark.createDataFrame(rows, "id long, g int, x double")
    got = {
        r["id"]: r["bin"]
        for r in windows.grouped_ntile(df, ["g"], ["x", "id"], 3, grid=4).collect()
    }
    w = Window.partitionBy("g").orderBy("x", "id")
    want = {
        r["id"]: r["bin"]
        for r in df.select("id", F.ntile(3).over(w).alias("bin")).collect()
    }
    assert got == want


def _attrib_events(spark, ks):
    rows = []
    for i, k in enumerate(ks):
        rows.append(
            (1, f"2024-01-01 00:{i:02d}:00", 2 * i, "click", 0.0,
             json.dumps({"k": k}))
        )
        rows.append(
            (1, f"2024-01-01 00:{i:02d}:30", 2 * i + 1, "purchase", 1.5, "{}")
        )
    return spark.createDataFrame(
        rows,
        "user_id long, ts string, event_id long, event_type string, "
        "value double, props string",
    )


def test_attribution_negative_k_is_pmod(spark):
    # Spark's sign-following % would map k=-3 to channel -3 (and k=-1
    # to the no-click sentinel -1); pmod keeps channels non-negative,
    # matching the stream twin's Python %.
    events = _attrib_events(spark, ks=[-3, -1, 7])
    out = {r["channel"]: r["n_purchases"]
           for r in windows.last_touch_attribution(events, 10).collect()}
    assert out == {7: 2, 9: 1}  # pmod(-3,10)=7, pmod(-1,10)=9
    assert -1 not in out  # sentinel reserved for no-prior-click


def test_drift_terms_empty_slice_raises(spark):
    docs = spark.createDataFrame(
        [(1, "srcX", "a b"), (2, "srcX", "b c")],
        "doc_id long, source string, text string",
    )
    with pytest.raises(ValueError, match="empty comparison slice"):
        text.drift_terms(docs, split_value="srcX").collect()
    with pytest.raises(ValueError, match="empty comparison slice"):
        text.drift_terms(docs, split_value="absent").collect()


def test_nb_pr_curve_empty_input(spark):
    from scarf_spark.ml import metrics

    docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert metrics.nb_pr_curve(docs).count() == 0  # no TypeError


def test_conformal_ridge_empty_calibration_raises(spark):
    from scarf_spark.ml.supervised import conformal_ridge

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label double"
    )
    with pytest.raises(ValueError, match="calibration split is empty"):
        conformal_ridge(emb)


def test_pipe_text_ann_uses_sharded_scorer(spark):
    # The graded end-to-end query must not collect the embedded corpus
    # to the driver: its plan goes through the cogrouped grid scorer
    # (FlatMapCoGroupsInPandas), not a broadcast of a toPandas index.
    import __spark_entry__ as entry

    df = entry.queries()["pipe_text_ann"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    rows = df.limit(5).collect()
    assert {c for c in df.columns} == {"src", "rank", "dst", "distance"}
    assert len(rows) > 0


def test_components_fixpoint_raises_past_cap(spark):
    from scarf_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    path = spark.range(20).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(path, max_rounds=3)
    # star contraction closes the same path in O(log n) rounds and
    # reports how many via rounds_out
    rounds: list[int] = []
    out = connected_components_star(path, rounds_out=rounds)
    assert out.select("component").distinct().count() == 1
    assert rounds[0] <= 7


def test_tile_signature_and_mm_prep(spark):
    from scarf_spark.operators import multimodal as mm

    # two byte-identical images (near-dup by construction), one very
    # different; 64-char rows at width 8 -> every doc has >= 16 tiles
    base = "".join(chr(65 + (i * 7) % 26) for i in range(256))
    flat = "m" * 256
    docs = spark.createDataFrame(
        [(0, base), (3, base), (6, flat)], "doc_id long, text string"
    )
    tiles = mm.image_tile_pool(mm.attach_png_payload(docs, width=8), tile=4)
    sig = {r["doc_id"]: r for r in mm.tile_signature(tiles).collect()}
    assert sig[0]["phash"] == sig[3]["phash"]  # identical pixels
    assert sig[0]["n_tiles"] == 16  # (256/8 rows // 4) * (8/4 cols) = 8*2
    out = mm.mm_pretrain_prep(
        docs, width=8, tile=4, max_hamming=3, budget=64
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # the larger id of the identical pair is dropped; both others kept
    assert set(rows) == {0, 6}
    assert all(r["start_off"] % 1 == 0 and r["seq_id"] >= 0 for r in rows.values())


def test_mm_prep_empty_and_short_docs(spark):
    from scarf_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "short"), (3, "")], "doc_id long, text string"
    )  # both image-modality (doc_id % 3 == 0) but no complete tile
    assert mm.mm_pretrain_prep(docs, width=8, tile=4).count() == 0


def test_grouped_weighted_median_matches_bruteforce(spark):
    # grid plan vs the definition: smallest v with 2*cumw(<=v) >= W
    import random

    rnd = random.Random(7)
    rows = [
        (g, float(rnd.randint(0, 40)), rnd.randint(1, 5))
        for g in range(3)
        for _ in range(rnd.randint(1, 60))
    ]
    df = spark.createDataFrame(rows, "g int, v double, wt int")
    got = {
        r["g"]: (r["w_total"], r["wmedian"])
        for r in windows.grouped_weighted_median(df, ["g"], "v", "wt", grid=8).collect()
    }
    want = {}
    for g in {r[0] for r in rows}:
        items = sorted((v, wt) for gg, v, wt in rows if gg == g)
        W = sum(wt for _, wt in items)
        cum = 0
        for v, wt in items:
            cum += wt
            if 2 * cum >= W:
                want[g] = (W, v)
                break
    assert got == want


def test_grouped_weighted_median_skips_nulls(spark):
    df = spark.createDataFrame(
        [(0, None, 100), (0, 1.0, 1), (0, 2.0, 1), (0, 3.0, 1)],
        "g int, v double, wt int",
    )
    [r] = windows.grouped_weighted_median(df, ["g"], "v", "wt").collect()
    assert (r["w_total"], r["wmedian"]) == (3, 2.0)


def test_churn_analysis_toy(spark):
    # u1 active weeks 0,1; u2 active week 0 only; u3 joins week 1
    rows = [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-08 00:00:00"),
        (2, "2024-01-02 00:00:00"),
        (3, "2024-01-09 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["period"]: r for r in windows.churn_analysis(ev).collect()}
    p0, p1 = sorted(out)
    assert out[p0]["n_active"] == 2 and out[p0]["n_new"] == 2
    assert out[p1]["n_active"] == 2
    assert out[p1]["n_retained"] == 1  # u1
    assert out[p1]["n_new"] == 1  # u3
    assert out[p1]["n_churned"] == 1  # u2


def test_neighbor_jaccard_toy(spark):
    from scarf_spark.operators.graph import neighbor_jaccard

    # path 1-2-3: the only non-adjacent wedge pair is (1,3), sharing
    # {2}; deg(1)=deg(3)=1 -> jaccard = 1/(1+1-1) = 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    [r] = neighbor_jaccard(edges).collect()
    assert (r["u"], r["w"], r["n_common"], r["jaccard_ppm"]) == (1, 3, 1, 1000000)


def test_kcenter_sample_toy(spark):
    from scarf_spark.operators.filters import kcenter_sample

    # four unit vectors: e1, e1 (dup), e2, mid(e1,e2). Seed = min id
    # (0, e1); farthest is e2 (id 2); then the midpoint; the duplicate
    # of e1 (dist 0) is picked last.
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]),
        (3, [1.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = [r["vec_id"] for r in kcenter_sample(emb, k=4).orderBy("pick_order").collect()]
    assert out == [0, 2, 3, 1]


def test_pareto_shares_sum(spark, sf_dir):
    from scarf_spark.catalog import DataStore

    ev = DataStore(spark, sf_dir).table("events")
    rows = windows.pareto_activity(ev).collect()
    assert len(rows) == 10
    total_share = sum(r["events_share_ppm"] for r in rows)
    assert 999990 <= total_share <= 1000000  # integer-floor ppm rounding


def test_wow_growth_toy(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "click"), (2, "2024-01-02 00:00:00", "click"),
         (3, "2024-01-08 00:00:00", "click"),
         (4, "2024-01-15 00:00:00", "click"), (5, "2024-01-16 00:00:00", "click"),
         (6, "2024-01-17 00:00:00", "click")],
        "event_id long, ts string, event_type string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = sorted(
        (r["period"], r["n_events"], r["prev_events"], r["wow_growth_ppm"])
        for r in windows.wow_growth(ev).collect()
    )
    assert out[0][1:] == (2, None, None)
    assert out[1][1:] == (1, 2, -500000)  # 2 -> 1: -50%
    assert out[2][1:] == (3, 1, 2000000)  # 1 -> 3: +200%


def test_cross_source_containment_toy(spark):
    from scarf_spark.operators.dedup import cross_source_containment

    docs = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b c x", "s2"), (3, "p q r s", "s2")],
        "doc_id long, text string, source string",
    )
    out = {(r["src_a"], r["src_b"]): r for r in cross_source_containment(docs).collect()}
    # s1 shingles: {abc, bcd}; s2: {abc, bcx, pqr, qrs}; shared = {abc}
    assert out[("s1", "s2")]["n_shared"] == 1
    assert out[("s1", "s2")]["containment_ppm"] == 500000   # 1 of 2
    assert out[("s2", "s1")]["containment_ppm"] == 250000   # 1 of 4


def test_knn_ndcg_toy(spark):
    from scarf_spark.ml.metrics import knn_ndcg

    edges = spark.createDataFrame(
        [(1, 1, 2, 0.1), (1, 2, 3, 0.2), (1, 3, 4, 0.3)],
        "src long, rank long, dst long, distance double",
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 0), (4, 0)], "vec_id long, label int"
    )
    [r] = knn_ndcg(edges, labels, k=3).collect()
    # rel = [0, 1, 1]: dcg = 1/log2(3) + 1/log2(4); idcg(2) = 1 + 1/log2(3)
    import math
    dcg = 1 / math.log2(3) + 0.5
    idcg = 1 + 1 / math.log2(3)
    assert r["n_rel"] == 2 and abs(r["ndcg"] - round(dcg / idcg, 6)) < 1e-9


def test_lsh_recall_bounds(spark, sf_dir):
    from scarf_spark.catalog import DataStore
    from scarf_spark.operators.dedup import lsh_recall

    docs = DataStore(spark, sf_dir).table("documents")
    [r] = lsh_recall(docs).collect()
    assert r["n_true"] >= 0 and 0 <= r["n_hit"] <= r["n_true"]
    if r["n_true"]:
        assert 0.0 <= r["recall"] <= 1.0


def test_hampel_flags_spike(spark):
    rows = [(i, "t", f"2024-01-01 00:{i:02d}:00", 10.0 if i != 5 else 500.0)
            for i in range(10)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    )
    out = {r["event_id"]: r for r in windows.hampel_filter(ev).collect()}
    assert out[5]["is_outlier"] is True
    assert sum(1 for r in out.values() if r["is_outlier"]) == 1
    # the spike does NOT drag the median: neighbours stay inliers
    assert out[6]["med"] == 10_000_000


def test_theilsen_ignores_spike_day(spark):
    # days 0..9 with n = 2/day except one spike day; slope median = 0
    rows = []
    eid = 0
    for d in range(10):
        n = 20 if d == 4 else 2
        for _ in range(n):
            rows.append((eid, "t", f"2024-01-{d + 1:02d} 00:00:00"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts string")
    [r] = windows.theilsen_trend(ev).collect()
    assert r["n_days"] == 10 and r["n_pairs"] == 45
    assert r["slope_ppm_per_day"] == 0  # robust to the one spike day


def test_log2_histogram_buckets(spark):
    from scarf_spark.operators.aggregate import log2_histogram

    ev = spark.createDataFrame(
        [(1, "a", 1e-6), (2, "a", 3e-6), (3, "a", 1000.0), (4, "a", 0.0)],
        "event_id long, event_type string, value double",
    )
    out = {r["bucket"]: r for r in log2_histogram(ev, "event_type", "value").collect()}
    assert out[1]["n"] == 1          # 1 micro -> '1'
    assert out[2]["n"] == 1          # 3 micros -> '11'
    assert out[30]["min_micros"] == 1_000_000_000  # 1e9 micros = 30 bits
    assert 0 not in out              # zero filtered (no bin for 0)


def test_shingle_novelty_toy(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "p q r s")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.shingle_novelty(docs, n=3).collect()}
    # doc1: {abc(df2), bcd(df1)} -> 50% novel; doc3 fully novel
    assert out[1]["novelty_ppm"] == 500000
    assert out[2]["novelty_ppm"] == 500000
    assert out[3]["novelty_ppm"] == 1000000


def test_jsd_drift_bounds(spark):
    same = spark.createDataFrame(
        [(1, "s1", "a b c"), (2, "s2", "a b c")],
        "doc_id long, source string, text string",
    )
    [r] = text.jsd_drift(same, split_value="s1").collect()
    assert r["jsd"] == 0.0  # identical distributions
    disjoint = spark.createDataFrame(
        [(1, "s1", "a a"), (2, "s2", "b b")],
        "doc_id long, source string, text string",
    )
    [r2] = text.jsd_drift(disjoint, split_value="s1").collect()
    import math
    assert abs(r2["jsd"] - math.log(2)) < 1e-6  # max JSD (nats)


def test_session_concurrency_toy(spark):
    # two users overlapping within one day; one session spanning
    # midnight contributes to both days
    rows = [
        (1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 10:10:00"),
        (3, 20, "2024-01-01 10:05:00"),
        (4, 30, "2024-01-01 23:50:00"), (5, 30, "2024-01-02 00:10:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["day"]: r for r in windows.session_concurrency(ev).collect()}
    d1, d2 = sorted(out)
    # 10:05-10:10 users 10+20 overlap (=2); 23:50 user 30 is alone, so
    # day-1 peak is 2
    assert out[d1]["max_concurrent"] == 2
    assert out[d2]["max_concurrent"] == 1  # the carried-over session
    assert out[d2]["n_session_starts"] == 1  # the midnight carry +1


def test_normalized_dedup_collapses_case_punct(spark):
    from scarf_spark.operators.dedup import normalized_exact_dedup

    docs = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "HELLO-WORLD"),
         (4, "different text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_dups"] for r in normalized_exact_dedup(docs).collect()}
    assert out == {1: 3, 4: 1}  # 1/2/3 collapse to the smallest id


def test_hll_merge_equals_direct(spark, sf_dir):
    from scarf_spark.catalog import DataStore
    from scarf_spark.operators.aggregate import hll_union

    ev = DataStore(spark, sf_dir).table("events")
    [r] = hll_union(ev, "event_type", "user_id").collect()
    assert r["merge_exact"] is True
    assert r["est_merged"] == r["est_direct"]
    # sketch error within the usual 1.04/sqrt(64) ~ 13% HLL envelope
    assert abs(r["est_merged"] - r["exact_ndv"]) / r["exact_ndv"] < 0.35


def test_max_drawdown_toy(spark):
    rows = [(1, 1, "2024-01-01 00:00:00", 10.0),
            (2, 1, "2024-01-01 00:01:00", -4.0),
            (3, 1, "2024-01-01 00:02:00", 1.0),
            (4, 1, "2024-01-01 00:03:00", -7.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    )
    [r] = windows.max_drawdown(ev).collect()
    # cum: 10, 6, 7, 0; peak runs 10; max drawdown = 10 - 0 = 10
    assert r["peak_micros"] == 10_000_000
    assert r["final_micros"] == 0
    assert r["max_drawdown_micros"] == 10_000_000


def test_welch_t_toy(spark):
    import math
    rows = ([(i, "purchase", 10.0 + (i % 3)) for i in range(30)]
            + [(100 + i, "click", 5.0 + (i % 5)) for i in range(40)])
    ev = spark.createDataFrame(
        [(eid, t, f"2024-01-01 00:00:{eid % 60:02d}", v) for eid, t, v in rows],
        "event_id long, event_type string, ts string, value double",
    )
    [r] = windows.welch_t_test(ev).collect()
    assert r["n_a"] == 30 and r["n_b"] == 40
    # brute force in micros
    a = [int((10.0 + (i % 3)) * 1e6) for i in range(30)]
    b = [int((5.0 + (i % 5)) * 1e6) for i in range(40)]
    ma, mb = sum(a) / 30, sum(b) / 40
    va = sum((x - ma) ** 2 for x in a) / 29
    vb = sum((x - mb) ** 2 for x in b) / 39
    t = (ma - mb) / math.sqrt(va / 30 + vb / 40)
    assert abs(r["t_stat"] - round(t, 6)) < 1e-4
    assert r["mean_diff_micros"] > 0


def test_bollinger_flags_spike(spark):
    rows = [(i, "t", f"2024-01-01 00:{i:02d}:00", 10.0 if i != 30 else 900.0)
            for i in range(40)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    )
    out = {r["event_id"]: r["is_outlier"]
           for r in windows.bollinger_outliers(ev, width=20, k=2).collect()}
    assert out[30] is True
    assert not any(v for k, v in out.items() if k < 30)  # flat prefix clean
