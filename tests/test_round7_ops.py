"""Round-7 training-data-pipeline additions: Gopher repetition stats,
deterministic sequence packing, SemDeDup."""

from pyspark.sql import functions as F

from scarf_spark.operators import dedup, filters, text


def test_repetition_stats_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),
            (2, "x y z w"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert r1["uniq_word_ratio"] == 0.25
    assert r1["top_bigram_frac"] == 1.0  # "a a" is all 3 bigrams
    assert r1["dup_trigram_frac"] == 0.5  # 1 distinct of 2 trigrams
    r2 = out[2]
    assert r2["uniq_word_ratio"] == 1.0
    assert r2["top_bigram_frac"] == 0.333333  # 3 distinct bigrams
    assert r2["dup_trigram_frac"] == 0.0
    r3 = out[3]  # empty text: all guards, no division error under ANSI
    assert r3["n_words"] == 0 and r3["uniq_word_ratio"] == 0.0


def test_repetition_stats_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = text.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: fuses into the scan


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(100)],
        "doc_id long, text string",
    )
    out = filters.pack_sequences(docs, budget=16, n_buckets=4).collect()
    assert len(out) == 100  # every doc assigned exactly once
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["start_off"])
        off = 0
        for r in rows:
            assert r["start_off"] == off  # contiguous token stream
            assert r["seq_id"] == r["start_off"] // 16
            off += r["n_tokens"]


def test_semdedup_drops_larger_id_near_copy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(6, 8)
    rows = [(i, [float(x) for x in base[i]]) for i in range(6)]
    # 100 duplicates 0, 101 duplicates 3 (tiny perturbation)
    rows += [
        (100, [float(x) for x in base[0] + 1e-4 * rng.randn(8)]),
        (101, [float(x) for x in base[3] + 1e-4 * rng.randn(8)]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["keep"] for r in dedup.semdedup(emb, k=2, eps=0.01).collect()}
    assert len(out) == 8
    assert out[100] is False and out[101] is False  # near-copies dropped
    assert all(out[i] for i in range(6))  # originals kept


def test_semdedup_shard_grid_matches_unsharded(spark):
    """The mega-cluster skew guard (shard_cap) must be output-invariant:
    a deliberately skewed fixture (most points in one cluster) sharded
    at cap=4 produces bit-identical keep flags to the single-task
    path, because every within-cluster pair meets exactly once in the
    shard-pair grid."""
    import numpy as np

    rng = np.random.RandomState(7)
    # 30 points around one center (the skewed mega-cluster), 6 around
    # another; several near-duplicate planted pairs inside the big one
    big = rng.randn(1, 16) + 0.02 * rng.randn(30, 16)
    small = 10.0 + rng.randn(1, 16) + 0.02 * rng.randn(6, 16)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([big, small]))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in dedup.semdedup(emb, k=2, eps=0.05, shard_cap=10_000).collect()
    }
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in dedup.semdedup(emb, k=2, eps=0.05, shard_cap=4).collect()
    }
    assert out == ref
    assert sum(1 for _, keep in out.values() if not keep) > 0  # dups found


def test_cms_never_underestimates_and_bounded_state(spark):
    from scarf_spark.operators import aggregate

    rows = [(w,) for w in ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(200)]]
    df = spark.createDataFrame(rows, "term string")
    out = aggregate.cms_heavy_hitters(df, "term", d=4, w=64, n_top=10).collect()
    assert len(out) == 10
    top = {r["key"]: r for r in out}
    assert top["a"]["exact_cnt"] == 50 and top["b"]["exact_cnt"] == 30
    for r in out:  # CMS property: min-over-rows never underestimates
        assert r["est_cnt"] >= r["exact_cnt"]
        assert r["overestimate"] == r["est_cnt"] - r["exact_cnt"]


def test_hashing_tf_counts_and_width(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    out = text.hashing_tf(docs, n_features=16).collect()
    assert sum(r["tf"] for r in out if r["doc_id"] == 1) == 3
    assert all(0 <= r["feature"] < 16 for r in out)
    # same term -> same bucket across docs (hash is stateless)
    b = {(r["doc_id"], r["feature"]): r["tf"] for r in out}
    shared = [f for (d, f) in b if d == 1] and [f for (d, f) in b if d == 2]
    assert shared  # doc 2's 'b' bucket appears in doc 1's buckets too


def test_naive_bayes_separates_obvious_classes(spark):
    from scarf_spark.ml import supervised

    rows = [(i, "spam spam offer money", "spam") for i in range(5)]
    rows += [(10 + i, "meeting notes agenda plan", "work") for i in range(5)]
    rows += [(100, "spam offer", "spam"), (101, "agenda plan notes", "work")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from pyspark.sql import Window

    out = supervised.naive_bayes_scores(docs)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cls")
    best = {
        r["doc_id"]: r["cls"]
        for r in out.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .collect()
    }
    assert best[100] == "spam" and best[101] == "work"


def test_sparse_logreg_learns_signed_weights(spark):
    from scarf_spark.ml import supervised

    rows = [(i, "good", 1.0) for i in range(10)] + [
        (100 + i, "bad", 0.0) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y double")
    feats = text.hashing_tf(docs, n_features=16)
    out = supervised.logreg_gd_sparse(
        feats, docs.select("doc_id", "y"), n_iter=3, lr=0.5
    )
    w = {r["d"]: r["w"] for r in out.collect()}
    good_b = [r["feature"] for r in feats.where("doc_id = 0").collect()][0]
    bad_b = [r["feature"] for r in feats.where("doc_id = 100").collect()][0]
    assert w[good_b] > 0 > w[bad_b]


def test_auc_known_values(spark):
    from scarf_spark.ml import metrics as mlmetrics

    # perfect separation -> 1.0
    rows = [(float(i), 1) for i in range(10, 15)] + [(float(i), 0) for i in range(5)]
    df = spark.createDataFrame(rows, "score double, y int")
    r = mlmetrics.auc(df, "score", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (5, 5, 1.0)
    # all-tied scores -> 0.5 exactly (tie credit is dyadic)
    df2 = spark.createDataFrame(
        [(1.0, 1)] * 4 + [(1.0, 0)] * 6, "score double, y int"
    )
    assert mlmetrics.auc(df2, "score", "y").collect()[0]["auc"] == 0.5


def test_psi_zero_for_identical_samples(spark):
    from scarf_spark.operators import qc

    df = spark.createDataFrame([(float(i % 20),) for i in range(200)], "v double")
    out = qc.psi_drift(df, df, "v", n_bins=10).collect()
    assert len(out) == 10
    assert all(r["psi_term"] == 0.0 for r in out)  # p == q bin-for-bin
    assert sum(r["n_a"] for r in out) == 200


def test_zorder_interleaves_bits(spark):
    from scarf_spark.operators import windows

    # corners of a 2x2 grid: z-order must sort as (0,0),(0,1),(1,0),(1,1)
    # when a is the high bit — and equal-valued dims give qa == qb
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 0.0), (4, 1.0, 1.0)],
        "id long, a double, b double",
    )
    out = {r["id"]: r for r in windows.zorder_key(df, "a", "b").collect()}
    assert out[1]["zval"] < out[2]["zval"] < out[3]["zval"] < out[4]["zval"]
    # bit-spread correctness: quantized max (65535) spreads to
    # 0x55555555, so z of (max, max) is 0xFFFFFFFF
    assert out[4]["zval"] == 0xFFFFFFFF


def test_mixture_sample_budgets_and_nesting(spark):
    rows = [(i, "a" if i < 50 else "b") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    big = filters.mixture_sample(df, "src", {"a": 20, "b": 100}, "doc_id")
    got = {r["src"]: 0 for r in big.collect()}
    counts = {}
    for r in big.collect():
        counts[r["src"]] = counts.get(r["src"], 0) + 1
    assert counts == {"a": 20, "b": 30}  # b capped by availability
    # nested draws: the 10-budget selection is a subset of the 20-budget one
    small = filters.mixture_sample(df, "src", {"a": 10, "b": 100}, "doc_id")
    a_big = {r["doc_id"] for r in big.collect() if r["src"] == "a"}
    a_small = {r["doc_id"] for r in small.collect() if r["src"] == "a"}
    assert a_small < a_big


def test_zipf_slope_recovers_power_law(spark):
    # synthetic corpus with freq(term_r) ~ 1000/r: slope should be ~ -1
    words = []
    for r in range(1, 30):
        words += [f"t{r:03d}"] * (1000 // r)
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = text.zipf_fit(docs, n_top=29).collect()[0]
    assert out["n_top"] == 29
    assert -1.05 < out["slope"] < -0.95


def test_table_digest_order_invariant_and_sensitive(spark):
    from scarf_spark.operators import qc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 0.25)],
        "id long, s string, v double",
    )
    d1 = qc.table_digest(df).collect()[0]
    # row order / partitioning invariance
    d2 = qc.table_digest(df.orderBy(F.desc("id")).repartition(7)).collect()[0]
    assert (d1["n_rows"], d1["digest"]) == (d2["n_rows"], d2["digest"])
    # content sensitivity: one changed value flips the digest
    df3 = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 0.26)],
        "id long, s string, v double",
    )
    assert qc.table_digest(df3).collect()[0]["digest"] != d1["digest"]
    # NULL is distinct from the empty string
    df4 = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "", 0.25)],
        "id long, s string, v double",
    )
    assert qc.table_digest(df4).collect()[0]["digest"] != d1["digest"]
