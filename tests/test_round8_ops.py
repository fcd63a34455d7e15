"""Round-8 operator tests: CCNet-style segment dedup, n-gram
benchmark decontamination, DSIR importance weights, and the
star-contraction components' high-diameter behavior (the parity test
lives in test_round6_ops)."""

from pyspark.sql import functions as F

from scarf_spark.operators import dedup, filters, text


def test_segment_dedup_drops_cross_doc_segments(spark):
    boiler = "a b c d e f g h"  # exactly one 8-word segment
    rows = [
        (1, boiler + " " + "u1 u2 u3 u4 u5 u6 u7 u8"),
        (2, boiler + " " + "v1 v2 v3 v4 v5 v6 v7 v8"),
        (3, "w1 w2 w3 w4 w5 w6 w7 w8"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.segment_dedup(docs).collect()}
    # the shared boilerplate segment is dropped from BOTH docs
    assert out[1]["n_segments"] == 2 and out[1]["n_dropped"] == 1
    assert out[2]["n_segments"] == 2 and out[2]["n_dropped"] == 1
    assert out[1]["kept_ppm"] == 500000
    # the unique doc keeps everything
    assert out[3]["n_dropped"] == 0 and out[3]["kept_ppm"] == 1000000


def test_segment_dedup_tail_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "x1 x2 x3"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.segment_dedup(docs).collect()}
    assert out[1]["n_segments"] == 1  # 3-word tail is one short segment
    assert 2 not in out  # empty doc yields no segments


def test_ngram_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "saw the quick brown fox run off"),  # shares 4-grams
            (2, "completely different words here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.ngram_decontaminate(corpus, bench, n=4).collect()
    }
    # "the quick brown fox" and "quick brown fox jumps"? only the first
    # is inside corpus doc 1 ("quick brown fox run" differs)
    assert out[1]["contaminated"] is True and out[1]["n_hits"] == 1
    assert out[2]["contaminated"] is False and out[2]["n_hits"] == 0


def test_dsir_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta " * 5) for i in range(3)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta alpha beta"),  # target-like
            (2, "zeta eta theta iota kappa mu"),  # corpus-only vocab
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["mean_logratio"]
        for r in filters.dsir_log_weights(corpus, target, n_buckets=64).collect()
    }
    assert out[1] > out[2]  # target-like doc gets the higher weight


def test_bigram_logprob_repetition_scores_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),  # one repeated bigram pattern
            (2, "a c b d c a d b"),  # same unigrams, scattered bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.bigram_logprob(docs).collect()}
    assert out[1]["n_bigrams"] == 7 and out[2]["n_bigrams"] == 7
    assert out[1]["mean_logprob"] > out[2]["mean_logprob"]


def test_bigram_logprob_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "")], "doc_id long, text string"
    )
    assert text.bigram_logprob(docs).count() == 0  # no bigrams, no rows


def test_read_jsonl_roundtrip_and_malformed(spark, tmp_path):
    from scarf_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        "this line is not json\n"
        '{"doc_id": 2, "text": "second"}\n'
    )
    out = read_jsonl(spark, str(p), "doc_id long, text string").collect()
    rows = {r["doc_id"]: r["text"] for r in out if r["doc_id"] is not None}
    assert rows == {1: "hello world", 2: "second"}
    # PERMISSIVE mode: the malformed line becomes a null row, not a crash
    assert len(out) == 3


def test_assortativity_sign_and_bounds(spark):
    from scarf_spark.operators.graph import degree_assortativity

    # star graph: hub links to leaves only -> strongly disassortative
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 16  # undirected both directions
    assert r["assortativity"] == -1.0
    # clique: all degrees equal -> zero variance -> defined as 0
    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src long, dst long",
    )
    assert degree_assortativity(clique).collect()[0]["assortativity"] == 0.0


def test_video_keyframes_detects_planted_cut(spark):
    from scarf_spark.operators import multimodal as mm

    # one video doc (doc_id % 3 == 2): 2 calm frames, then a loud one
    calm, loud = "a" * 64, "z" * 64
    docs = spark.createDataFrame(
        [(2, calm + calm + loud)], "doc_id long, text string"
    )
    media = mm.attach_payload(docs)
    out = {
        r["frame_idx"]: r
        for r in mm.video_keyframes(media, min_delta=150).collect()
    }
    assert out[0]["is_key"] is True  # first frame always keyframe
    assert out[1]["is_key"] is False  # same energy as frame 0
    assert out[2]["is_key"] is True  # planted scene cut
    assert out[2]["energy"] - out[1]["energy"] == 64 * (ord("z") - ord("a"))


def test_embedding_drift_identical_and_shifted(spark):
    from scarf_spark.operators.qc import embedding_drift

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    same = embedding_drift(emb, emb).collect()[0]
    assert same["mean_l2"] == 0.0 and same["mean_cosine"] == 1.0
    shifted = spark.createDataFrame(
        [(i, [2.0, 3.0, 4.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    moved = embedding_drift(emb, shifted).collect()[0]
    assert abs(moved["mean_l2"] - 3.0 ** 0.5) < 1e-6
    assert moved["mean_cosine"] < 1.0


def test_audio_segments_islands(spark):
    from scarf_spark.operators import multimodal as mm

    # one audio doc (doc_id % 3 == 1): quiet-loud-loud-quiet-loud
    frame = lambda ch: ch * 10
    text = frame("a") + frame("z") + frame("z") + frame("a") + frame("z")
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    media = mm.attach_payload(docs)
    # threshold between 10*'a'=970 and 10*'z'=1220
    segs = mm.audio_active_segments(
        media, frame_bytes=10, min_energy=1000
    ).collect()
    got = [(r["seg_id"], r["start_frame"], r["end_frame"], r["n_frames"]) for r in segs]
    assert sorted(got) == [(1, 1, 2, 2), (2, 4, 4, 1)]


def test_mahalanobis_flags_planted_outlier(spark):
    import numpy as np

    from scarf_spark.ml import reduction

    rng = np.random.RandomState(9)
    pts = rng.randn(40, 4)
    pts[0] = [12.0, -12.0, 12.0, -12.0]  # planted far outlier
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    vec = spark.createDataFrame(rows, "cell_id long, v array<double>")
    out = {r["cell_id"]: r["m2"] for r in reduction.mahalanobis_scores(vec).collect()}
    assert out[0] == max(out.values())  # outlier has the top score
    assert all(v >= 0 for v in out.values())


def test_kaplan_meier_planted_curve(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import kaplan_meier

    t0 = datetime(2024, 1, 1)

    def ts(minutes):
        return datetime(2024, 1, 1, minutes // 60, minutes % 60)

    rows = []
    # 4 users sign up at t0; purchases at 10, 20, 20 min; user 4 never
    for u in range(1, 5):
        rows.append((u * 10, t0, u, "signup", 0.0, ""))
    rows += [
        (101, ts(10), 1, "purchase", 1.0, ""),
        (102, ts(20), 2, "purchase", 1.0, ""),
        (103, ts(20), 3, "purchase", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["t_min"]: r for r in kaplan_meier(ev, horizon_minutes=100).collect()}
    # t=10: 4 at risk, 1 event -> S = 0.75
    assert out[10]["n_at_risk"] == 4 and out[10]["survival"] == 0.75
    # t=20: 3 at risk, 2 events -> S = 0.75 * (1/3) = 0.25
    assert out[20]["n_at_risk"] == 3 and out[20]["n_events"] == 2
    assert out[20]["survival"] == 0.25
    assert 100 not in out  # censored-only time emits no event row


def test_gmm_soft_responsibilities(spark):
    import numpy as np

    from scarf_spark.ml import cluster

    rng = np.random.RandomState(11)
    # two well-separated blobs
    a = rng.randn(20, 4) * 0.1
    b = rng.randn(20, 4) * 0.1 + 5.0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([a, b]))]
    vec = spark.createDataFrame(rows, "cell_id long, v array<double>")
    out = cluster.gmm_diag(vec, k=2, n_iter=3).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["cell_id"], {})[r["cluster"]] = r["resp"]
    # responsibilities sum to 1 per point
    for resp in by_id.values():
        assert abs(sum(resp.values()) - 1.0) < 1e-5
    # each point in a well-separated blob is confidently assigned
    hard = {i: max(r, key=r.get) for i, r in by_id.items()}
    blob_a = {hard[i] for i in range(20)}
    blob_b = {hard[i] for i in range(20, 40)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    assert all(max(r.values()) > 0.99 for r in by_id.values())


def test_zca_whitening_decorrelates(spark):
    import numpy as np

    from scarf_spark.ml import reduction

    rng = np.random.RandomState(13)
    base = rng.randn(200, 3)
    # introduce strong correlation
    mixed = base @ np.array([[1.0, 0.8, 0.0], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
    mixed -= mixed.mean(axis=0)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mixed)]
    vec = spark.createDataFrame(rows, "cell_id long, v array<double>")
    out = reduction.zca_whiten(vec).collect()
    m = np.zeros((200, 3))
    for r in out:
        m[r["cell_id"], r["slot"] - 1] = r["white"]
    cov = (m.T @ m) / (len(m) - 1)
    assert np.allclose(cov, np.eye(3), atol=1e-4)  # unit covariance


def test_chi2_independence_semantics(spark):
    from scarf_spark.operators.markers import marker_chi2

    # feature 1 expressed only in group A; feature 2 uniform
    counts = spark.createDataFrame(
        [(c, 1, 1.0) for c in range(5)]  # feat 1 in cells 0-4 (group A)
        + [(c, 2, 1.0) for c in range(10)],  # feat 2 everywhere
        "cell_id long, feat_id long, value double",
    )
    groups = spark.createDataFrame(
        [(c, "A" if c < 5 else "B") for c in range(10)],
        "cell_id long, grp string",
    )
    out = {r["feat_id"]: r for r in marker_chi2(counts, groups).collect()}
    assert out[1]["dof"] == 1 and out[2]["dof"] == 1
    # perfectly dependent: chi2 = n = 10; perfectly independent: 0
    assert out[1]["chi2"] == 10.0
    assert out[2]["chi2"] == 0.0


def test_grouped_ntile_matches_window_ntile(spark):
    from pyspark.sql import Window
    from scarf_spark.operators.windows import grouped_ntile

    # deterministic pseudo-random values, one group smaller than n_bins
    rows = [
        (g, i, float((i * 37 + g * 11) % 23)) for g in range(3) for i in range(17)
    ]
    rows += [(9, 0, 5.0), (9, 1, 5.0)]  # 2-row group, ties on the key
    df = spark.createDataFrame(rows, "grp int, rid int, val double")
    got = grouped_ntile(df, ["grp"], ["val", "rid"], 5, out="bin")
    ref = df.withColumn(
        "ref", F.ntile(5).over(Window.partitionBy("grp").orderBy("val", "rid"))
    )
    joined = got.join(ref, ["grp", "rid", "val"]).collect()
    assert len(joined) == len(rows)
    assert all(r["bin"] == r["ref"] for r in joined)


def test_adamic_adar_path_graph(spark):
    import math

    from scarf_spark.operators.graph import adamic_adar

    # path 1-2-3: the only non-adjacent wedge pair is (1, 3) via 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    out = adamic_adar(edges).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["w"], r["n_common"]) == (1, 3, 1)
    assert r["aa_score"] == round(1.0 / math.log(2.0), 6)


def test_rfm_segments_semantics(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import rfm_segments

    rows = [
        (1, datetime(2026, 1, 1), 10.0),
        (1, datetime(2026, 1, 5), 10.0),  # user 1: recent, 2 events, 20
        (2, datetime(2026, 1, 1), 1.0),  # user 2: 4 days stale, 1 event
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in rfm_segments(ev, n_bins=2).collect()}
    assert out[1]["recency_days"] == 0 and out[2]["recency_days"] == 4
    assert out[1]["frequency"] == 2 and out[2]["frequency"] == 1
    assert out[1]["monetary_micros"] == 20_000_000
    # user 1 is better on every dimension: recency bin 1, f/m bin 2
    assert out[1]["rfm_code"] == 122 and out[2]["rfm_code"] == 211


def test_readability_counts(spark):
    from scarf_spark.operators.text import readability

    docs = spark.createDataFrame(
        [(1, "The cat sat. On a mat!"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability(docs).collect()}
    assert 2 not in out  # empty doc dropped
    r = out[1]
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    # vowel groups: e, a, a, o, a, a  -> 6
    assert r["n_syllables"] == 6
    expected = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert abs(r["flesch"] - expected) < 1e-9


def test_ccnet_buckets_head_beats_tail(spark):
    from scarf_spark.operators.text import ccnet_buckets

    # repeated phrasing scores high under the corpus bigram LM;
    # one-off word salad lands in the tail
    fluent = "the model trains on the data and the model learns"
    rows = [(i, fluent, "en") for i in range(4)] + [
        (10, "zq xv bn mk lp wy", "en"),
        (11, fluent, "fr"),
        (12, "qq ww ee rr tt yy", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in ccnet_buckets(docs).collect()}
    assert out[0]["bucket_name"] == "head"
    assert out[10]["bucket_name"] == "tail"
    # per-language: both fr docs present, ranked within fr only
    assert out[11]["bucket"] < out[12]["bucket"]
    by_lang = {(r["lang"], r["bucket_name"]) for r in out.values()}
    assert ("fr", "head") in by_lang


def test_image_tile_pool_means(spark):
    from scarf_spark.operators import codecs
    from scarf_spark.operators.multimodal import image_tile_pool

    import numpy as np

    # 16x16 image: left half zeros, right half 200s -> 2x2 tiles of 8x8
    px = np.zeros((16, 16), dtype=np.uint8)
    px[:, 8:] = 200
    payload = codecs.encode_png(px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "doc_id long, modality string, payload binary",
    )
    out = {(r["tile_row"], r["tile_col"]): r for r in image_tile_pool(media).collect()}
    assert set(out) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert all(r["n_px"] == 64 for r in out.values())
    assert out[(0, 0)]["mean_ppm"] == 0
    assert out[(0, 1)]["mean_ppm"] == 200_000_000
    assert out[(1, 0)]["mean_ppm"] == 0 and out[(1, 1)]["mean_ppm"] == 200_000_000


def test_ridge_recovers_linear_signal(spark):
    from scarf_spark.ml.supervised import ridge_closed_form

    import numpy as np

    # y = 2*x1 - x2 + 3 exactly, on a deterministic grid
    rows = []
    for i in range(40):
        x1 = (i % 8) - 3.5
        x2 = (i // 8) - 2.0
        y = int(round(2 * x1 - x2 + 3))
        rows.append((i, [float(x1), float(x2)], y))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = ridge_closed_form(emb, lam=1.0, quant=1000.0).collect()[0]
    assert r["n_rows"] == 40
    # small lambda + exact signal: coefficients land near the truth
    # (quantization is exact here: x*1000 are integers)
    # betas are per quantized (milli) unit: 2/1000 and -1/1000
    assert abs(r["b_x1"] * 1000 - 2.0) < 0.05
    assert abs(r["b_x2"] * 1000 + 1.0) < 0.05
    assert abs(r["b_intercept"] - 3.0) < 0.2


def test_last_touch_attribution_semantics(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import last_touch_attribution

    t = lambda m: datetime(2026, 1, 1, 0, m)
    rows = [
        # user 1: click(k=7) -> purchase -> click(k=23) -> purchase
        (1, t(0), 1, "click", 0.0, '{"k": 7}'),
        (1, t(1), 2, "purchase", 10.5, "{}"),
        (1, t(2), 3, "click", 0.0, '{"k": 23}'),
        (1, t(3), 4, "purchase", 4.0, "{}"),
        # user 2: purchase with no prior click
        (2, t(0), 5, "purchase", 1.25, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double, props string",
    )
    out = {r["channel"]: r for r in last_touch_attribution(ev).collect()}
    assert out[7]["n_purchases"] == 1 and out[7]["revenue_micros"] == 10_500_000
    assert out[3]["n_purchases"] == 1 and out[3]["revenue_micros"] == 4_000_000
    assert out[-1]["n_purchases"] == 1 and out[-1]["revenue_micros"] == 1_250_000


def test_knn_label_purity(spark):
    from scarf_spark.ml.metrics import knn_label_purity

    edges = spark.createDataFrame(
        [(1, 0, 2), (1, 0, 3), (2, 0, 1), (2, 0, 3)],
        "src long, rank int, dst long",
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id long, label int"
    )
    out = {r["src"]: r for r in knn_label_purity(edges, labels).collect()}
    assert out[1]["n_same"] == 1 and out[1]["purity_ppm"] == 500_000
    assert out[2]["n_same"] == 1 and out[2]["purity_ppm"] == 500_000


def test_curriculum_order_phases_and_positions(spark):
    from scarf_spark.operators.filters import curriculum_order

    docs = spark.createDataFrame(
        [(i, "x", 10 * (i + 1)) for i in range(9)],
        "doc_id long, text string, n_chars long",
    )
    out = curriculum_order(docs, n_phases=3).collect()
    by_phase = {}
    for r in out:
        by_phase.setdefault(r["phase"], []).append(r)
    assert sorted(by_phase) == [1, 2, 3]
    # shortest-first: phase 1 holds the 3 shortest docs
    assert {r["doc_id"] for r in by_phase[1]} == {0, 1, 2}
    for ph in (1, 2, 3):
        assert sorted(r["position"] for r in by_phase[ph]) == [1, 2, 3]


def test_nb_calibration_bins_consistent(spark):
    from scarf_spark.ml.metrics import nb_binary_calibration

    docs = spark.createDataFrame(
        [
            (1, "hello world again", "en"),
            (2, "hello there world", "en"),
            (3, "bonjour le monde", "fr"),
            (4, "hola mundo otra", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    out = nb_binary_calibration(docs).collect()
    assert sum(r["n_docs"] for r in out) == 4
    assert sum(r["n_pos"] for r in out) == 2
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["mean_pred_ppm"] <= 1_000_000
        assert r["sum_pred_ppm"] // r["n_docs"] == r["mean_pred_ppm"]


def test_conformal_coverage_on_exact_signal(spark):
    from scarf_spark.ml.supervised import conformal_ridge

    # exact linear signal: residuals collapse near 0, coverage ~ 100%
    rows = []
    for i in range(300):
        x1 = float((i % 17) - 8)
        x2 = float((i % 7) - 3)
        y = int(round(3 * x1 + 2 * x2))
        rows.append((i, [x1, x2], y))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = conformal_ridge(emb, lam=1.0).collect()[0]
    assert r["n_train"] + r["n_calib"] + r["n_test"] == 300
    assert min(r["n_train"], r["n_calib"], r["n_test"]) > 0
    assert r["q_hat"] >= 0.0
    # the interval must cover nearly everything on a noiseless signal
    assert r["coverage_ppm"] >= 900_000


def test_reciprocity_counts(spark):
    from scarf_spark.operators.graph import reciprocity

    # 1<->2 mutual; 1->3 and 2->3 one-way
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3)], "src long, dst long"
    )
    r = reciprocity(edges).collect()[0]
    assert r["n_edges"] == 4 and r["n_mutual"] == 2
    assert r["reciprocity_ppm"] == 500_000


def test_table_diff_statuses(spark):
    from scarf_spark.operators.qc import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (5, None)], "k long, p string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d"), (5, None)], "k long, p string"
    )
    out = {r["status"]: r["n_keys"] for r in table_diff(old, new, "k", "p").collect()}
    # 1 removed, 4 added, 3 changed, 2 same, 5 same (null-safe equality)
    assert out == {"removed": 1, "added": 1, "changed": 1, "same": 2}


def test_active_user_bands_windows(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import active_user_bands

    d = lambda day: datetime(2026, 1, day)
    rows = [
        (1, d(1)), (2, d(1)),          # day 0: users 1,2
        (1, d(2)),                     # day 1: user 1
        (3, d(9)),                     # day 8: user 3 (outside 7d of day 1)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    base = min(r["day"] for r in active_user_bands(ev).collect())
    out = {r["day"] - base: r for r in active_user_bands(ev).collect()}
    assert out[0]["dau"] == 2 and out[0]["wau"] == 2 and out[0]["mau"] == 2
    assert out[1]["dau"] == 1 and out[1]["wau"] == 2  # day-0 users in window
    assert out[8]["dau"] == 1
    assert out[8]["wau"] == 1  # days 0-1 fell out of the 7-day window
    assert out[8]["mau"] == 3  # but stay inside the 30-day window


def test_bloom_decon_flags_shared_ngrams(spark):
    from scarf_spark.operators.dedup import bloom_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "saw the quick brown fox run"),  # shares one 4-gram
            (2, "totally unrelated words right here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(corpus, bench, n=4).collect()
    }
    assert out[1]["flagged"] is True and out[1]["n_flagged"] >= 1
    # bloom false positives are possible but vanishingly unlikely at
    # 2 benchmark shingles over 16384 slots
    assert out[2]["flagged"] is False


def test_clustering_coefficient_triangle(spark):
    from scarf_spark.operators.graph import clustering_coefficient

    # triangle 1-2-3 plus pendant 4 attached to 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long"
    )
    out = {r["v"]: r for r in clustering_coefficient(edges).collect()}
    assert out[2]["cc_ppm"] == 1_000_000  # deg 2, 1 triangle
    assert out[3]["cc_ppm"] == 1_000_000
    assert out[1]["degree"] == 3 and out[1]["cc_ppm"] == 333_333  # 2/6
    assert out[4]["degree"] == 1 and out[4]["cc_ppm"] == 0


def test_benford_uniform_counts(spark):
    from scarf_spark.operators.qc import benford_digits

    # values 1..999 quantized: first digits uniform-ish, all 9 present
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 1000)], "value double"
    )
    out = {r["digit"]: r for r in benford_digits(df).collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["n_obs"] == 111  # 1, 10-19, 100-199
    assert all(r["chi2_term"] >= 0 for r in out.values())


def test_pr_curve_monotone_recall(spark):
    from scarf_spark.ml.metrics import nb_pr_curve

    docs = spark.createDataFrame(
        [
            (1, "hello world again", "en"),
            (2, "hello there world", "en"),
            (3, "bonjour le monde", "fr"),
            (4, "hola mundo otra", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = sorted(nb_pr_curve(docs).collect(), key=lambda r: -r["threshold_bin"])
    # lowering the threshold can only grow tp and recall
    recalls = [r["recall_ppm"] for r in rows]
    assert recalls == sorted(recalls)
    last = rows[-1]
    assert last["tp"] + last["fn"] == 2  # all positives accounted for
    assert last["recall_ppm"] == 1_000_000  # threshold 0 catches all


def test_boxplot_outlier_count(spark):
    from scarf_spark.operators.aggregate import boxplot_stats

    vals = [float(v) for v in range(1, 12)] + [1000.0]  # planted outlier
    df = spark.createDataFrame([("a", v) for v in vals], "g string, value double")
    r = boxplot_stats(df, "g", "value").collect()[0]
    assert r["n"] == 12 and r["n_outliers"] == 1
    assert r["q25"] < r["q50"] < r["q75"]
    assert r["iqr"] == round(r["q75"] - r["q25"], 6)


def test_session_conversion_depth(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import session_conversion

    t = lambda m: datetime(2026, 1, 1, 0, m)
    rows = [
        # user 1 session A (2 events, converts), session B (1 event, no)
        (1, t(0), 1, "view"), (1, t(5), 2, "purchase"),
        (1, datetime(2026, 1, 1, 6, 0), 3, "view"),
        # user 2: single-event converting session
        (2, t(0), 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r["session_len"]: r for r in session_conversion(ev).collect()}
    assert out[2]["n_sessions"] == 1 and out[2]["n_converted"] == 1
    assert out[1]["n_sessions"] == 2 and out[1]["n_converted"] == 1
    assert out[1]["conv_ppm"] == 500_000


def test_rolling_median_exact(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import rolling_median

    t = lambda m: datetime(2026, 1, 1, 0, m)
    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 100.0]
    rows = [(1, t(i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {
        r["event_id"]: r["rolling_median"]
        for r in rolling_median(df, ["user_id"], ["ts", "event_id"], "value").collect()
    }
    assert out[0] == 5.0            # window [5]
    assert out[1] == 1.0            # [1,5] -> lower median
    assert out[2] == 5.0            # [1,5,9]
    assert out[4] == 5.0            # [1,3,5,7,9]
    assert out[5] == 7.0            # [1,3,7,9,100]


def test_stage_latency_cascade(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import stage_latency

    t = lambda m: datetime(2026, 1, 1, 0, m)
    rows = [
        (1, t(0), "signup"), (1, t(2), "click"), (1, t(5), "purchase"),
        (2, t(0), "signup"), (2, t(10), "click"),  # never purchases
        (3, t(0), "click"),  # no signup: excluded entirely
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["transition"]: r for r in stage_latency(ev).collect()}
    sc = out["signup->click"]
    assert sc["n_users"] == 2 and sc["p50_sec"] == (120 + 600) / 2
    cp = out["click->purchase"]
    assert cp["n_users"] == 1 and cp["p50_sec"] == 180.0


def test_bpe_encode_compresses_repeated_text(spark):
    from scarf_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(i, "banana banana banana banana") for i in range(3)],
        "doc_id long, text string",
    )
    out = bpe_encode(docs, n_merges=3).collect()
    for r in out:
        assert r["n_words"] == 4
        assert r["n_char_tokens"] == 4 * 7  # 6 chars + </w> each
        # 3 merges on one repeated word must shrink the token count
        assert r["n_bpe_tokens"] < r["n_char_tokens"]
        assert r["compression_ppm"] < 1_000_000


def test_eigencentrality_star_hub(spark):
    from scarf_spark.operators.graph import eigencentrality

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = {r["v"]: r["centrality"] for r in eigencentrality(star).collect()}
    assert out[0] == 1.0  # hub has max centrality
    assert all(out[i] < 1.0 for i in range(1, 6))
    assert len({out[i] for i in range(1, 6)}) == 1  # leaves symmetric


def test_hash_embed_similar_docs_are_close(spark):
    from scarf_spark.operators.knn import cosine_knn_exact
    from scarf_spark.operators.text import hash_embed

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat today"),  # near-dup of 1
            (3, "gradient descent optimizes neural networks"),
        ],
        "doc_id long, text string",
    )
    emb = hash_embed(docs, dim=64)
    rows = emb.collect()
    assert all(len(r["embedding"]) == 64 for r in rows)
    nn = {
        r["src"]: r["dst"]
        for r in cosine_knn_exact(emb, k=1, id_col="doc_id").collect()
    }
    assert nn[1] == 2 and nn[2] == 1  # the near-dups find each other


def test_cusum_detects_level_shift(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import cusum_final

    t = lambda m: datetime(2026, 1, 1, 0, m)
    # user 1 hovers at the reference; user 2 runs consistently high
    rows = [(1, t(i), i, 50.0) for i in range(5)] + [
        (2, t(i), 10 + i, 150.0) for i in range(5)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {r["user_id"]: r for r in cusum_final(ev).collect()}
    assert out[1]["cusum"] == 0.0 and out[1]["drifted"] is False
    assert out[2]["cusum"] == 500.0 and out[2]["drifted"] is True


def test_cohort_ltv_accumulates(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import cohort_ltv

    w0, w1 = datetime(2026, 1, 1), datetime(2026, 1, 9)
    rows = [(1, w0, 10.0), (1, w1, 5.0), (2, w0, 2.0)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["week_offset"]: r for r in cohort_ltv(ev).collect()}
    assert out[0]["n_users"] == 2 and out[0]["revenue_micros"] == 12_000_000
    assert out[1]["revenue_micros"] == 5_000_000
    assert out[1]["cum_revenue_micros"] == 17_000_000


def test_keep_best_prefers_longest(spark):
    from scarf_spark.operators import dedup

    # two near-identical docs, the longer one must survive
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base, len(base)), (2, base + " iota", len(base) + 5),
         (9, "totally different content here now", 34)],
        "doc_id long, text string, n_chars long",
    )
    sh = dedup.word_shingles(docs, 3, distinct=False)
    cand = dedup.minhash_candidate_pairs(docs, n=3, n_hashes=8, n_bands=4, shingles=sh)
    jac = dedup.ngram_jaccard(docs, pairs=cand, n=3, df_cap=100, shingles=sh.distinct())
    from pyspark.sql import functions as F

    edges = jac.where(F.col("jaccard") >= 0.5).select("a", "b")
    comp = dedup.min_label_components(edges, docs, n_iter=3)
    clusters = {r["doc_id"]: r["cluster"] for r in comp.collect()}
    assert clusters[1] == clusters[2] != clusters[9]


def test_seasonality_integer_time_fields(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import seasonality_profile

    # 1970-01-01 was a Thursday; 2026-01-05 is a Monday
    ev = spark.createDataFrame(
        [(1, datetime(2026, 1, 5, 13, 30), 2.5)],
        "user_id long, ts timestamp, value double",
    )
    r = seasonality_profile(ev).collect()[0]
    assert r["dow"] == 0 and r["hour"] == 13
    assert r["n_events"] == 1 and r["revenue_micros"] == 2_500_000


def test_drift_terms_finds_planted_word(spark):
    from scarf_spark.operators.text import drift_terms

    docs = spark.createDataFrame(
        [(i, "common words here plus zzsignal", "src0") for i in range(5)]
        + [(10 + i, "common words here plus nothing", "src1") for i in range(5)],
        "doc_id long, text string, source string",
    )
    top = drift_terms(docs, n_top=3).collect()
    terms = {r["term"] for r in top}
    assert "zzsignal" in terms and "nothing" in terms
    z = next(r for r in top if r["term"] == "zzsignal")
    assert z["n_a"] == 5 and z["n_b"] == 0


def test_activity_streaks_islands(spark):
    from datetime import datetime

    from scarf_spark.operators.windows import activity_streaks

    d = lambda day: datetime(2026, 1, day)
    rows = [(1, d(1)), (1, d(2)), (1, d(3)), (1, d(7)), (1, d(8)), (2, d(5))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["user_id"]: r for r in activity_streaks(ev).collect()}
    assert out[1]["n_active_days"] == 5 and out[1]["longest_streak"] == 3
    assert out[2]["n_active_days"] == 1 and out[2]["longest_streak"] == 1


def test_ttr_detects_repetition(spark):
    from scarf_spark.operators.text import type_token_ratio

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words fully distinct"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in type_token_ratio(docs).collect()}
    assert 3 not in out
    assert out[1]["ttr_ppm"] == 250_000
    assert out[2]["ttr_ppm"] == 1_000_000
