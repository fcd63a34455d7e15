"""Round-12 regression tests: the interval-overlap plan pair (binned
pair join vs prefix-sum sweep, one result set), the salt=1
short-circuit, the quantized ``overlap_sum``, the dedup-memo lock, and
the fused ``harmony_lite`` scans."""

import threading

from pyspark.sql import functions as F

from scarf_spark.operators import joins


def _fixture_intervals(spark, n=400):
    base = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("chr"), (F.col("id") % 3).cast("string")).alias("chrom"),
        ((F.col("id") * 48271) % 1000).cast("double").alias("start"),
    )
    qi = base.select("id", "chrom", "start", (F.col("start") + 37.0).alias("end"))
    ri = base.select(
        (F.col("id") + 10_000).alias("id"), "chrom",
        ((F.col("start") + 11.0) % 1000).alias("start"),
    ).select(
        "id", "chrom", "start", (F.col("start") + 13.0).alias("end"),
        (F.col("start") / 7.0).alias("value"),
    )
    return qi, ri


def test_overlap_sum_quantized_matches_sweep(spark):
    # the two physical plans behind one oracle: binned pair join +
    # integer-cent agg vs the inclusion-exclusion prefix sweep must be
    # bit-identical row for row
    qi, ri = _fixture_intervals(spark)
    a = {
        r["q_id"]: (r["sum_value"], r["n_overlaps"])
        for r in joins.overlap_sum(qi, ri, bin_size=100, value_scale=100).collect()
    }
    b = {
        r["q_id"]: (r["sum_value"], r["n_overlaps"])
        for r in joins.overlap_sum_sweep(qi, ri, value_scale=100).collect()
    }
    assert a == b
    assert len(a) > 0


def test_interval_salt1_short_circuit_same_pairs(spark):
    # salt=1 drops the ref replication and the salt join key entirely;
    # the pair set must not change
    qi, ri = _fixture_intervals(spark)
    salted = {
        (r["q_id"], r["r_id"])
        for r in joins.interval_overlap_join_binned(qi, ri, bin_size=100).collect()
    }
    plain = {
        (r["q_id"], r["r_id"])
        for r in joins.interval_overlap_join_binned(
            qi, ri, bin_size=100, salt=1
        ).collect()
    }
    naive = {
        (r["q_id"], r["r_id"])
        for r in joins.interval_overlap_join(qi, ri).collect()
    }
    assert salted == plain == naive
    # and salt=1 really removed the explode: no _salt column survives
    # anywhere in the analyzed plan
    plan = joins.interval_overlap_join_binned(
        qi, ri, bin_size=100, salt=1
    )._jdf.queryExecution().analyzed().toString()
    assert "_salt" not in plan


def test_dedup_memo_builds_once_under_concurrency(spark, sf_dir):
    # 4 bench threads race the memo: the double-checked lock must
    # yield ONE persisted shingle table and ONE candidate table
    import __spark_entry__ as entry

    app = spark.sparkContext.applicationId
    for k in [k for k in entry._DEDUP_CACHE if k[0] == app]:
        entry._DEDUP_CACHE.pop(k)
    results = []

    def hit():
        results.append(entry._dedup_candidates(spark, sf_dir))

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len({id(df) for df in results}) == 1
    # the chain accessor returns the same pieces the candidates used
    ch = entry._dedup_chain(spark, sf_dir)
    assert entry._DEDUP_CACHE[(app, sf_dir, "chain")] is ch


def test_pagerank_exact_matches_float_path(spark):
    # uniform out-degree 2-regular ring: the scaled-integer recurrence
    # must agree with the float path to well under the old 1e-9
    # rounding quantum, and mass must stay exactly 1 in integer form
    from scarf_spark.operators.graph import pagerank

    n = 40
    edges = spark.range(n).selectExpr(
        "id AS src", "(id + 1) % 40 AS dst"
    ).unionAll(spark.range(n).selectExpr("id AS src", "(id + 7) % 40 AS dst"))
    ex = {r["v"]: r["pagerank"] for r in
          pagerank(edges, n_iter=3, exact=True).collect()}
    fl = {r["v"]: r["pagerank"] for r in
          pagerank(edges, n_iter=3, exact=False).collect()}
    assert len(ex) == n
    assert all(abs(ex[v] - fl[v]) < 1e-9 for v in ex)
    # total rank mass is exactly 1: the scaled integers sum to n*(40)^3
    assert abs(sum(ex.values()) - 1.0) < 1e-12
    # non-uniform degree refuses exact mode instead of silently lying
    bad = edges.unionAll(spark.range(1).selectExpr("0 AS src", "5 AS dst"))
    try:
        pagerank(bad, n_iter=1, exact=True).collect()
        raise AssertionError("expected ValueError on non-uniform degree")
    except ValueError:
        pass


def test_quality_score_ppm_exact_integers(spark):
    # hand-computed doc: "the cat sat" -> nt=3, sl=9, sw=1 ('the'),
    # text len 11, alpha 9. mean_token_len_ppm = 9e6 div 3 = 3_000_000;
    # stopword 1e6 div 3 = 333_333; alpha 9e6 div 11 = 818_181;
    # quality = .4*min(5/3,1) + .3*9/11 + .3*min(.3,1)
    #         = .4 + 27/110 + .09 -> ppm floor = 735454
    from scarf_spark.operators.text import quality_score

    docs = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    r = quality_score(docs).collect()[0]
    assert r["n_tokens"] == 3
    assert r["mean_token_len_ppm"] == 3_000_000
    assert r["stopword_ratio_ppm"] == 333_333
    assert r["alpha_ratio_ppm"] == 818_181
    num = 400_000 * 3 * 11 + 300_000 * 9 * 3 + 30_000 * 9 * 11
    assert r["quality_ppm"] == num // (3 * 11) == 735_454


def test_harmony_fused_iterations_converge(spark):
    # the scan-fused loop must still be deterministic and batch-aware:
    # two disjoint batches offset by a constant vector move toward each
    # other after correction (the correction subtracts the per-batch
    # offset in expectation)
    from scarf_spark.ml.integrate import harmony_lite

    n = 60
    rows = []
    for i in range(n):
        b = i % 2
        base = [float((i * 7) % 5), float((i * 3) % 4)]
        rows.append((i, [base[0] + 3.0 * b, base[1] - 2.0 * b], b))
    df = spark.createDataFrame(rows, "cell_id long, v array<double>, batch int")
    out = harmony_lite(
        df.select("cell_id", "v"),
        df.select("cell_id", "batch"),
        n_clusters=2,
        n_iter=2,
    )
    got = {r["cell_id"]: r["v"] for r in out.collect()}
    assert len(got) == n
    import statistics

    def batch_mean(dim, b):
        return statistics.mean(got[i][dim] for i in range(n) if i % 2 == b)

    # raw batch gap is 3.0 in dim0 and 2.0 in dim1; correction must
    # shrink both substantially
    assert abs(batch_mean(0, 0) - batch_mean(0, 1)) < 1.5
    assert abs(batch_mean(1, 0) - batch_mean(1, 1)) < 1.0
    # determinism: a second run is bit-identical
    out2 = harmony_lite(
        df.select("cell_id", "v"),
        df.select("cell_id", "batch"),
        n_clusters=2,
        n_iter=2,
    )
    got2 = {r["cell_id"]: r["v"] for r in out2.collect()}
    assert got == got2
