"""Property-based invariants (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5 notes it has no randomized testing). Each
property uses few, small examples: Spark jobs per example are the cost.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from scarf_spark.operators import joins
from scarf_spark.operators.windows import global_ntile

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SET
@given(
    n=st.integers(min_value=1, max_value=200),
    bins=st.integers(min_value=1, max_value=17),
    mult=st.integers(min_value=1, max_value=9973),
)
def test_global_ntile_equals_window_ntile(spark, n, bins, mult):
    df = spark.range(n).select(
        F.col("id"), ((F.col("id") * mult) % 1009).cast("double").alias("x")
    )
    # small_threshold=0 forces the distributed grid branch — the small
    # branch IS the window ntile, so only the grid branch needs the
    # property check
    a = {
        r["id"]: r["bin"]
        for r in global_ntile(
            df, ["x", "id"], bins, small_threshold=0
        ).collect()
    }
    w = Window.orderBy("x", "id")
    b = {
        r["id"]: r["bin"]
        for r in df.select("id", F.ntile(bins).over(w).alias("bin")).collect()
    }
    assert a == b


@SET
@given(
    starts=st.lists(
        st.integers(min_value=0, max_value=300), min_size=1, max_size=30
    ),
    widths=st.lists(
        st.integers(min_value=1, max_value=60), min_size=1, max_size=30
    ),
    bin_size=st.sampled_from([7, 16, 50, 128]),
)
def test_binned_interval_join_equals_naive(spark, starts, widths, bin_size):
    n = min(len(starts), len(widths))
    rows = [
        (i, "chr%d" % (i % 2), float(starts[i]), float(starts[i] + widths[i]))
        for i in range(n)
    ]
    qi = spark.createDataFrame(rows, "id long, chrom string, start double, end double")
    ri = spark.createDataFrame(
        [(i + 1000, c, s, e, 1.0) for i, c, s, e in rows],
        "id long, chrom string, start double, end double, value double",
    )
    naive = {
        (r["q_id"], r["r_id"])
        for r in joins.interval_overlap_join(qi, ri).collect()
    }
    binned = joins.interval_overlap_join_binned(qi, ri, bin_size=bin_size).collect()
    pairs = [(r["q_id"], r["r_id"]) for r in binned]
    assert len(pairs) == len(set(pairs))  # report-bin dedup emits exactly once
    assert set(pairs) == naive


@SET
@given(
    starts=st.lists(
        st.integers(min_value=0, max_value=200), min_size=2, max_size=25
    ),
    widths=st.lists(
        st.integers(min_value=1, max_value=50), min_size=2, max_size=25
    ),
)
def test_sweep_overlap_sum_equals_naive(spark, starts, widths):
    n = min(len(starts), len(widths))
    qi = spark.createDataFrame(
        [
            (i, "chr%d" % (i % 2), float(starts[i]), float(starts[i] + widths[i]))
            for i in range(n)
        ],
        "id long, chrom string, start double, end double",
    )
    ri = spark.createDataFrame(
        [
            (
                i + 500,
                "chr%d" % ((i + 1) % 2),
                float(starts[n - 1 - i]),
                float(starts[n - 1 - i] + widths[i]),
                float(i) + 0.25,
            )
            for i in range(n)
        ],
        "id long, chrom string, start double, end double, value double",
    )
    naive = {}
    for r in joins.interval_overlap_join(qi, ri).collect():
        key = r["q_id"]
        c = round(r["r_value"] * 100)
        s, k = naive.get(key, (0, 0))
        naive[key] = (s + c, k + 1)
    got = {
        r["q_id"]: (round(r["sum_value"] * 100), r["n_overlaps"])
        for r in joins.overlap_sum_sweep(qi, ri).collect()
    }
    assert got == {k: (s, c) for k, (s, c) in naive.items()}


@SET
@given(
    clicks=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0,
        max_size=20,
    ),
    views=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=20,
    ),
)
def test_asof_join_matches_naive(spark, clicks, views):
    right = spark.createDataFrame(
        [(u, t, i, float(i)) for i, (u, t) in enumerate(clicks)],
        "user_id long, ts long, event_id long, value double",
    )
    left = spark.createDataFrame(
        [(u, t, 1000 + i) for i, (u, t) in enumerate(views)],
        "user_id long, ts long, event_id long",
    )
    got = {
        r["event_id"]: r["match_id"]
        for r in joins.asof_join(left, right).collect()
    }
    for i, (u, t) in enumerate(views):
        cand = [
            (ct, ci)
            for ci, (cu, ct) in enumerate(clicks)
            if cu == u and ct <= t
        ]
        want = max(cand)[1] if cand else None
        assert got[1000 + i] == want, (u, t, cand)


def test_merge_count_conservation(spark, sf_dir):
    # union-merge invariant from the reference's own suite
    # (tests/test_merger.py): sum(merged) == k * sum(orig)
    from scarf_spark.catalog import DataStore
    from scarf_spark.operators import setops

    counts = DataStore(spark, sf_dir).counts().limit(2000)
    t = counts.select(F.col("cell_id").cast("string").alias("id"), "value")
    merged = setops.merge_cell_tables([("a", t), ("b", t)])
    tot = merged.agg(F.sum("value")).collect()[0][0]
    orig = t.agg(F.sum("value")).collect()[0][0]
    assert tot == 2 * orig


@SET
@given(
    n=st.integers(min_value=10, max_value=300),
    parts=st.integers(min_value=1, max_value=9),
)
def test_kmv_sketch_partitioning_invariant(spark, n, parts):
    """The KMV sketch (hash order + distinct) must not depend on how the
    input is partitioned — the core portability claim of the sketch."""
    from scarf_spark.operators.aggregate import kmv_distinct

    df = spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") * 7919 % 997).alias("key"),
    )
    a = sorted(map(tuple, kmv_distinct(df, "grp", "key", k=8).collect()))
    b = sorted(map(tuple, kmv_distinct(df.repartition(parts), "grp", "key", k=8).collect()))
    assert a == b


# NOTE (r16): the pure-`parts` invariance tests below were hypothesis
# @given(parts=...) with 5 examples each — 10 operator runs per test for
# a binary property (layout invariance either holds for every layout or
# breaks for nearly any repartition; hypothesis shrinking adds nothing
# over fixed representative layouts). Each now compares THREE layouts —
# the natural parallelism, a single partition (coalesce(1): the serial
# fold order), and an odd 7-way repartition — cutting the suite's
# heaviest block ~3x (test_star_contraction alone was 95s) while keeping
# the detection power; the r15 driver verify could not finish the 33min
# suite (VERIFY_r15 tests_ok=false), so suite runtime is itself a gate.


def test_temperature_sample_partitioning_invariant(spark):
    from scarf_spark.operators.filters import temperature_sample

    rows = [(i, f"s{i % 4}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r["doc_id"] for r in
               temperature_sample(docs, "source", "doc_id", 50, 2.0).collect())
    for alt in (docs.coalesce(1), docs.repartition(7)):
        b = sorted(r["doc_id"] for r in
                   temperature_sample(alt, "source", "doc_id", 50, 2.0).collect())
        assert a == b


def test_pagerank_mass_conserved_on_knn_graph(spark, sf_dir):
    """No dangling nodes in a KNN graph -> total rank stays 1 after any
    number of damped iterations."""
    import __spark_entry__ as E
    from scarf_spark.operators.graph import pagerank

    edges = E._knn_edges(spark, sf_dir)
    total = (
        pagerank(edges, n_iter=2).agg(F.sum("pagerank").alias("s")).collect()[0]["s"]
    )
    assert abs(total - 1.0) < 1e-6


def test_pivot_preserves_group_totals(spark, sf_dir):
    """Row sums of the pivot equal the per-user total of the long form."""
    from scarf_spark.catalog import DataStore
    from scarf_spark.operators.aggregate import pivot_wide

    ev = DataStore(spark, sf_dir).events
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    wide = pivot_wide(ev, "user_id", "event_type", sorted(types), "value")
    row_sum = sum(F.col(t) for t in sorted(types))
    a = {r["user_id"]: round(r["s"], 4) for r in
         wide.select("user_id", row_sum.alias("s")).collect()}
    b = {r["user_id"]: round(r["s"], 4) for r in
         ev.groupBy("user_id").agg(F.round(F.sum("value"), 6).alias("s")).collect()}
    # pivot rounds per cell; compare at the coarser 1e-4 grid
    assert a == b


def test_pq_codes_partitioning_invariant(spark):
    """PQ assignment (argmin over broadcast codewords) must not depend
    on input partitioning — the broadcast + MIN(STRUCT) determinism."""
    import numpy as np

    from scarf_spark.operators.knn import pq_quantize

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=32)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(map(tuple, pq_quantize(emb, m=4, n_codes=4).collect()))
    for alt in (emb.coalesce(1), emb.repartition(7)):
        b = sorted(map(tuple, pq_quantize(alt, m=4, n_codes=4).collect()))
        assert a == b


def test_triangle_counts_partitioning_invariant(spark, sf_dir):
    import __spark_entry__ as E
    from scarf_spark.operators.graph import triangle_counts

    edges = E._knn_edges(spark, sf_dir)
    a = sorted(map(tuple, triangle_counts(edges).collect()))
    b = sorted(map(tuple, triangle_counts(edges.repartition(7)).collect()))
    assert a == b


def test_segment_dedup_partitioning_invariant(spark):
    """Cross-doc segment dedup must not depend on input partitioning or
    row order — the doc-frequency table is a pure function of the
    corpus content."""
    from scarf_spark.operators.text import segment_dedup

    rows = [(i, ("common seg one two three four five six " * (1 + i % 2)).strip())
            for i in range(30)] + [(100 + i, f"unique{i} " * 9) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, segment_dedup(docs).collect()))
    for alt in (docs.coalesce(1), docs.repartition(7)):
        b = sorted(map(tuple, segment_dedup(alt).collect()))
        assert a == b


def test_star_contraction_partitioning_invariant(spark):
    from scarf_spark.operators.graph import connected_components_star

    edges = [(i, i + 1) for i in range(25)] + [(50, 51), (52, 51)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, connected_components_star(df).collect()))
    for alt in (df.coalesce(1), df.repartition(7)):
        b = sorted(map(tuple, connected_components_star(alt).collect()))
        assert a == b


@SET
@given(
    n=st.integers(min_value=1, max_value=150),
    bins=st.integers(min_value=1, max_value=11),
    groups=st.integers(min_value=1, max_value=5),
    mult=st.integers(min_value=1, max_value=9973),
)
def test_grouped_ntile_equals_window_ntile(spark, n, bins, groups, mult):
    from scarf_spark.operators.windows import grouped_ntile

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % groups).alias("g"),
        ((F.col("id") * mult) % 977).cast("double").alias("x"),
    )
    a = {
        r["id"]: r["bin"]
        for r in grouped_ntile(df, ["g"], ["x", "id"], bins, grid=8).collect()
    }
    w = Window.partitionBy("g").orderBy("x", "id")
    b = {
        r["id"]: r["bin"]
        for r in df.select("id", F.ntile(bins).over(w).alias("bin")).collect()
    }
    assert a == b


@SET
@given(
    n=st.integers(min_value=1, max_value=120),
    groups=st.integers(min_value=1, max_value=4),
    mult=st.integers(min_value=1, max_value=9973),
)
def test_grouped_rank_equals_row_number(spark, n, groups, mult):
    from scarf_spark.operators.windows import grouped_rank

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % groups).alias("g"),
        ((F.col("id") * mult) % 53).cast("double").alias("x"),  # many ties
    )
    a = {
        r["id"]: r["rank"]
        for r in grouped_rank(df, ["g"], ["x", "id"], grid=4).collect()
    }
    w = Window.partitionBy("g").orderBy("x", "id")
    b = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert a == b


@SET
@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=25,
    ),
    width=st.sampled_from([1, 2, 3, 5, 8]),
)
def test_rolling_median_matches_python(spark, vals, width):
    from scarf_spark.operators.windows import rolling_median

    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g long, i long, value double")
    got = {
        r["i"]: r["rolling_median"]
        for r in rolling_median(df, ["g"], ["i"], "value", width=width).collect()
    }
    for i in range(len(vals)):
        win = sorted(vals[max(0, i - width + 1) : i + 1])
        assert got[i] == win[(len(win) + 1) // 2 - 1]


@SET
@given(parts=st.sampled_from([1, 3, 13]), n=st.integers(min_value=5, max_value=60))
def test_active_user_bands_partition_invariant(spark, parts, n):
    from datetime import datetime, timedelta

    from scarf_spark.operators.windows import active_user_bands

    rows = [
        (i % 7, datetime(2026, 1, 1) + timedelta(days=(i * 3) % 40))
        for i in range(n)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    a = sorted(map(tuple, active_user_bands(ev).collect()))
    b = sorted(map(tuple, active_user_bands(ev.repartition(parts)).collect()))
    assert a == b


def test_bloom_decon_partition_invariant(spark):
    from scarf_spark.operators.dedup import bloom_decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, f"w{i} alpha beta gamma delta end") for i in range(8)]
        + [(20 + i, f"unique{i} totally different text here") for i in range(8)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, bloom_decontaminate(corpus, bench, n=4).collect()))
    for parts in (1, 7):
        b = sorted(
            map(
                tuple,
                bloom_decontaminate(
                    corpus.repartition(parts), bench.repartition(parts), n=4
                ).collect(),
            )
        )
        assert a == b


@SET
@given(
    n=st.integers(min_value=1, max_value=120),
    groups=st.integers(min_value=1, max_value=4),
    mult=st.integers(min_value=1, max_value=9973),
    parts=st.integers(min_value=1, max_value=9),
)
def test_weighted_median_partitioning_invariant(spark, n, groups, mult, parts):
    """grouped_weighted_median must be invariant to input partitioning
    AND match the sequential definition (smallest v with 2·cumw ≥ W)."""
    from scarf_spark.operators.windows import grouped_weighted_median

    rows = [
        (i % groups, float((i * mult) % 37), 1 + (i * 7) % 5)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "g int, v double, wt int")
    a = sorted(
        map(tuple, grouped_weighted_median(df, ["g"], "v", "wt", grid=8).collect())
    )
    b = sorted(
        map(
            tuple,
            grouped_weighted_median(
                df.repartition(parts), ["g"], "v", "wt", grid=8
            ).collect(),
        )
    )
    assert a == b
    want = {}
    for g in {r[0] for r in rows}:
        items = sorted((v, wt) for gg, v, wt in rows if gg == g)
        W = sum(wt for _, wt in items)
        cum = 0
        for v, wt in items:
            cum += wt
            if 2 * cum >= W:
                want[g] = (g, W, v)
                break
    assert a == sorted(want.values())


def test_session_concurrency_partitioning_invariant(spark):
    from scarf_spark.operators.windows import session_concurrency

    rows = [
        (i, 1 + i % 5, f"2024-01-0{1 + i % 3} {10 + i % 12}:{i % 60:02d}:00")
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    a = sorted(map(tuple, session_concurrency(ev).collect()))
    for alt in (ev.coalesce(1), ev.repartition(7)):
        b = sorted(map(tuple, session_concurrency(alt).collect()))
        assert a == b


def test_harmonic_potential_partitioning_invariant(spark):
    """The distributed pseudotime's ROUND(6) output is invariant to the
    input partitioning — the per-round sums are order-insensitive at
    the rounded resolution, which is the contract its oracle relies
    on."""
    from scarf_spark.ml.pseudotime import harmonic_potential

    rows = [(i, (i * 7 + 1) % 23, 1.0 + (i % 5)) for i in range(40) if i != (i * 7 + 1) % 23]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    a = sorted(map(tuple, harmonic_potential(e, source_node=0, n_iter=8).collect()))
    for alt in (e.coalesce(1), e.repartition(7)):
        b = sorted(
            map(
                tuple,
                harmonic_potential(alt, source_node=0, n_iter=8).collect(),
            )
        )
        assert a == b
