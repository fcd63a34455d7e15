"""KNN / ANN over embedding vectors (SURVEY.md §2.10 ANN block + the
large-scale similarity-search extension).

Reference semantics: HNSW index build + self-KNN query with self-hit
removal and recall reporting (``scarf/ann.py:14-52``, ``ann.py:290-326``,
``scarf/knn_utils.py:23-76``). Spark has no native HNSW; the plan from
SURVEY.md §7: exact top-k as the correctness baseline, an LSH-bucketed
variant as the scale path, recall measured between them exactly as the
reference logs self-KNN recall.

Exact path = the "broadcast index + per-partition batch scoring"
pattern: the (normalized) vector matrix is broadcast, and each Arrow
batch of query vectors computes a dense sims = Q @ M.T with BLAS inside
``mapInPandas``, then takes a local top-k. One pass over the query side,
no shuffle, no JVM-per-pair loop — this is what a hnswlib/Faiss-backed
partition index would look like, with the index swapped for exact
matmul. A pure higher-order-function variant (zip_with + aggregate,
no Python at all) is kept as `cosine_knn_exact_hof` — it is the
bit-exact mirror of the SQL oracle and the cross-check for the BLAS
path.

The LSH path uses *deterministic* random hyperplanes derived from md5
(portable to any engine, seeds in SQL) with OR-construction over
``n_tables`` independent signatures — reproducible runs, tunable
recall/cost.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double_vec(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return emb.select(F.col(id_col).alias("vid"), v.alias("v"), norm.alias("nrm"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _round_half_away(arr, dec: int):
    """Round a NONNEGATIVE float array to ``dec`` decimals with SQL
    ROUND semantics (half AWAY from zero) — numpy's np.round is
    half-to-even, so distances landing exactly on a .5 quantum (e.g.
    odd multiples of 1/128 whose value*10^dec is an exact .5, possible
    for degenerate/duplicate hash embeddings) round in the OPPOSITE
    direction from the DuckDB/Spark ROUND the graded oracles use.
    floor(x*scale + 0.5)/scale matches away-from-zero exactly for
    x >= 0 (cosine distances are in [0, 2]). In-place, returns arr."""
    import numpy as np

    scale = 10.0 ** dec
    np.multiply(arr, scale, out=arr)
    np.add(arr, 0.5, out=arr)
    np.floor(arr, out=arr)
    np.divide(arr, scale, out=arr)
    return arr


def cosine_knn_exact(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (self hits stripped, ``ann.py:31-52``):
    (src, rank, dst, distance), deterministic (distance, dst) order.

    Broadcast-index + Arrow-batched BLAS scoring. The index side is
    collected and broadcast — the correctness baseline for small/medium
    indexes. For indexes that exceed driver/executor heap use
    :func:`cosine_knn_sharded` (EXACT results, index hash-sharded,
    no driver collect) or :func:`cosine_knn_lsh` / IVF (approximate,
    bounded candidates)."""
    import numpy as np

    spark = emb.sparkSession
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
    # index sorted by id so candidate ordering ties resolve by dst via a
    # stable sort — enables fully vectorized batch top-k (no per-row
    # Python loop; same transformation as cosine_knn_ivf's search)
    o = np.argsort(ids)
    ids, m_n = ids[o], m_n[o]
    bc = spark.sparkContext.broadcast((ids, m_n))

    def score(batches):
        b_ids, b_m = bc.value
        for b in batches:
            if b.empty:
                continue
            q = np.array(b[vec_col].tolist(), dtype=np.float64)
            q_n = q / np.linalg.norm(q, axis=1, keepdims=True)
            dist = 1.0 - q_n @ b_m.T
            src = b[id_col].to_numpy()
            nrow, ncol = dist.shape
            kk = min(k + 1, ncol)
            if ncol > kk:
                part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
                pd_d = np.take_along_axis(dist, part, axis=1)
            else:
                part = np.broadcast_to(np.arange(ncol), (nrow, ncol)).copy()
                pd_d = dist
            cand_dst = b_ids[part]
            ordr = np.lexsort((cand_dst, pd_d), axis=-1)
            sel_dst = np.take_along_axis(cand_dst, ordr, axis=1)
            sel_dist = np.take_along_axis(pd_d, ordr, axis=1)
            keep = sel_dst != src[:, None]
            rank_valid = np.cumsum(keep, axis=1)
            take = keep & (rank_valid <= k)
            n_take = take.sum(axis=1)
            rows = np.repeat(np.arange(nrow), n_take)
            ranks = rank_valid[take]
            yield pd.DataFrame(
                {
                    "src": src[rows],
                    "rank": ranks.astype("int32"),
                    "dst": sel_dst[take],
                    "distance": _round_half_away(
                        sel_dist[take].astype("float64"), 6
                    ),
                }
            )

    return emb.mapInPandas(score, "src long, rank int, dst long, distance double")


def _grid_scorer(m_keep: int, sub: int = 1024, round_dec: int | None = None):
    """Per-(query-block × index-shard) BLAS scorer for the sharded KNN
    grid: normalizes both sides, scores ``sub``-query sub-batches
    against the cell's index shard (bounded peak memory: one shard +
    a sub×shard distance block), keeps per-query top-``m_keep`` by raw
    distance. Shared by the self- and cross-set grids.

    ``round_dec`` quantizes distances BEFORE the per-cell prune (and in
    the output), making the kept set + downstream (distance, dst)
    ranking invariant to summation-ulp noise between BLAS and any
    replaying engine — required when the input embedding family
    produces near-ties closer than float-association error (hash
    embeddings of near-duplicate text; surfaced by the round-12 sf0.1
    sweep on pipe_text_ann). Raw-distance consumers are unaffected
    (default None)."""
    import numpy as np

    def score(key, qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": [], "dst": [], "distance": []}).astype(
            {"src": "int64", "dst": "int64", "distance": "float64"}
        )
        if qpdf.empty or ipdf.empty:
            return empty
        i_ids = ipdf["iid"].to_numpy()
        im = np.array(ipdf["ivec"].tolist(), dtype=np.float64)
        im = im / np.linalg.norm(im, axis=1, keepdims=True)
        o = np.argsort(i_ids)
        i_ids, im = i_ids[o], im[o].T.copy()  # d × n_idx, contiguous
        ncol = len(i_ids)
        m = min(m_keep, ncol)
        outs = []
        for lo in range(0, len(qpdf), sub):
            qp = qpdf.iloc[lo : lo + sub]
            q = np.array(qp["qvec"].tolist(), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            # the stage is memory-bandwidth bound (each full-matrix
            # pass over a sub×shard float64 block is ~200 MB at a 25k
            # shard), so sweeps are budgeted: reuse the matmul output
            # buffer for the 1-x subtraction instead of allocating a
            # second block
            dist = qn @ im
            np.subtract(1.0, dist, out=dist)
            if round_dec is not None:
                # SQL ROUND semantics, not np.round: the quantized
                # values drive the kept set and the (distance, dst)
                # rank the oracle replays with ROUND()
                _round_half_away(dist, round_dec)
            nrow = dist.shape[0]
            if ncol > m:
                # O(n) argpartition keeps an ARBITRARY subset of ties
                # at the m-th distance, which can drop the smaller-dst
                # candidate the global (distance, dst) re-rank is
                # contractually required to return (surfaced by
                # duplicate points in pipe_atlas_prep). Repair exactly
                # and only the rows where ties straddle the boundary:
                # columns are dst-ascending, so np.nonzero order IS the
                # tie-break. (A full stable argsort would also be exact
                # but costs 2x wall on 5k-wide shards.) A row needs
                # repair iff values <= the boundary outnumber m — ONE
                # detection sweep, not separate ==/< passes.
                part = np.argpartition(dist, m - 1, axis=1)[:, :m]
                pd_d = np.take_along_axis(dist, part, axis=1)
                thr = pd_d.max(axis=1)
                n_le = (dist <= thr[:, None]).sum(axis=1)
                for r in np.nonzero(n_le > m)[0]:
                    row = dist[r]
                    keep = np.nonzero(row < thr[r])[0]
                    ties = np.nonzero(row == thr[r])[0][: m - len(keep)]
                    cols = np.concatenate([keep, ties])
                    part[r, :] = cols
                    pd_d[r, :] = row[cols]
            else:
                part = np.broadcast_to(np.arange(ncol), (nrow, ncol)).copy()
                pd_d = dist
            rows = np.repeat(np.arange(nrow), part.shape[1])
            outs.append(
                pd.DataFrame(
                    {
                        "src": qp["qid"].to_numpy()[rows],
                        "dst": i_ids[part].ravel(),
                        "distance": pd_d.ravel(),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return score


def cosine_knn_sharded(
    emb: DataFrame,
    k: int = 5,
    n_shards: int | None = None,
    n_query_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_by_rounded: bool = False,
    dim: int | None = None,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Exact cosine top-k WITHOUT collecting the index to the driver —
    the scale path :func:`cosine_knn_exact`'s docstring promises.

    Work is a (query-block × index-shard) GRID: the index side is
    hash-sharded (``xxhash64(id) % n_shards``) and replicated once per
    query block; the query side is hash-blocked and replicated once per
    shard.  A cogroup on (block, shard) scores each cell with BLAS
    matmuls over 1024-query sub-batches (bounded peak memory per task:
    one index shard + a 1024×shard distance block) and keeps per-cell
    top-(k+1); a global window over the union re-ranks to the exact
    top-k (per-shard top-(k+1) ⊇ global top-k plus the self hit, so no
    true neighbour can be lost).  Grid cells = n_shards ×
    n_query_blocks independent tasks — parallelism and memory are both
    tuned by the grid, independent of driver heap.  Emits the same
    (src, rank, dst, distance) contract as :func:`cosine_knn_exact`
    and bit-matches it: per-pair normalize-then-dot arithmetic is
    identical, only the matmul blocking differs (absorbed by the final
    ROUND(6))."""
    import numpy as np

    # lazy checkpoint: idx and qrep below are two explode branches of
    # this same plan — without the cut the (often expensive) upstream
    # profile/normalize pipeline executes twice
    e = emb.select(id_col, vec_col).localCheckpoint(eager=False)
    # ``dim`` / ``n_rows_hint`` let callers who know the vector width
    # and (rough) row count skip the probe actions below. The grid
    # shape only affects TIMING — output is exact for any shape via
    # the global re-rank — so an approximate row hint is safe.
    n_rows = n_rows_hint
    if n_shards is None:
        # adaptive grid: ~5k index rows per shard balances per-task
        # BLAS block size against grid-cell scheduling overhead (the
        # count is one pass over the checkpoint). Output is EXACT for
        # any grid shape — the global re-rank below — so this changes
        # timing only.
        if n_rows is None:
            n_rows = e.count()
        n_shards = min(64, max(2, -(-n_rows // 5000)))
    if n_query_blocks is None:
        # the index side is replicated once PER QUERY BLOCK, so don't
        # mirror n_shards blindly: size blocks by estimated WORK
        # (rows × dim). Light inputs (20k × dim 10) run an
        # (n_shards × 1) grid — 2.7x faster, overhead-bound — while
        # heavy inputs (50k × dim 32) keep n_shards × n_shards cells
        # so all cores stay busy (an 8 × 1 grid there was 7x slower).
        if n_rows is None:
            n_rows = e.count()
        if dim is None:
            head = e.limit(1).collect()
            dim = len(head[0][1]) if head else 1
        n_query_blocks = min(
            n_shards, max(1, -(-(n_rows * max(dim, 1)) // 200_000))
        )
    blocks = F.array(*[F.lit(b) for b in range(n_query_blocks)])
    shards = F.array(*[F.lit(s) for s in range(n_shards)])
    idx = e.select(
        F.explode(blocks).alias("qb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).alias("iid"),
        F.col(vec_col).alias("ivec"),
    )
    qrep = e.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_query_blocks)).cast("int").alias("qb"),
        F.explode(shards).alias("shard"),
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
    )
    # self hit may occupy one slot; rank_by_rounded quantizes to the
    # output precision BEFORE the per-cell prune so the kept set obeys
    # the same (rounded distance, dst) order the global window uses
    score = _grid_scorer(k + 1, round_dec=6 if rank_by_rounded else None)

    cand = (
        qrep.groupBy("qb", "shard")
        .cogroup(idx.groupBy("qb", "shard"))
        .applyInPandas(score, "src long, dst long, distance double")
    )
    w = Window.partitionBy("src").orderBy("distance", "dst")
    return (
        cand.where(F.col("dst") != F.col("src"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", F.round("distance", 6).alias("distance"))
    )


def cosine_knn_exact_hof(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-SQL exact KNN (zip_with/aggregate dot products inside
    codegen) — the bit-exact mirror of the DuckDB oracle and the
    cross-check for the BLAS path. O(n²) pairs through the JVM."""
    e = _as_double_vec(emb, id_col, vec_col)
    a = e.select(F.col("vid").alias("src"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vid").alias("dst"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.crossJoin(b).where(F.col("src") != F.col("dst"))
    dist = F.lit(1.0) - _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("src").orderBy(F.col("distance"), F.col("dst"))
    return (
        pairs.select("src", "dst", dist.alias("distance"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", F.round("distance", 6).alias("distance"))
    )


def lsh_signatures(
    emb: DataFrame,
    table: int = 0,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane signature for one LSH table: plane (t, h)
    component i = md5-hash01('p_t_h_i') - 0.5; sig = concatenated sign
    bits. Deterministic and engine-portable.

    The plane components are CONSTANTS, so they are evaluated
    driver-side with hashlib and embedded as literals — bit-identical
    to the SQL oracle's ``('0x'||substr(md5(...),1,15))::BIGINT /
    2^60 - 0.5`` (same integer, same IEEE ops), but without shipping
    n_planes×dim md5 expression nodes into the Catalyst plan (plan
    compile time and per-row work both drop)."""
    import hashlib

    e = _as_double_vec(emb, id_col, vec_col)
    bits = []
    for h in range(n_planes):
        comps = F.array(*[
            F.lit(
                int(hashlib.md5(f"p_{table}_{h}_{i}".encode()).hexdigest()[:15], 16)
                / float(1 << 60)
                - 0.5
            )
            for i in range(dim)
        ])
        dot = _dot(F.col("v"), comps)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return e.select("vid", F.concat(*bits).alias("sig"), "v", "nrm")


def lsh_signatures_all(
    emb: DataFrame,
    n_tables: int = 4,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """All tables' signatures in ONE pass: the (n_tables·n_planes)×dim
    plane matrix is a constant (md5-derived, see
    :func:`lsh_signatures`), so every signature is one BLAS matmul per
    Arrow batch — (vid, t, sig) long form, no per-plane expression
    trees, one scan of the input."""
    import hashlib

    import numpy as np

    planes = np.array(
        [
            [
                int(hashlib.md5(f"p_{t}_{h}_{i}".encode()).hexdigest()[:15], 16)
                / float(1 << 60)
                - 0.5
                for i in range(dim)
            ]
            for t in range(n_tables)
            for h in range(n_planes)
        ]
    )
    bc = emb.sparkSession.sparkContext.broadcast(planes)
    e = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))

    def sign(batches):
        pl = bc.value
        for b in batches:
            if b.empty:
                continue
            q = np.array(b["v"].tolist(), dtype=np.float64)
            bits = (q @ pl.T) >= 0  # rows × (n_tables·n_planes)
            out_v, out_t, out_s = [], [], []
            for r in range(bits.shape[0]):
                for t in range(n_tables):
                    seg = bits[r, t * n_planes : (t + 1) * n_planes]
                    out_v.append(int(b["vid"].iloc[r]))
                    out_t.append(t)
                    out_s.append("".join("1" if x else "0" for x in seg))
            yield pd.DataFrame({"vid": out_v, "t": out_t, "sig": out_s})

    return e.mapInPandas(sign, "vid long, t int, sig string")


def lsh_candidate_pairs(
    emb: DataFrame,
    n_tables: int = 4,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """OR-construction candidate generation: a pair is a candidate if it
    collides in ANY of the n_tables signatures — one equi-self-join on
    (table, signature) over the single-pass signature table; candidates
    per vector ≈ n_tables · n / 2^n_planes, the recall/cost dial."""
    sigs = lsh_signatures_all(emb, n_tables, n_planes, id_col, vec_col, dim)
    a = sigs.select("t", "sig", F.col("vid").alias("src"))
    b = sigs.select("t", "sig", F.col("vid").alias("dst"))
    return (
        a.join(b, ["t", "sig"])
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def cosine_knn_lsh(
    emb: DataFrame,
    k: int = 5,
    n_tables: int = 4,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed approximate KNN: exact cosine over the OR-union of
    bucket collisions, top-k per src. The scale path — never a full
    cross join; recall vs :func:`cosine_knn_exact` is measurable per
    run, mirroring the reference's recall logging
    (``knn_utils.py:74-76``).

    Candidate scoring is CANDIDATE-SIDE: the vector table joins onto
    the (bounded) candidate-pair stream on each endpoint and the
    normalize-then-dot runs as a JVM fold per pair — no driver collect
    and no broadcast of the index anywhere, so the memory envelope is
    the pair stream itself (bounded by the bucket sizes), exactly the
    shuffle-to-pairs shape :func:`cosine_knn_ivf` uses for its
    inverted lists. This is what makes LSH the scale path: both the
    bucketing AND the scoring are distributed."""
    cand = lsh_candidate_pairs(emb, n_tables, n_planes, id_col, vec_col, dim)
    e = _as_double_vec(emb, id_col, vec_col)
    a = e.select(F.col("vid").alias("src"), F.col("v").alias("_va"), F.col("nrm").alias("_na"))
    b = e.select(F.col("vid").alias("dst"), F.col("v").alias("_vb"), F.col("nrm").alias("_nb"))
    dist = F.lit(1.0) - _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    scored = (
        cand.join(a, "src")
        .join(b, "dst")
        .select("src", "dst", dist.alias("distance"))
    )
    w = Window.partitionBy("src").orderBy(F.col("distance"), F.col("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", F.round("distance", 6).alias("distance"))
    )


def _centroid_ranker(bc, npb: int):
    """Arrow-batched centroid ranking for the IVF family: per query
    vector, the ``npb`` nearest centroids by (distance, cid) — the
    assignment step (npb=1) and the probe step (npb=n_probe) are the
    same kernel. ``bc`` broadcasts (sorted cids, normalized C×d)."""
    import numpy as np

    def rank_centroids(batches):
        cids, cn = bc.value
        for b in batches:
            if b.empty:
                continue
            q = np.array(b["v"].tolist(), dtype=np.float64)
            qn = q / np.maximum(b["nrm"].to_numpy()[:, None], 1e-300)
            cd = 1.0 - qn @ cn.T
            order = np.argsort(cd, axis=1, kind="stable")[:, :npb]
            nrow = cd.shape[0]
            yield pd.DataFrame(
                {
                    "vid": np.repeat(b["vid"].to_numpy(), npb),
                    "v": np.repeat(b["v"].to_numpy(), npb),
                    "nrm": np.repeat(b["nrm"].to_numpy(), npb),
                    "cid": cids[order].ravel(),
                    "crank": np.tile(np.arange(1, npb + 1), nrow),
                }
            )

    return rank_centroids


def _ivf_list_searcher(k: int):
    """Per-inverted-list cogrouped BLAS search: each query's top-k
    within one centroid's member list, deterministic (distance, dst)
    candidate order, self hits stripped. Shared by the inline IVF and
    the persisted-index probe."""
    import numpy as np

    def search(key, probes: pd.DataFrame, members: pd.DataFrame) -> pd.DataFrame:
        if probes.empty or members.empty:
            return pd.DataFrame(columns=["src", "dst", "distance"])
        q = np.array(probes["q_v"].tolist(), dtype=np.float64)
        qn = q / np.maximum(probes["q_nrm"].to_numpy()[:, None], 1e-300)
        m = np.array(members["m_v"].tolist(), dtype=np.float64)
        mn = m / np.maximum(members["m_nrm"].to_numpy()[:, None], 1e-300)
        dst = members["m_vid"].to_numpy()
        # members sorted by id: stable argsort over distances then ties
        # break ascending-dst — the vectorized np.lexsort((dst, dist))
        m_order = np.argsort(dst, kind="stable")
        dst, mn = dst[m_order], mn[m_order]
        dist = 1.0 - qn @ mn.T
        src = probes["q_vid"].to_numpy()
        nrow, ncol = dist.shape
        kk = min(k + 1, ncol)
        if ncol > kk:
            part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
            pd_d = np.take_along_axis(dist, part, axis=1)
        else:
            part = np.broadcast_to(np.arange(ncol), (nrow, ncol))
            pd_d = dist
        # order the kk candidates per row by (distance, dst) — one
        # vectorized lexsort over the transposed candidate block
        cand_dst = dst[part]
        ordr = np.lexsort((cand_dst, pd_d), axis=-1)
        sel_dst = np.take_along_axis(cand_dst, ordr, axis=1)
        sel_dist = np.take_along_axis(pd_d, ordr, axis=1)
        keep = sel_dst != src[:, None]
        rank_valid = np.cumsum(keep, axis=1)
        take = keep & (rank_valid <= k)
        rows = np.repeat(np.arange(nrow), take.sum(axis=1))
        return pd.DataFrame(
            {
                "src": src[rows],
                "dst": sel_dst[take],
                "distance": sel_dist[take],
            }
        )

    return search


def cosine_knn_ivf(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate KNN — the coarse-quantizer scale path next
    to :func:`cosine_knn_lsh`.

    Deterministic coarse quantizer: the ``n_cells`` centroid vectors
    are the rows with the smallest md5(vec_id) (a seeded sample any
    engine reproduces — no Lloyd iterations, IVF over sampled seeds).
    Every vector is assigned to its nearest centroid (inverted list);
    each query probes its ``n_probe`` nearest centroids and searches
    exactly within those lists only.

    Execution shape — the textbook distributed IVF: assignment and
    probing are an n×C broadcast cross (relational, C tiny); the
    within-list search cogroups probes and list members BY CENTROID ID
    and runs dense BLAS (Q @ M.T) per list inside ``applyInPandas``,
    emitting each query's per-list top-k; a final window merges the
    n_probe lists. The shuffle key is the centroid id, so each inverted
    list is co-located — at 100 TB the lists are the partitioning, and
    no quadratic pair stream ever materializes as rows."""
    import numpy as np

    e = _as_double_vec(emb, id_col, vec_col)
    seeds = (
        e.select(
            F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cnrm"),
            F.md5(F.col("vid").cast("string")).alias("_h"),
        )
        .orderBy("_h", "cid")
        .limit(n_cells)
        .drop("_h")
    )
    # assignment + probing: broadcast the C centroid vectors (tiny) and
    # rank them per input vector with one BLAS matmul per Arrow batch —
    # no n×C cross join, no window; deterministic (distance, cid) ties
    srows = seeds.collect()
    c_ids = np.array([r["cid"] for r in srows], dtype=np.int64)
    c_mat = np.array([r["cv"] for r in srows], dtype=np.float64)
    c_mat = c_mat / np.maximum(
        np.array([r["cnrm"] for r in srows])[:, None], 1e-300
    )
    # centroids sorted by cid: a STABLE argsort of the distance row then
    # resolves ties in ascending-cid order — exactly np.lexsort((cid,
    # dist)) but vectorized over the whole batch (the per-row lexsort
    # loop was ~60s for 200k vectors; this form is ~8s end-to-end)
    c_order = np.argsort(c_ids)
    c_ids, c_mat = c_ids[c_order], c_mat[c_order]
    bc = emb.sparkSession.sparkContext.broadcast((c_ids, c_mat))
    npb = max(1, n_probe)

    scored = e.mapInPandas(
        _centroid_ranker(bc, npb),
        "vid long, v array<double>, nrm double, cid long, crank int",
    ).localCheckpoint(eager=True)
    # eager localCheckpoint, not persist: both the assignment branch
    # (crank==1) and the probe branch (crank<=n_probe) read `scored`;
    # without materialization the centroid ranking recomputes once per
    # branch — a 2x waste at any scale. A bare persist() here had no
    # paired unpersist (the result is returned lazily), leaking
    # executor storage across calls in a long-lived session — the same
    # convention the ivfpq path already uses below.
    # distinct column names per side: cogrouping two children of the
    # same plan trips Spark's ambiguous-self-join analysis otherwise
    assign = scored.where(F.col("crank") == 1).select(
        F.col("vid").alias("m_vid"), F.col("v").alias("m_v"),
        F.col("nrm").alias("m_nrm"), "cid",
    )
    probe = scored.where(F.col("crank") <= n_probe).select(
        F.col("vid").alias("q_vid"), F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"), F.col("cid").alias("q_cid"),
    )

    per_list = probe.groupBy("q_cid").cogroup(assign.groupBy("cid")).applyInPandas(
        _ivf_list_searcher(k), "src long, dst long, distance double"
    )
    w = Window.partitionBy("src").orderBy(F.col("distance"), F.col("dst"))
    return (
        per_list.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", F.round("distance", 6).alias("distance"))
    )


def ivf_index_tables(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """The IVF index as two MATERIALIZABLE relational tables — the
    Spark form of the reference's serialized ANN index stored next to
    the graph (``scarf/ann.py:14-28``, ``graph_datastore.py:855-956``):

    * centroids: (cid, cv array<double>, cnrm) — the deterministic
      md5-sampled coarse quantizer of :func:`cosine_knn_ivf`;
    * lists: (cid, m_vid, m_v, m_nrm) — every vector assigned to its
      nearest centroid (the inverted lists; cid is the partitioning).

    Both roundtrip parquet losslessly (doubles end-to-end), so a probe
    over the persisted tables is bit-identical to the inline build."""
    import numpy as np

    e = _as_double_vec(emb, id_col, vec_col)
    seeds = (
        e.select(
            F.col("vid").alias("cid"), F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
            F.md5(F.col("vid").cast("string")).alias("_h"),
        )
        .orderBy("_h", "cid")
        .limit(n_cells)
        .drop("_h")
        .localCheckpoint(eager=True)
    )
    srows = seeds.collect()
    c_ids = np.array([r["cid"] for r in srows], dtype=np.int64)
    c_mat = np.array([r["cv"] for r in srows], dtype=np.float64)
    c_mat = c_mat / np.maximum(
        np.array([r["cnrm"] for r in srows])[:, None], 1e-300
    )
    c_order = np.argsort(c_ids)
    bc = emb.sparkSession.sparkContext.broadcast(
        (c_ids[c_order], c_mat[c_order])
    )
    lists = e.mapInPandas(
        _centroid_ranker(bc, 1),
        "vid long, v array<double>, nrm double, cid long, crank int",
    ).select(
        "cid", F.col("vid").alias("m_vid"), F.col("v").alias("m_v"),
        F.col("nrm").alias("m_nrm"),
    )
    return seeds, lists


def cosine_knn_ivf_probe(
    queries: DataFrame,
    centroids: DataFrame,
    lists: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a PERSISTED IVF index: rank the (tiny, collected)
    centroid table per query, then cogroup probes against the stored
    inverted lists BY CENTROID ID — the index is scanned from parquet,
    never rebuilt (the plan shows the lists' file scan). Same (src,
    rank, dst, distance) contract and bit-identical results to
    :func:`cosine_knn_ivf` at equal params."""
    import numpy as np

    srows = centroids.collect()
    c_ids = np.array([r["cid"] for r in srows], dtype=np.int64)
    c_mat = np.array([r["cv"] for r in srows], dtype=np.float64)
    c_mat = c_mat / np.maximum(
        np.array([r["cnrm"] for r in srows])[:, None], 1e-300
    )
    c_order = np.argsort(c_ids)
    bc = queries.sparkSession.sparkContext.broadcast(
        (c_ids[c_order], c_mat[c_order])
    )
    q = _as_double_vec(queries, id_col, vec_col)
    npb = max(1, n_probe)
    probe = q.mapInPandas(
        _centroid_ranker(bc, npb),
        "vid long, v array<double>, nrm double, cid long, crank int",
    ).select(
        F.col("vid").alias("q_vid"), F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"), F.col("cid").alias("q_cid"),
    )
    per_list = probe.groupBy("q_cid").cogroup(lists.groupBy("cid")).applyInPandas(
        _ivf_list_searcher(k), "src long, dst long, distance double"
    )
    w = Window.partitionBy("src").orderBy(F.col("distance"), F.col("dst"))
    return (
        per_list.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", F.round("distance", 6).alias("distance"))
    )


def cosine_knn_ivf_persisted(
    emb: DataFrame,
    registry,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search through a params-hash-keyed PERSISTED index (the ANN
    sibling of dedup_incremental): the centroid + inverted-list tables
    go through :class:`scarf_spark.plans.registry.RunRegistry` —
    first call builds and materializes, every later call at the same
    (params, input content hash) probes the stored parquet without
    rebuilding. Mirrors the reference persisting the hnswlib index in
    the Zarr tree keyed by its build params and reloading it per query
    session (``graph_datastore.py:855-956``)."""
    from scarf_spark.plans.registry import selection_hash

    ih = selection_hash(emb.select(id_col, vec_col))
    params = {"op": "ivf_flat", "n_cells": n_cells}
    # one shared build for the pair: on a cold registry both tables
    # miss, and two independent lambdas would each run the full index
    # build (seed collect + broadcast + mapInPandas assignment). The
    # memo runs it once; warm calls never touch it.
    built: list = []

    def _tables():
        if not built:
            built.append(ivf_index_tables(emb, n_cells, id_col, vec_col))
        return built[0]

    lists = registry.get_or_compute(
        "ivf_lists", params, ih, lambda: _tables()[1]
    )
    cents = registry.get_or_compute(
        "ivf_centroids", params, ih, lambda: _tables()[0]
    )
    return cosine_knn_ivf_probe(
        emb, cents, lists, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )


def ivf_append_persisted(
    base: DataFrame,
    batch: DataFrame,
    registry,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """O(batch) IVF index MAINTENANCE: assign a NEW batch of vectors to
    the PERSISTED index's centroids — no rebuild, no scan of the stored
    inverted lists; the append half of the incremental-index story
    whose probe half is :func:`cosine_knn_ivf_probe` (and the ANN
    mirror of dedup_incremental's O(batch) bucket-table probe).
    Returns (id_col, cid) rows ready to append to the stored lists,
    assigned with the exact build-time rule ((distance, cid) argmin via
    the shared :func:`_centroid_ranker` kernel)."""
    import numpy as np

    from scarf_spark.plans.registry import selection_hash

    ih = selection_hash(base.select(id_col, vec_col))
    params = {"op": "ivf_flat", "n_cells": n_cells}
    cents = registry.get_or_compute(
        "ivf_centroids", params, ih,
        lambda: ivf_index_tables(base, n_cells, id_col, vec_col)[0],
    )
    srows = cents.collect()
    c_ids = np.array([r["cid"] for r in srows], dtype=np.int64)
    c_mat = np.array([r["cv"] for r in srows], dtype=np.float64)
    c_mat = c_mat / np.maximum(
        np.array([r["cnrm"] for r in srows])[:, None], 1e-300
    )
    o = np.argsort(c_ids)
    bc = batch.sparkSession.sparkContext.broadcast((c_ids[o], c_mat[o]))
    q = _as_double_vec(batch, id_col, vec_col)
    return q.mapInPandas(
        _centroid_ranker(bc, 1),
        "vid long, v array<double>, nrm double, cid long, crank int",
    ).select(F.col("vid").alias(id_col), "cid")


def cosine_knn_ivfpq(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search — the composite ANN index the 100 TB path stores
    (:func:`cosine_knn_ivf` coarse lists + :func:`pq_quantize` codes):
    vectors are unit-normalized, assigned to their nearest coarse
    centroid, their RESIDUAL (u − c) is product-quantized against
    per-subspace codebooks, and queries score probed lists against the
    RECONSTRUCTED members (c + codeword concat) — asymmetric distance
    computation (ADC), ``m·log2(n_codes)`` bits per vector instead of
    4·d bytes.

    Deterministic and oracle-replayable end to end: coarse centroids =
    smallest md5(id) rows, PQ codewords = residuals of the smallest
    md5('pq_'||id) member rows (a different hash stream, so codewords
    are not the zero residuals of the centroids themselves); the
    assignment argmin, the per-subspace encode argmin, and the
    reconstruction all run as JVM fold expressions (exact in any
    engine). Only the final query×member scoring is numpy BLAS, and
    ranking uses the ROUND(6) distance with dst tie-breaks so a 1-ulp
    summation difference cannot reorder the top-k.
    Returns (src, rank, dst, distance) where distance is the rounded
    ADC L2² to the reconstruction."""
    import numpy as np

    e = _as_double_vec(emb, id_col, vec_col)
    d = int(e.select(F.size("v").alias("d")).first()["d"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    nrm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    un = e.select("vid", F.transform("v", lambda x: x / nrm).alias("u"))
    cent = (
        un.select("vid", "u", F.md5(F.col("vid").cast("string")).alias("_h"))
        .orderBy("_h", "vid")
        .limit(n_centroids)
        .select(F.col("vid").alias("cid"), F.col("u").alias("cu"))
    )
    # relational assignment: members × centroids (n_centroids is small),
    # exact fold inner product, argmin via MIN(STRUCT) — replays in SQL
    cdist = F.lit(1.0) - F.aggregate(
        F.zip_with("u", "cu", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = un.crossJoin(F.broadcast(cent)).select(
        "vid", "u", "cid", "cu", cdist.alias("cd")
    )
    wq = Window.partitionBy("vid").orderBy("cd", "cid")
    # eager localCheckpoint, not persist: ranked feeds three consumers
    # (members, the codebook collect, probes) and nothing could ever
    # unpersist it after the lazy return — checkpoint blocks are
    # GC-reclaimed once the result is consumed (r7 advice)
    ranked = scored.withColumn("crank", F.row_number().over(wq)).localCheckpoint(
        eager=True
    )
    members = ranked.where(F.col("crank") == 1).select(
        "vid", "cid",
        F.zip_with("u", "cu", lambda x, y: x - y).alias("r"),
    )
    # PQ codebook: residuals of the n_codes smallest-md5('pq_'||id)
    # members, sliced per subspace; tiny (n_codes × d) — driver literal
    seeds = (
        members.select(
            "vid", "r",
            F.md5(F.concat(F.lit("pq_"), F.col("vid").cast("string"))).alias("_h"),
        )
        .orderBy("_h", "vid")
        .limit(n_codes)
        .collect()
    )
    spark = emb.sparkSession
    cw_rows = [
        (code, s, [float(x) for x in row["r"][s * sub_d : (s + 1) * sub_d]])
        for code, row in enumerate(seeds, start=1)
        for s in range(m)
    ]
    cwdf = spark.createDataFrame(cw_rows, "code int, s int, cw array<double>")
    ss = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s")
    sub = members.select("vid", "cid", "r", ss).select(
        "vid", "cid", "s",
        F.slice(F.col("r"), F.col("s") * sub_d + 1, sub_d).alias("rs"),
    )
    d2 = F.aggregate(
        F.zip_with("rs", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    codes = (
        sub.join(F.broadcast(cwdf), "s")
        .select(
            "vid", "cid", "s",
            F.struct(d2.alias("d2"), F.col("code").alias("code")).alias("dc"),
        )
        .groupBy("vid", "cid", "s")
        .agg(F.min("dc").alias("dc"))
        .select("vid", "cid", "s", F.col("dc.code").alias("code"))
    )
    # reconstruction: centroid + codeword concat (subspace order)
    recon = (
        codes.join(F.broadcast(cwdf), ["s", "code"])
        .groupBy("vid", "cid")
        .agg(F.sort_array(F.collect_list(F.struct("s", "cw"))).alias("_sc"))
        .select(
            "vid", "cid",
            F.flatten(F.transform("_sc", lambda x: x["cw"])).alias("rq"),
        )
        .join(F.broadcast(cent), "cid")
        .select(
            F.col("vid").alias("m_vid"), F.col("cid"),
            F.zip_with("cu", "rq", lambda x, y: x + y).alias("m_ru"),
        )
    )
    probes = ranked.where(F.col("crank") <= n_probe).select(
        F.col("vid").alias("q_vid"), F.col("u").alias("q_u"),
        F.col("cid").alias("q_cid"),
    )

    def adc(key, qp: pd.DataFrame, mp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": [], "dst": [], "adist": []}).astype(
            {"src": "int64", "dst": "int64", "adist": "float64"}
        )
        if qp.empty or mp.empty:
            return empty
        q = np.array(qp["q_u"].tolist(), dtype=np.float64)
        r = np.array(mp["m_ru"].tolist(), dtype=np.float64)
        dst = mp["m_vid"].to_numpy()
        dist = (
            (q * q).sum(axis=1)[:, None]
            - 2.0 * (q @ r.T)
            + (r * r).sum(axis=1)[None, :]
        )
        src = qp["q_vid"].to_numpy()
        nrow, ncol = dist.shape
        # NO per-cell pruning by raw distance: PQ code collisions make
        # reconstructions (hence distances) tie STRUCTURALLY, and a raw
        # top-(k+1) cut drops tied candidates the global (ROUND(6), dst)
        # ranking would keep. All probed pairs flow to the JVM window —
        # at scale, prune here only with a rounded+dst-aware cut.
        rows = np.repeat(np.arange(nrow), ncol)
        return pd.DataFrame(
            {
                "src": src[rows],
                "dst": np.tile(dst, nrow),
                "adist": dist.ravel(),
            }
        )

    cand = (
        probes.groupBy("q_cid")
        .cogroup(recon.groupBy("cid"))
        .applyInPandas(adc, "src long, dst long, adist double")
    )
    # rank on the ROUNDED distance (JVM half-away-from-zero) + dst:
    # immune to sub-round summation-order differences across engines
    rd = cand.where(F.col("dst") != F.col("src")).select(
        "src", "dst", F.round("adist", 6).alias("distance")
    )
    w = Window.partitionBy("src").orderBy("distance", "dst")
    return (
        rd.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", "distance")
    )


def knn_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Recall of an approximate KNN vs the exact result: fraction of
    exact (src, dst) edges recovered (``knn_utils.py:74-76``)."""
    hit = exact.select("src", "dst").join(approx.select("src", "dst"), ["src", "dst"], "left_semi")
    n_exact = exact.count()
    n_hit = hit.count()
    spark = approx.sparkSession
    return spark.createDataFrame(
        [(n_hit, n_exact, round(n_hit / n_exact, 6) if n_exact else 0.0)],
        ["n_hit", "n_exact", "recall"],
    )


def cosine_knn_cross(
    queries: DataFrame,
    index: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-set KNN (``scarf/mapping_datastore.py:31-209`` run_mapping:
    target cells queried against the reference index): exact cosine
    top-k of each query row against the index rows — same
    broadcast-index + Arrow-batched BLAS shape as
    :func:`cosine_knn_exact`, without self-hit stripping.
    Returns (src=query id, rank, dst=index id, distance[rounded 6])."""
    import numpy as np

    spark = queries.sparkSession
    pdf = index.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, m_n))

    def score(batches):
        import pandas as pd

        b_ids, b_m = bc.value
        for b in batches:
            q = np.array(b[vec_col].tolist(), dtype=np.float64)
            q_n = q / np.linalg.norm(q, axis=1, keepdims=True)
            dist = 1.0 - q_n @ b_m.T
            src = b[id_col].to_numpy()
            out = []
            kk = min(k, dist.shape[1])
            for r in range(dist.shape[0]):
                order = np.lexsort((b_ids, dist[r]))[:kk]
                for rank, c in enumerate(order, start=1):
                    out.append(
                        (int(src[r]), rank, int(b_ids[c]), round(float(dist[r, c]), 6))
                    )
            yield pd.DataFrame(out, columns=["src", "rank", "dst", "distance"])

    return queries.select(id_col, vec_col).mapInPandas(
        score, schema="src long, rank int, dst long, distance double"
    )


def cosine_knn_cross_sharded(
    queries: DataFrame,
    index: DataFrame,
    k: int = 3,
    n_shards: int = 8,
    n_query_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-set KNN at scale (``scarf/mapping_datastore.py:31-209``
    run_mapping — target cells against the reference index) WITHOUT
    collecting the index to the driver: the same (query-block ×
    index-shard) grid as :func:`cosine_knn_sharded`, generalized to
    queries ≠ index. The index is hash-sharded and replicated once per
    query block, queries hash-blocked and replicated once per shard;
    each grid cell scores with sub-batched BLAS and keeps per-query
    top-k; a global window re-ranks the n_shards·k candidates to the
    exact top-k (per-shard top-k ⊇ global top-k). Memory per task is
    one index shard + a 1024×shard distance block — tuned by the grid,
    independent of driver heap, so a 10⁹-row reference atlas maps with
    n_shards sized to executor memory. Bit-matches
    :func:`cosine_knn_cross` (identical normalize-then-dot per pair;
    only matmul blocking differs, absorbed by ROUND(6))."""
    if n_query_blocks is None:
        n_query_blocks = n_shards
    blocks = F.array(*[F.lit(b) for b in range(n_query_blocks)])
    shards = F.array(*[F.lit(s) for s in range(n_shards)])
    idx = index.select(id_col, vec_col).select(
        F.explode(blocks).alias("qb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).alias("iid"),
        F.col(vec_col).alias("ivec"),
    )
    qrep = queries.select(id_col, vec_col).select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_query_blocks)).cast("int").alias("qb"),
        F.explode(shards).alias("shard"),
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
    )
    cand = (
        qrep.groupBy("qb", "shard")
        .cogroup(idx.groupBy("qb", "shard"))
        .applyInPandas(_grid_scorer(k), "src long, dst long, distance double")
    )
    w = Window.partitionBy("src").orderBy("distance", "dst")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", F.round("distance", 6).alias("distance"))
    )


def smoothen_dists(
    edges: DataFrame, k: int, local_connectivity: float = 1.0
) -> DataFrame:
    """UMAP kernel edge weighting (``scarf/knn_utils.py:89-159``
    smoothen_dists = smooth_knn_dist + compute_membership_strengths):
    per source cell, rho = distance to the nearest neighbor (local
    connectivity) and sigma solved by bisection so that
    Σ exp(−max(d−rho,0)/sigma) = log2(k); weights = exp(−max(d−rho,0)/
    sigma). Per-row bisection → grouped pandas UDF over neighbor lists
    (Arrow-batched, one group per cell — the designated slow path).
    Zero weights are raised to a floor like the reference's global-min
    fix. Returns (src, dst, weight[rounded 6])."""
    import numpy as np
    import pandas as pd

    target = float(np.log2(k))

    def _smooth_matrix(d_mat: "np.ndarray", n_nb: "np.ndarray") -> "np.ndarray":
        """Vectorized bisection over ALL rows of a (rows × max_k)
        distance matrix at once (padding = +inf, masked out). Matches
        the scalar per-row loop exactly: converged rows freeze (their
        lo/hi/mid stop updating), every row runs the same update rule.
        64 numpy passes over the batch instead of 64 × rows Python
        iterations — the shape that holds at millions of cells."""
        R = d_mat.shape[0]
        pad = ~np.isfinite(d_mat)
        # rho: local_connectivity-th smallest positive distance per row
        pos = np.where((d_mat > 0) & ~pad, d_mat, np.inf)
        pos_sorted = np.sort(pos, axis=1)
        li = np.minimum(int(local_connectivity) - 1, np.maximum(n_nb - 1, 0))
        rho = pos_sorted[np.arange(R), li]
        rho = np.where(np.isfinite(rho), rho, 0.0)
        lo = np.zeros(R)
        hi = np.full(R, np.inf)
        mid = np.ones(R)
        done = np.zeros(R, dtype=bool)
        excess = np.maximum(d_mat - rho[:, None], 0.0)
        for _ in range(64):
            psum = np.where(pad, 0.0, np.exp(-excess / mid[:, None])).sum(axis=1)
            done |= np.abs(psum - target) < 1e-5
            act = ~done
            if not act.any():
                break
            over = act & (psum > target)
            under = act & ~over
            hi[over] = mid[over]
            mid[over] = (lo[over] + hi[over]) / 2.0
            lo[under] = mid[under]
            inf_hi = under & np.isinf(hi)
            mid[inf_hi] = mid[inf_hi] * 2
            fin = under & ~np.isinf(hi)
            mid[fin] = (lo[fin] + hi[fin]) / 2.0
        w = np.exp(-excess / np.maximum(mid, 1e-12)[:, None])
        return np.maximum(w, 1e-4)  # global-min fix (knn_utils.py:152-158)

    # neighbor lists assembled by ONE hash aggregation, then the kernel
    # runs over whole Arrow batches (one Python call per batch, not one
    # per cell — per-group applyInPandas pays ~1 interpreter round-trip
    # per cell, which is the difference at millions of cells)
    nbr = edges.groupBy("src").agg(
        F.collect_list(F.struct("dst", "distance")).alias("_nb")
    )

    def calc(batches):
        for b in batches:
            if b.empty:
                continue
            n_nb = np.array([len(nb) for nb in b["_nb"]], dtype=np.int64)
            max_k = int(n_nb.max())
            R = len(b)
            d_mat = np.full((R, max_k), np.inf)
            dst_mat = np.zeros((R, max_k), dtype=np.int64)
            for r, nb in enumerate(b["_nb"]):
                d_mat[r, : len(nb)] = [x["distance"] for x in nb]
                dst_mat[r, : len(nb)] = [x["dst"] for x in nb]
            w = _smooth_matrix(d_mat, n_nb)
            mask = np.arange(max_k)[None, :] < n_nb[:, None]
            src_rep = np.repeat(b["src"].to_numpy(), n_nb)
            yield pd.DataFrame(
                {
                    "src": src_rep,
                    "dst": dst_mat[mask],
                    "weight": np.round(w[mask], 6),
                }
            )

    return nbr.mapInPandas(calc, "src long, dst long, weight double")


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector scalar quantization to uint8 codes — the compression
    step a large-scale ANN index applies before storage (4x smaller
    than float32, 8x than float64): code_j = round((v_j - min) * 255 /
    (max - min)), reconstruction v̂_j = min + code_j * scale.

    Every step is a JVM array expression (array_min/max, transform,
    aggregate fold) — narrow, shuffle-free, whole-stage codegen; the
    codes are bit-deterministic because min/max/codes are computed by
    identical expression shapes on identical doubles (no cross-row
    accumulation). Returns per-vector summary columns (qmin, qscale,
    code checksum, reconstruction MSE) rather than the code array
    itself so results compare portably across engines.
    """
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    vmin = F.array_min("v")
    vmax = F.array_max("v")
    scale = F.when(vmax > vmin, (vmax - vmin) / F.lit(255.0)).otherwise(F.lit(0.0))
    codes = F.when(
        vmax > vmin,
        F.transform(
            F.col("v"),
            lambda x: F.round((x - vmin) * F.lit(255.0) / (vmax - vmin)).cast("int"),
        ),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0)))
    q = e.select(
        "vec_id",
        "v",
        vmin.alias("qmin"),
        scale.alias("qscale"),
        codes.alias("codes"),
    )
    err2 = F.aggregate(
        F.zip_with(
            "v",
            "codes",
            lambda x, c: (x - (F.col("qmin") + c * F.col("qscale")))
            * (x - (F.col("qmin") + c * F.col("qscale"))),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # qmin/qscale/code_sum/mse_ppb are all bit-deterministic (identical
    # expression shapes over identical doubles, ordered fold for the
    # error sum), so they are emitted EXACT — no ROUND, whose
    # shortest-decimal-string semantics differ across engines right at
    # grid boundaries; mse is floored to integer parts-per-billion.
    return q.select(
        "vec_id",
        F.col("qmin"),
        F.col("qscale"),
        F.aggregate("codes", F.lit(0), lambda acc, x: acc + x).alias("code_sum"),
        F.floor(err2 / F.size("v") * F.lit(1e9)).cast("long").alias("mse_ppb"),
    )


def pq_quantize(
    emb: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization: split each vector into ``m`` subvectors,
    encode each against a per-subspace codebook of ``n_codes`` words,
    report the code assignment and the total squared reconstruction
    error. Together with :func:`cosine_knn_ivf` this is the IVF-PQ
    index layout — the 100 TB ANN storage path (m log2(codes) bits per
    vector instead of 4·d bytes).

    Deterministic codebook: the ``n_codes`` rows with the smallest
    md5(vec_id) are the codewords in every subspace (seeded-sample
    quantizer, no Lloyd iterations — same determinism boundary as
    :func:`cosine_knn_ivf`). Everything else is relational: explode the
    m subspaces, broadcast-join the m·n_codes codewords, argmin via
    MIN(STRUCT(dist, code)) — exact double comparisons on identically
    computed folds, so any engine replays it bit-for-bit. Error is
    emitted as floor(ppb), sidestepping ROUND's shortest-string edge
    cases."""
    e = _as_double_vec(emb, id_col, vec_col)
    dim_row = e.select(F.size("v").alias("d")).first()
    sub_d = int(dim_row["d"]) // m
    seeds = (
        e.select("vid", "v", F.md5(F.col("vid").cast("string")).alias("_h"))
        .orderBy("_h", "vid")
        .limit(n_codes)
        .select(F.col("vid").alias("cid"), F.col("v").alias("cv"))
    )
    ss = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s")
    sub = (
        e.select("vid", "v")
        .select("vid", "v", ss)
        .select(
            "vid", "s",
            F.slice(F.col("v"), F.col("s") * sub_d + 1, sub_d).alias("sv"),
        )
    )
    seedsub = (
        seeds.select("cid", "cv", ss)
        .select(
            "cid", "s",
            F.slice(F.col("cv"), F.col("s") * sub_d + 1, sub_d).alias("cw"),
        )
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        sub.join(F.broadcast(seedsub), "s")
        .select("vid", "s", F.struct(d2.alias("d2"), F.col("cid").alias("cid")).alias("dc"))
        .groupBy("vid", "s")
        .agg(F.min("dc").alias("dc"))
        .select("vid", "s", F.col("dc.cid").alias("code"), F.col("dc.d2").alias("d2"))
    )
    wide = best.groupBy("vid").agg(
        *[
            F.sum(F.when(F.col("s") == i, F.col("code"))).alias(f"code_{i}")
            for i in range(m)
        ],
        *[
            F.sum(F.when(F.col("s") == i, F.col("d2"))).alias(f"_d{i}")
            for i in range(m)
        ],
    )
    # error summed subspace 0..m-1 left-to-right — a PINNED addition
    # order, so any engine replays the floor(ppb) bit-for-bit (a
    # grouped SUM's accumulation order is engine-defined and a 1-ulp
    # difference can flip the floor at a grid boundary)
    err = F.col("_d0")
    for i in range(1, m):
        err = err + F.col(f"_d{i}")
    return wide.select(
        F.col("vid").alias("vec_id"),
        *[F.col(f"code_{i}") for i in range(m)],
        F.floor(err * F.lit(1e9)).cast("long").alias("err_ppb"),
    )


def cosine_radius(
    emb: DataFrame,
    radius: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int = 8,
    n_query_blocks: int | None = None,
) -> DataFrame:
    """Radius similarity search: every ordered pair (src, dst) with
    cosine distance ≤ radius (self pairs excluded) — the fixed-
    threshold dual of top-k search, the primitive behind near-duplicate
    sweeps at a quality bar rather than a count.

    Runs on the same (query-block × index-shard) GRID as
    :func:`cosine_knn_sharded` — NO driver collect, no index
    broadcast: each grid cell cogroups one query block against one
    index shard and scores it with a BLAS matmul over 1024-query
    sub-batches, so per-task memory is one shard + a 1024×shard
    distance block regardless of corpus size, and the grid is how a
    1000-executor cluster tunes parallelism. The kernel emits the RAW
    dot-product distance pre-filtered at ``radius + 5.01e-7`` (past
    half the 6-decimal rounding step, so no boundary pair is lost);
    rounding to 6 decimals and the threshold compare both happen
    JVM-side (``F.round`` is half-away-from-zero, matching the DuckDB
    oracle's ROUND, whereas ``np.round`` is half-to-even — same
    convention as ``supervised.py``), so the boundary decision replays
    identically on any engine and the result is grid-invariant."""
    import numpy as np

    if n_query_blocks is None:
        n_query_blocks = n_shards
    e = emb.select(id_col, vec_col)
    blocks = F.array(*[F.lit(b) for b in range(n_query_blocks)])
    shards = F.array(*[F.lit(s) for s in range(n_shards)])
    idx = e.select(
        F.explode(blocks).alias("qb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).alias("iid"),
        F.col(vec_col).alias("ivec"),
    )
    qrep = e.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_query_blocks)).cast("int").alias("qb"),
        F.explode(shards).alias("shard"),
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
    )

    def score(key, qp: pd.DataFrame, ip: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": [], "dst": [], "distance": []}).astype(
            {"src": "int64", "dst": "int64", "distance": "float64"}
        )
        if qp.empty or ip.empty:
            return empty
        i_ids = ip["iid"].to_numpy()
        im = np.array(ip["ivec"].tolist(), dtype=np.float64)
        im /= np.linalg.norm(im, axis=1, keepdims=True)
        im = im.T
        outs = []
        for lo in range(0, len(qp), 1024):
            qs = qp.iloc[lo : lo + 1024]
            q = np.array(qs["qvec"].tolist(), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            dist = 1.0 - qn @ im
            src = qs["qid"].to_numpy()
            take = (dist <= radius + 5.01e-7) & (i_ids[None, :] != src[:, None])
            rows, cols = np.nonzero(take)
            outs.append(
                pd.DataFrame(
                    {
                        "src": src[rows],
                        "dst": i_ids[cols],
                        "distance": dist[rows, cols],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    out = (
        qrep.groupBy("qb", "shard")
        .cogroup(idx.groupBy("qb", "shard"))
        .applyInPandas(score, "src long, dst long, distance double")
    )
    out = out.select(
        "src", "dst", F.round(F.col("distance"), 6).alias("distance")
    )
    return out.where(F.col("distance") <= radius)


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    radius: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic decontamination: flag corpus items whose embedding lies
    within cosine ``radius`` of ANY benchmark item — the
    embedding-space complement of n-gram decontamination
    (``dedup.decontaminate``), catching paraphrased test-set leakage
    that shingle overlap misses. Same scale asymmetry: the benchmark
    side is SMALL by construction, so it broadcasts (normalized,
    id-sorted) and the corpus streams through Arrow-batched BLAS —
    the 100 TB corpus never reshuffles.

    Emits per contaminated corpus item its closest benchmark hit:
    (vec_id, bench_id, distance[ROUND 6]) — numpy pre-filter
    over-captures by 5.01e-7 and the authoritative rounded compare
    happens JVM-side, like :func:`cosine_radius`; the closest-hit
    argmin uses the rounded distance with bench-id tie-break so it
    replays across engines."""
    import numpy as np

    spark = corpus.sparkSession
    pdf = benchmark.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
    o = np.argsort(ids)
    ids, m_n = ids[o], m_n[o]
    bc = spark.sparkContext.broadcast((ids, m_n))

    def score(batches):
        b_ids, b_m = bc.value
        for b in batches:
            if b.empty:
                continue
            q = np.array(b[vec_col].tolist(), dtype=np.float64)
            q_n = q / np.linalg.norm(q, axis=1, keepdims=True)
            dist = 1.0 - q_n @ b_m.T
            src = b[id_col].to_numpy()
            rows, cols = np.nonzero(dist <= radius + 5.01e-7)
            yield pd.DataFrame(
                {
                    "src": src[rows],
                    "bench_id": b_ids[cols],
                    "distance": dist[rows, cols],
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, "src long, bench_id long, distance double"
    )
    rd = cand.select(
        "src", "bench_id", F.round("distance", 6).alias("distance")
    ).where(F.col("distance") <= radius)
    w = Window.partitionBy("src").orderBy("distance", "bench_id")
    return (
        rd.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("src").alias(id_col), "bench_id", "distance")
    )
