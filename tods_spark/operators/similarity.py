"""Similarity search over embedding columns (driver mandate): brute-force
cosine top-k as the exact baseline, random-hyperplane-LSH bucketing as the
scale path, cosine near-dup pairs for dedup.

Spark-first design notes:
  * dot products / norms are `F.aggregate` / `F.zip_with` expressions —
    JVM-side, codegen'd, no Python;
  * the LSH path broadcasts a deterministic (seeded) hyperplane matrix and
    computes signatures in ONE vectorized Arrow UDF (matrix multiply per
    batch), then candidates come from an equi-join on the bucket key —
    shuffle volume is |docs| rows of (id, bucket), never |docs|² pairs;
  * top-k uses a Window rank on the (tiny) candidate set, or on the full
    cross product only in the exact baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") ** 2)
    )


def cosine_topk_bruteforce(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. One scan, then
    orderBy+limit — Catalyst plans it as TakeOrderedAndProject: every
    partition keeps a local k-heap and the driver merges k·#partitions
    rows. (A row_number over a global no-partition Window would funnel ALL
    scored rows through one task — a scale-killer at 10⁹ vectors.) The rank
    column is attached afterwards with a window over the k-row result."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(query_vec))
    scored = df.select(
        F.col(id_col),
        F.round(
            _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
            + F.lit(1e-9),
            4,
        ).alias("cosine"),
    )
    top = scored.orderBy(F.desc("cosine"), id_col).limit(k)
    w = Window.orderBy(F.desc("cosine"), id_col)  # k rows only
    return top.withColumn("rk", F.row_number().over(w)).select(
        id_col, "cosine", "rk"
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic hyperplane matrix (n_planes × dim). Exposed so the
    oracle SQL can inline the SAME constants as literals — the twin then
    recomputes identical buckets (sign flips would need |H·v| within ulps
    of 0, probability ~0 for Gaussian planes)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signatures: bucket = sign-bit pattern of H·v.
    H is seeded and broadcast; one Arrow-batch matmul per partition."""
    planes = hyperplanes(dim, n_planes, seed)

    @F.pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        signs = (M @ planes.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(signs @ weights)

    return df.select(id_col, vec_col, bucket(vec_col).alias("bucket"))


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_planes: int = 12,
    probes: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: rank only vectors whose bucket matches the query's bucket
    (multi-probe: also buckets at Hamming distance < `probes` from it).
    Recall/probe trade-off is asserted in tests against the brute-force
    baseline."""
    q = np.asarray(query_vec, float)
    planes = hyperplanes(len(q), n_planes, seed)
    qsig = int(((planes @ q) > 0) @ (1 << np.arange(n_planes, dtype=np.int64)))
    # multi-probe: visit every bucket within Hamming distance `probes` of the
    # query's bucket (probes=1 → n+1 buckets, probes=2 → +C(n,2), ...)
    from itertools import combinations

    probe_buckets = {qsig}
    for r in range(1, probes + 1):
        for bits in combinations(range(n_planes), r):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probe_buckets.add(qsig ^ flip)
    sigs = lsh_signatures(df, len(q), n_planes, seed, id_col, vec_col)
    cand = sigs.filter(F.col("bucket").isin(list(probe_buckets)))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    bands: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED LSH self-join: the
    signature splits into `bands` independent bands; a pair is a candidate
    if ANY band collides (recall amplification — a truly-close pair only
    misses if every band is split by a boundary plane). Candidate shuffle is
    |docs|·bands rows; the pair blowup stays inside buckets."""
    assert n_planes % bands == 0
    width = n_planes // bands
    dim = len(df.select(vec_col).first()[0])
    sigs = lsh_signatures(df, dim, n_planes, seed, id_col, vec_col)
    banded = sigs.select(
        id_col,
        vec_col,
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("bucket"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))  # sign-safe (vs `%`)
                for i in range(bands)
            ])
        ).alias("band", "bits"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bits") == F.col("b.bits"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col(f"a.{vec_col}").alias("va"),
        F.col(f"b.{vec_col}").alias("vb"),
    ).dropDuplicates(["id_a", "id_b"])
    scored = pairs.withColumn(
        "cosine",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
            + F.lit(1e-9),
            4,
        ),
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse-quantizer assignment: nearest centroid per vector by
    ROUNDED (4 dp) cosine, ties to the smallest list id — rounding makes
    the argmin stable across engines (the same convention every oracle
    twin uses for ordering). The centroid table is inlined as LITERAL
    struct arrays and the argmin is a single expression fold, so
    assignment is a ZERO-SHUFFLE projection over the scan — exactly
    FAISS's shape (centroids resident, one pass assigns); only the tiny
    centroid list ever leaves the driver."""
    cent_arr = F.array(*[
        F.struct(
            F.lit(int(cid)).alias("list_id"),
            F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"),
        )
        for cid, cvec in centroids
    ])
    v = F.col(vec_col)

    def ccos(c):
        return F.round(
            _dot(v, c["cvec"]) / (_norm(v) * _norm(c["cvec"])) + F.lit(1e-9),
            4,
        )

    acc0 = F.struct(
        F.lit(float("-inf")).alias("best"), F.lit(-1).alias("list_id")
    )
    best = F.aggregate(
        cent_arr,
        acc0,
        lambda a, c: F.when(
            ccos(c) > a["best"],
            F.struct(ccos(c).alias("best"), c["list_id"].alias("list_id")),
        ).otherwise(a),
    )
    return df.withColumn("list_id", best["list_id"])


def kmeans_codebook(
    df: DataFrame,
    nlist: int = 8,
    train_n: int = 128,
    iters: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Train the IVF coarse codebook: seeded deterministic Lloyd k-means
    over a BOUNDED HASH-ORDERED sample — the ``train_n`` rows with the
    smallest ``md5(id)`` (ties by id). md5-ordering is as deterministic
    and twinnable as ``id < train_n`` but corpus-order-UNBIASED: ids
    correlate with ingest order (crawl shard, date), so a prefix sample
    would train the codebook on one corner of the corpus and cost ANN
    recall at real scale; a hash order is an implicit uniform shuffle.
    The sample plans as TakeOrderedAndProject (per-task top-train_n,
    driver merge — no global sort). Strided init centroid
    c = sample[(c*m)//k] over the sample SORTED BY ID — the same
    deterministic init the CBLOF twin already replays in SQL — then
    ``iters`` fixed Lloyd steps: assign by ROUNDED (4 dp, +1e-9 nudge)
    cosine with ties to the smallest list id (np.argmax first-wins == the
    twin's list_position-of-max), update = float64 elementwise mean of
    assigned vectors, empty cluster keeps its previous centroid. Fixed
    iteration count (not a convergence test) so the DuckDB twin can
    unroll the identical recursion. Returns centroids sorted by list_id —
    the deterministic ordering ivf_assign's first-max tie-break
    requires."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(train_n)
        .collect()
    )  # bounded collect: <= train_n rows (codebook training sample)
    rows.sort(key=lambda r: r[id_col])
    x = np.array([[float(v) for v in r[vec_col]] for r in rows],
                 dtype=np.float64)
    m = x.shape[0]
    k = min(nlist, m)
    cent = x[[(c * m) // k for c in range(k)]].copy()
    xn = np.sqrt((x * x).sum(axis=1))
    for _ in range(iters):
        cn = np.sqrt((cent * cent).sum(axis=1))
        cos = np.round(x @ cent.T / (xn[:, None] * cn[None, :]) + 1e-9, 4)
        assign = cos.argmax(axis=1)  # first max -> smallest list id
        for c in range(k):
            pts = x[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    return [(c, [float(v) for v in cent[c]]) for c in range(k)]


def ann_topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_n: int = 128,
    iters: int = 20,
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) coarse partition — the second
    scale path next to ann_topk_lsh: train a ``nlist``-centroid codebook
    (kmeans_codebook — deterministic strided-init Lloyd over a bounded
    sample), assign every vector to its nearest centroid, then rank ONLY
    the vectors in the query's ``nprobe`` closest lists. Probe selection
    scores the query against the nlist-row codebook driver-side with the
    same rounded-cosine / smallest-list-id convention as assignment
    (FAISS's shape: the codebook is metadata, only vector scans
    distribute)."""
    centroids = kmeans_codebook(df, nlist, train_n, iters, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())
    scored = []
    for cid, cvec in centroids:
        c = np.asarray(cvec, dtype=np.float64)
        ccos = float(np.round(
            q @ c / (qn * np.sqrt((c * c).sum())) + 1e-9, 4))
        scored.append((-ccos, cid))
    probe_ids = [cid for _, cid in sorted(scored)[:nprobe]]
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("list_id").isin(probe_ids))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def semdedup_pairs(
    df: DataFrame,
    tau: float = 0.95,
    nlist: int = 8,
    train_n: int = 128,
    iters: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) semantic near-
    duplicate pairs: k-means-cluster the embedding space with the IVF
    codebook (kmeans_codebook — the same trained coarse quantizer the ANN
    path uses), then compare vectors PAIRWISE ONLY WITHIN each cluster
    and emit pairs whose rounded cosine >= ``tau``. The cluster stage is
    what makes semantic dedup tractable: the quadratic is confined to
    cluster populations, never the corpus.

    Scale shape: codebook training is a bounded collect (<= train_n
    rows); assignment is the zero-shuffle literal-centroid projection
    (ivf_assign); the self-join shuffles on ``list_id`` once. Cluster
    population bounds the quadratic — at corpus scale nlist is chosen
    ~ N / desired_cluster_size (SemDeDup's paper setting: 50k clusters
    for LAION-440M, i.e. ~10^4 per cluster), so per-reducer work stays
    ~cluster_size^2 regardless of N; AQE skew-split handles an
    over-popular centroid. The emitted pair list is the (small) near-dup
    fraction, not a relabeling of the corpus."""
    centroids = kmeans_codebook(df, nlist, train_n, iters, id_col, vec_col)
    assigned = ivf_assign(df, centroids, id_col, vec_col).select(
        id_col, vec_col, "list_id"
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    va, vb = F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")
    cos = F.round(
        _dot(va, vb) / (_norm(va) * _norm(vb)) + F.lit(1e-9), 4
    )
    return (
        a.join(
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.list_id").alias("cluster_id"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= tau)
    )
