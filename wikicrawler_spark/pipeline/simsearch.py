"""Similarity search over an embedding column (array<float>).

Three paths:
  * ``cosine_topk``       — brute-force exact top-k: broadcast the (small)
                            query set against the corpus, cosine via native
                            zip_with + aggregate (JVM-side), per-query top-k
                            window (WindowGroupLimit pushes the k down).
                            The baseline & verification path.
  * ``lsh_cosine_topk``   — random-hyperplane LSH (SimHash-for-angles,
                            Charikar 2002): P seeded hyperplanes give a
                            P-bit bucket per vector; candidates = same
                            bucket (plus optional 1-bit multiprobe); exact
                            cosine re-rank on candidates only. The 10^12-
                            scale path: the bucket equi-join replaces the
                            full cross product.
  * ``ivf_cosine_topk``   — inverted-file index (IVF-flat): a coarse
                            k-means quantizer assigns every corpus vector
                            to its nearest centroid; queries probe the
                            ``nprobe`` nearest centroid lists and re-rank
                            exactly. Training runs seeded Lloyd iterations
                            on a BOUNDED sample on the driver (standard
                            IVF practice — the codebook is tiny; the
                            corpus-side assignment is a broadcast matmul
                            per Arrow batch, fully distributed).

Bucketing uses ONE vectorized pandas UDF doing a numpy matmul per Arrow
batch (P×d hyperplane matrix broadcast) — batched linear algebra is the
right tool here; per-element Catalyst HOFs would be ~50x slower for this.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    """sqrt(sum(x^2)) — the exact subexpression _cosine folds, exposed so
    callers can attach it ONCE per vector row instead of re-running two
    interpreted HOF folds per candidate pair: norms depend only on the
    vector, and candidate sets run 100-1000x the vector count (measured
    3x on the pair-scoring stage). dot/(na*nb) with precomputed na/nb is
    the same float expression in the same fold order as _cosine — results
    are bitwise identical."""
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbours for every query vector.
    corpus: (id, vec); queries: (query_id, vec). Broadcast the query side —
    the corpus never shuffles. Returns (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    q = q.select("query_id", "qv", _norm(F.col("qv")).alias("__nq"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    c = c.select("neighbor_id", "cv", _norm(F.col("cv")).alias("__nc"))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")) \
        .withColumn("cos_sim",
                    F.round(_dot(F.col("qv"), F.col("cv"))
                            / (F.col("__nq") * F.col("__nc")), 6))
    rk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def train_ivf_centroids(df: DataFrame, *, n_centroids: int = 16,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        sample_cap: int = 100_000, iterations: int = 10,
                        seed: int = 42) -> np.ndarray:
    """Seeded Lloyd k-means on a bounded, deterministic sample: orderBy(id)
    + limit compiles to TakeOrderedAndProject (per-partition top-k + merge,
    no full shuffle), so the training set is stable across partitionings
    and bounded on the driver. Returns an L2-normalized (n_centroids, dim)
    codebook; cosine assignment = argmax dot with normalized centroids."""
    sample = np.stack([
        np.asarray(r[0], dtype=np.float64)
        for r in df.select(id_col, vec_col).orderBy(id_col)
        .limit(sample_cap).select(vec_col).collect()
    ])
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True),
                                 1e-12)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                              replace=False)]
    for _ in range(iterations):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def _ivf_assign_udf(cents: np.ndarray, top: int = 1):
    """Pandas UDF: vector -> array of its ``top`` nearest centroid ids
    (broadcast codebook, one matmul per Arrow batch)."""
    c = cents  # (k, dim), L2-normalized

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        order = np.argsort(-sims, axis=1)[:, :top]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return assign


def ivf_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_centroids: int = 16, nprobe: int = 4,
                    iterations: int = 10, seed: int = 42) -> DataFrame:
    """ANN top-k via IVF-flat: corpus vectors live in ONE centroid list
    each; queries probe their ``nprobe`` nearest lists; exact cosine
    re-rank on the probed candidates. The centroid equi-join bounds
    candidates to the probed lists' occupancy — never a cross product.
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    cents = train_ivf_centroids(corpus, n_centroids=n_centroids,
                                id_col=id_col, vec_col=vec_col,
                                iterations=iterations, seed=seed)
    c_assign = _ivf_assign_udf(cents, top=1)
    q_assign = _ivf_assign_udf(cents, top=nprobe)
    # explode_OUTER + null filter: a plain explode's inferred
    # `size(assign(v)) > 0` guard is extracted as its OWN ArrowEvalPython
    # node, so the assignment UDF ran twice per side (guide §4.4 shape).
    # Cell ids are never NULL, so the null check drops exactly the padding
    # rows of empty assignment arrays (which cannot occur anyway).
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
        .withColumn("__nc", _norm(F.col("cv")))  # once per vector (see _norm)
        .withColumn("cell", F.explode_outer(c_assign(F.col("cv"))))
        .filter(F.col("cell").isNotNull())
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
        .withColumn("__nq", _norm(F.col("qv")))
        .withColumn("cell", F.explode_outer(q_assign(F.col("qv"))))
        .filter(F.col("cell").isNotNull())
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_sim",
                    F.round(_dot(F.col("qv"), F.col("cv"))
                            / (F.col("__nq") * F.col("__nc")), 6))
    )
    rk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.4,
                              id_col: str = "vec_id", vec_col: str = "embedding",
                              method: str = "lsh", dim: int = 64,
                              n_planes: int = 4, n_tables: int = 16,
                              seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) with
    id_a < id_b and round(cos,6) >= threshold. The embedding-space member of
    the dedup family (exact / jaccard / minhash-LSH / simhash live in
    pipeline.dedup).

    method='exact'  all-pairs self-join (one side broadcast) — the
                    verification/oracle path, O(n^2): fine for a slice,
                    never for the corpus.
    method='lsh'    hyperplane-LSH blocked self-join: both sides bucketed by
                    the same seeded planes, candidates = pairs sharing any
                    (table, bucket), exact cosine verify on candidates only.
                    Collision prob per plane is 1-theta/pi, so defaults
                    (4 planes x 16 tables) give >=0.93 recall at cos=0.4 and
                    ->1 above it; raise n_planes to shrink candidate sets at
                    corpus scale (buckets per table = 2^n_planes).
    """
    c = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    # norms once per VECTOR row, not per candidate pair (see _norm)
    cn = c.select("id", "v", _norm(F.col("v")).alias("__n"))
    if method == "exact":
        a = cn.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                      F.col("__n").alias("__na"))
        b = cn.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                      F.col("__n").alias("__nb"))
        pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        bucketer = bucket_udf(dim, n_planes, n_tables, seed)
        # candidate generation runs on a SLIM (id, table, bucket) table —
        # the bucket self-join and the pair dedup shuffle ids only (the
        # ~dim*8-byte vectors would otherwise ride through both shuffles
        # n_tables times); vectors re-attach to the surviving pairs below
        # (AQE broadcasts the vector side when it fits)
        # posexplode_OUTER + pos-null filter: the inferred `size(buckets)>0`
        # generate guard is extracted as a SECOND ArrowEvalPython below the
        # filter, doubling the bucket UDF per join side (guide §4.4 shape).
        # localCheckpoint the slim (id, table, bucket) index so the bucket
        # UDF runs ONCE for the self-join instead of once per side — this
        # is the LSH index table a production system materializes anyway
        # (tiny vs the vectors: 3 ints/row x n_tables).
        t = (c.withColumn("buckets", bucketer(F.col("v")))
             .select("id",
                     F.posexplode_outer("buckets").alias("table_idx", "bucket"))
             .filter(F.col("table_idx").isNotNull())
             .localCheckpoint(eager=True))
        a = t.select(F.col("id").alias("id_a"), "table_idx", "bucket")
        b = t.select(F.col("id").alias("id_b"), "table_idx", "bucket")
        pairs = (
            a.join(b, ["table_idx", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .join(cn.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                            F.col("__n").alias("__na")), "id_a")
            .join(cn.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                            F.col("__n").alias("__nb")), "id_b")
        )
    else:
        raise ValueError(f"unknown method {method!r} (exact|lsh)")
    return (
        pairs.withColumn("cos_sim",
                         F.round(_dot(F.col("va"), F.col("vb"))
                                 / (F.col("__na") * F.col("__nb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def bucket_udf(dim: int, n_planes: int = 6, n_tables: int = 8, seed: int = 42):
    """Pandas UDF: embedding -> array of n_tables packed sign-bit buckets
    (one per LSH table; independent seeded hyperplane sets). One numpy
    matmul against the stacked (n_tables*n_planes, dim) matrix per Arrow
    batch."""
    planes = np.concatenate(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        bits = (m @ planes.T) > 0  # (batch, n_tables*n_planes)
        per_table = bits.reshape(len(m), -1, len(weights)) @ weights
        return pd.Series(list(per_table))

    return bucket


def lsh_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int = 64, n_planes: int = 6, n_tables: int = 8,
                    seed: int = 42, multiprobe: bool = True) -> DataFrame:
    """ANN top-k: multi-table hyperplane-LSH bucket equi-join + exact cosine
    re-rank on candidates. Candidates = same (table, bucket) in ANY of the
    n_tables independent tables; with multiprobe each QUERY also probes the
    n_planes hamming-1 buckets per table. Join key is (table_idx, bucket) —
    always an equi-join, never a cross product. Tune (n_planes, n_tables)
    for the recall/candidate-rate trade (P up => fewer candidates, L up =>
    higher recall)."""
    bucketer = bucket_udf(dim, n_planes, n_tables, seed)
    # posexplode_OUTER + pos-null filter on both sides: the inferred
    # `size(buckets) > 0` generate guard is otherwise extracted as a second
    # ArrowEvalPython, doubling the bucket UDF per side (guide §4.4 shape).
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
        .withColumn("__nc", _norm(F.col("cv")))  # once per vector (_norm)
        .withColumn("buckets", bucketer(F.col("cv")))
        .select("neighbor_id", "cv", "__nc",
                F.posexplode_outer("buckets").alias("table_idx", "bucket"))
        .filter(F.col("table_idx").isNotNull())
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
        .withColumn("__nq", _norm(F.col("qv")))
        .withColumn("buckets", bucketer(F.col("qv")))
        .select("query_id", "qv", "__nq",
                F.posexplode_outer("buckets").alias("table_idx", "bucket0"))
        .filter(F.col("table_idx").isNotNull())
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
    else:
        probes = F.array(F.col("bucket0"))
    qp = q.select("query_id", "qv", "__nq", "table_idx",
                  F.explode(probes).alias("bucket"))
    scored = (
        c.join(F.broadcast(qp), ["table_idx", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_sim",
                    F.round(_dot(F.col("qv"), F.col("cv"))
                            / (F.col("__nq") * F.col("__nc")), 6))
    )
    rk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
