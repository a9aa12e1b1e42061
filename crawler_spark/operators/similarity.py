"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline. Dot
  products via zip_with/aggregate built-ins (JVM, codegen); ranking via a
  window. Queries are broadcast (the small side by construction).
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets; only
  same-bucket pairs are scored. Sub-quadratic: the self-join key is the
  bucket id, uniform by construction. Recall vs brute force is checked in
  tests (multi-probe over Hamming-1 neighbor buckets lifts recall).

Hyperplanes are generated deterministically (numpy PCG64, fixed seed) on
the driver and inlined as literal arrays — no RNG inside the plan, so the
same plan is produced on every run (resume/parity safe).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y),"
        " 0D, (acc, v) -> acc + v)"
    )


def _norm(v: str):
    return F.expr(
        f"sqrt(aggregate(zip_with({v}, {v}, (x, y) -> cast(x as double) * y),"
        " 0D, (acc, v) -> acc + v))"
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, cosine). Self-matches excluded.
    Ties broken by neighbor id for full determinism.
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cnrm"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("qnrm"),
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot("qvec", "cvec") / (F.col("qnrm") * F.col("cnrm")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def bucket_col(vec_col: str, planes: list[list[float]]):
    """Sign-LSH bucket id: bit i = round(vec · plane_i, 6) >= 0. Pure
    built-ins — each plane is a literal array; dot via zip_with/aggregate.

    The sign is taken on the ROUNDED dot product: Spark's sequential fold
    and DuckDB's list_inner_product can differ in the last ulps, and an
    unrounded sign flip at dot ≈ 0 would silently change a bucket id. At
    6 dp both engines agree bit-for-bit (the same rounding that keeps the
    cosine oracles exact), so the bucket assignment is cross-engine
    deterministic."""
    bits = []
    for i, p in enumerate(planes):
        # :.6f — plain decimal (never scientific notation): the identical
        # literal string is embedded in the DuckDB oracle SQL, so both
        # engines parse the exact same double.
        arr = "array(" + ",".join(f"{x:.6f}D" for x in p) + ")"
        bits.append(
            f"shiftleft(if(round(aggregate(zip_with({vec_col}, {arr},"
            f" (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v), 6) >= 0D,"
            f" 1L, 0L), {i})"
        )
    return F.expr(" + ".join(bits))


def probe_buckets(n_planes: int, bucket_col_name: str = "bucket"):
    """Multiprobe set for a bucket column: the bucket itself plus all
    Hamming-1 neighbor buckets (n_planes+1 probes), deduplicated."""
    return F.expr(
        f"array_union(array({bucket_col_name}),"
        f" transform(sequence(0, {n_planes - 1}),"
        f" i -> cast({bucket_col_name} as bigint) ^ shiftleft(1L, i)))"
    )


def ivf_centroids(dim: int, k: int = 8, seed: int = 99) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids (numpy PCG64, fixed seed),
    rounded to 6 dp and inlined as literals — no RNG and no training step
    inside the plan, so the same plan is produced on every run. A real
    deployment would k-means these offline; the cell-assignment and probe
    machinery below is unchanged either way."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((k, dim)).round(6).tolist()


def ivf_assign(df: DataFrame, centroids: list[list[float]], nprobe: int,
               id_alias: str, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(id, vec, nrm, cell): the ``nprobe`` nearest coarse cells per vector
    by ROUNDED centroid dot product (cross-engine-stable, ties broken by
    cell index). Relational formulation — posexplode + row_number — so the
    DuckDB oracle renders the identical argmax semantics."""
    dots = F.array(*[
        F.round(
            F.expr(
                f"aggregate(zip_with({vec_col}, array("
                + ",".join(f"{x:.6f}D" for x in c)
                + "), (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
            ),
            6,
        )
        for c in centroids
    ])
    base = df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias("vec"),
        _norm(vec_col).alias("nrm"),
        F.posexplode(dots).alias("cell", "cdot"),
    )
    w = Window.partitionBy(id_alias).orderBy(F.desc("cdot"), F.asc("cell"))
    return (
        base.withColumn("_crk", F.row_number().over(w))
        .filter(F.col("_crk") <= nprobe)
        .drop("_crk", "cdot")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    dim: int = 64,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate cosine top-k — the inverted-file alternative
    to sign-LSH: corpus vectors live in their single nearest coarse cell;
    each query probes its ``nprobe`` nearest cells; only same-cell pairs
    are scored exactly. Sub-quadratic via a pure equi-join on the cell id;
    deterministic literal centroids → exact DuckDB oracle."""
    cents = ivf_centroids(dim, n_cells, seed)
    corpus = ivf_assign(emb, cents, 1, "neighbor_id", vec_col, id_col).select(
        "neighbor_id", F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"), "cell",
    )
    qs = ivf_assign(queries, cents, nprobe, "query_id", vec_col, id_col).select(
        "query_id", F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"), "cell",
    )
    scored = (
        corpus.join(F.broadcast(qs), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot("qvec", "cvec") / (F.col("qnrm") * F.col("cnrm")), 6),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only (query, corpus) pairs whose LSH
    buckets match; with multiprobe, also the query bucket's Hamming-1
    neighbors (probing 1+n_planes buckets per query)."""
    planes = hyperplanes(dim, n_planes, seed)
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cnrm"),
        bucket_col(vec_col, planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("qnrm"),
        bucket_col(vec_col, planes).alias("qbucket"),
    )
    if multiprobe:
        probes = probe_buckets(n_planes, "qbucket")
    else:
        probes = F.array(F.col("qbucket"))
    qs = qb.select(
        "query_id", "qvec", "qnrm", F.explode(probes).alias("bucket")
    )
    scored = (
        corpus.join(F.broadcast(qs), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot("qvec", "cvec") / (F.col("qnrm") * F.col("cnrm")), 6),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
