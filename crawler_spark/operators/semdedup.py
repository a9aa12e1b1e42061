"""SemDeDup: semantic deduplication over an embedding column.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): k-means-cluster the embedding
space, then inside each cluster compute pairwise cosine similarities and
drop every document that is within ``tau`` of a *more peripheral* document
(the paper keeps the example with the LOWEST cosine similarity to the
cluster centroid; the reference implementation realizes that as an
upper-triangular max over the cluster sorted by centroid-similarity).

Determinism / cross-engine exactness (the house rules — same posture as
``operators/linkgraph.py`` fixed-point PageRank):

- **Fixed-point Lloyd iterations.** Embeddings and centroids live in
  integer micros (``floor(x * 1e6 + 0.5)``); squared distances are exact
  ``bigint`` sums (order-free under any partitioning) and centroid updates
  are ``floor(sum / count)`` computed as EXACT integer floor division on
  both sides (Python ``//`` on exact ints; in SQL a mod-adjusted ``//``,
  since DuckDB's ``//`` truncates toward zero on integers) — never
  through a double, whose 53-bit mantissa would double-round once |sum|
  exceeds 2^53.  So every Lloyd round is bit-identical in Spark and in
  the unrolled DuckDB oracle, at any parallelism and any magnitude.
  Ties in the argmin go to the lowest cell index.
- **Assignment is map-side.** Centroids are inlined as literals, the
  argmin is ``array_position(d, array_min(d))`` — zero shuffles per
  assignment. The per-round centroid update is ONE partial-agg groupBy of
  k×dim integer sums; only the k centroid rows (k × dim ints — bounded by
  k, never by data) return to the driver between rounds, the same
  "one-row scalar" posture the PageRank operator uses. At production k
  (the paper runs 50k clusters on LAION) the literal inlining becomes a
  broadcast join / broadcast pandas UDF with the identical argmin
  semantics; the plan shape is unchanged.
- **Cosines are rounded doubles** (6 dp, ties broken by vec id), the same
  convention the sign-LSH / IVF operators already carry through their
  DuckDB oracles.

Scale posture (100 TB): the pairwise stage is an equi-self-join on the
cluster id — SemDeDup's own cost model: k grows with the corpus so the
per-cluster population (and the quadratic term) stays bounded; no
cartesian, no BroadcastNestedLoopJoin, no driver materialization of data
rows. Reference capability anchored: the reference crawler dedups on
exact ``request_url`` only (middlewares.py:44-57); this is the
embedding-space analogue a training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def init_centroids_micros(dim: int, k: int = 8, seed: int = 7,
                          scale: float = 0.2) -> list[list[int]]:
    """Deterministic k-means init (numpy PCG64, fixed seed) in integer
    micros. A real deployment would seed from k-means++ samples; the Lloyd
    rounds below converge from any fixed init and the whole point here is
    that the init is a literal both engines share."""
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((k, dim)) * scale
    return [[int(np.floor(v * MICRO + 0.5)) for v in row] for row in pts]


def _micros_col(vec_col: str):
    return F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double) * 1000000.0"
        " + 0.5) as bigint))"
    )


def _dist_expr(cent: list[int]) -> str:
    lits = ",".join(f"{v}L" for v in cent)
    return (
        f"aggregate(zip_with(em, array({lits}), (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )


def _assign_cell(df: DataFrame, cents: list[list[int]]) -> DataFrame:
    """Map-side argmin cell assignment: ties to the LOWEST cell index
    (array_position returns the first match)."""
    darr = F.array(*[F.expr(_dist_expr(c)) for c in cents])
    return df.withColumn("_d", darr).withColumn(
        "cell",
        (F.expr("array_position(_d, array_min(_d))") - F.lit(1)).cast("int"),
    ).drop("_d")


def kmeans_fixed_point(
    emb: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[int]]]:
    """``iters`` Lloyd rounds from the literal init; returns the FINAL
    assignment frame ``(id, em: array<bigint> micros, cell)`` against the
    post-update centroids, plus those centroids (micros). Empty cells keep
    their previous centroid (coalesce — same rule in the SQL oracle)."""
    # Materialize the micros frame once (same eager-superstep idiom as
    # operators/linkgraph.py): every Lloyd round AND the downstream pair
    # join re-reads it, and without the checkpoint each job re-runs the
    # scan + micros transform from the source.
    base = emb.select(
        F.col(id_col).alias("_id"), _micros_col(vec_col).alias("em")
    ).localCheckpoint(eager=True)
    cents = init_centroids_micros(dim, k, seed)
    for _ in range(iters):
        assigned = _assign_cell(base, cents)
        sums = [F.sum(F.col("em").getItem(i)).alias(f"s{i}")
                for i in range(dim)]
        upd = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"),
                                           *sums)
        # k rows × dim ints back to the driver — bounded by k, not by data.
        new = {
            # Exact integer floor division (Python // on exact ints; n>0)
            # — never float: a bigint sum past 2^53 would double-round
            # and break bit-parity with the integer-division oracle.
            int(r["cell"]): [int(r[f"s{i}"]) // int(r["n"])
                             for i in range(dim)]
            for r in upd.collect()
        }
        cents = [new.get(j, cents[j]) for j in range(k)]
    return _assign_cell(base, cents), cents


def semdedup(
    emb: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.7,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup keep/drop labels: ``(id, cell, cos_centroid, keep)``.

    A document is dropped when its cluster holds an EARLIER document (by
    the keep-priority order: centroid-cosine ASC — most peripheral first,
    the paper's keep rule — then id ASC) with pairwise cosine ≥ ``tau``.
    That is exactly the reference implementation's upper-triangular
    max-similarity test, expressed as one within-cluster equi-join."""
    assigned, cents = kmeans_fixed_point(
        emb, dim=dim, k=k, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    cvec = F.array(*[
        F.array(*[F.lit(v / MICRO).cast("double") for v in c])
        for c in cents
    ])
    ed = F.expr("transform(em, x -> cast(x as double) / 1000000.0)")
    labeled = assigned.select(
        "_id", "cell",
        ed.alias("e"),
        F.element_at(cvec, F.col("cell") + 1).alias("cv"),
    ).select(
        "_id", "cell", "e",
        F.round(
            F.expr("aggregate(zip_with(e, cv, (x, y) -> x * y), 0D,"
                   " (acc, v) -> acc + v)")
            / (
                F.sqrt(F.expr("aggregate(transform(e, x -> x * x), 0D,"
                              " (acc, v) -> acc + v)"))
                * F.sqrt(F.expr("aggregate(transform(cv, x -> x * x), 0D,"
                                " (acc, v) -> acc + v)"))
            ),
            6,
        ).alias("cos_centroid"),
    )
    a = labeled.select("cell", F.col("_id").alias("_ida"),
                       F.col("e").alias("ea"),
                       F.col("cos_centroid").alias("ca"))
    b = labeled.select("cell", F.col("_id").alias("_idb"),
                       F.col("e").alias("eb"),
                       F.col("cos_centroid").alias("cb"))
    pair_cos = F.round(
        F.expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D,"
               " (acc, v) -> acc + v)")
        / (
            F.sqrt(F.expr("aggregate(transform(ea, x -> x * x), 0D,"
                          " (acc, v) -> acc + v)"))
            * F.sqrt(F.expr("aggregate(transform(eb, x -> x * x), 0D,"
                            " (acc, v) -> acc + v)"))
        ),
        6,
    )
    dropped = (
        a.join(b, on="cell")
        .filter(
            (F.col("cb") < F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("_idb") < F.col("_ida")))
        )
        .filter(pair_cos >= F.lit(tau))
        .select(F.col("_ida").alias("_id"))
        .distinct()
    )
    return (
        labeled.join(dropped.withColumn("_drop", F.lit(True)),
                     on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "cell",
            "cos_centroid",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def semdedup_sql(
    table: str = "embeddings",
    dim: int = 64,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.7,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The DuckDB oracle: the SAME fixed-point Lloyd rounds unrolled as
    CTEs (integer micros, floor division, ties to lowest cell), then the
    same within-cluster dominated-pair rule."""
    cents = init_centroids_micros(dim, k, seed)
    c0_vals = ", ".join(
        f"({j}, [{', '.join(str(v) for v in c)}]::bigint[])"
        for j, c in enumerate(cents)
    )
    assign = lambda name, csrc: f"""{name} AS (
          SELECT id, cell FROM (
            SELECT e.id, c.cell,
                   sum((e.em[t.i] - c.c[t.i]) * (e.em[t.i] - c.c[t.i])) AS d
            FROM em e CROSS JOIN {csrc} c CROSS JOIN range(1, {dim + 1}) t(i)
            GROUP BY 1, 2)
          QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cell) = 1)"""
    parts = [
        f"""em AS (
          SELECT {id_col} AS id,
                 list_transform({vec_col}::double[],
                   x -> cast(floor(x * 1000000.0 + 0.5) as bigint)) AS em
          FROM {table}),
        c0(cell, c) AS (VALUES {c0_vals})"""
    ]
    for r in range(iters):
        parts.append(assign(f"a{r}", f"c{r}"))
        parts.append(f"""u{r} AS (
          SELECT a.cell, t.i,
                 cast((sum(e.em[t.i])
                       - ((sum(e.em[t.i]) % count(*) + count(*))
                          % count(*))) // count(*) as bigint)
                   AS cv
          FROM a{r} a JOIN em e USING (id)
          CROSS JOIN range(1, {dim + 1}) t(i)
          GROUP BY 1, 2),
        c{r + 1} AS (
          SELECT cell, list(cv ORDER BY i) AS c FROM u{r} GROUP BY cell
          UNION ALL
          SELECT cell, c FROM c{r}
          WHERE cell NOT IN (SELECT cell FROM u{r}))""")
    parts.append(assign("afin", f"c{iters}"))
    parts.append(f"""lab AS (
          SELECT a.id, a.cell,
                 list_transform(e.em, x -> x / 1000000.0) AS ed,
                 list_transform(c.c, x -> x / 1000000.0) AS cd
          FROM afin a JOIN em e USING (id) JOIN c{iters} c USING (cell)),
        scored AS (
          SELECT id, cell, ed,
                 round(list_inner_product(ed, cd)
                       / (sqrt(list_inner_product(ed, ed))
                          * sqrt(list_inner_product(cd, cd))), 6)
                   AS cos_centroid
          FROM lab),
        dropped AS (
          SELECT DISTINCT a.id
          FROM scored a JOIN scored b
            ON a.cell = b.cell
           AND (b.cos_centroid < a.cos_centroid
                OR (b.cos_centroid = a.cos_centroid AND b.id < a.id))
          WHERE round(list_inner_product(a.ed, b.ed)
                      / (sqrt(list_inner_product(a.ed, a.ed))
                         * sqrt(list_inner_product(b.ed, b.ed))), 6)
                >= {tau})"""
    )
    ctes = ",\n        ".join(parts)
    return f"""
        WITH {ctes}
        SELECT s.id AS {id_col}, cast(s.cell AS int) AS cell,
               s.cos_centroid,
               (d.id IS NULL) AS keep
        FROM scored s LEFT JOIN dropped d ON s.id = d.id
        ORDER BY s.id
    """
