"""SemDeDup (operators/semdedup.py): fixed-point Lloyd k-means + within-
cluster peripheral-first cosine pruning (Abbas et al. 2023). Verifies the
Spark plan against an independent pure-numpy reference, the keep rule's
semantics, and determinism under repartitioning."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.semdedup import (
    MICRO,
    init_centroids_micros,
    kmeans_fixed_point,
    semdedup,
)

DIM = 8


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _py_semdedup(vecs, k, iters, tau, seed):
    """Independent reference: same fixed-point arithmetic in plain numpy
    loops (no shared code with the operator's column expressions)."""
    em = np.floor(np.asarray(vecs, dtype=np.float64) * MICRO + 0.5).astype(
        np.int64
    )
    cents = np.array(init_centroids_micros(DIM, k, seed), dtype=np.int64)

    def assign(c):
        d = ((em[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # argmin takes the first (lowest cell) tie

    for _ in range(iters):
        a = assign(cents)
        for j in range(k):
            m = a == j
            if m.any():
                cents[j] = np.floor(
                    em[m].sum(axis=0, dtype=np.int64) / m.sum()
                ).astype(np.int64)
    cell = assign(cents)
    ed = em / float(MICRO)
    cd = cents / float(MICRO)
    nrm = np.sqrt((ed * ed).sum(axis=1))
    cnrm = np.sqrt((cd * cd).sum(axis=1))
    cos_c = np.round(
        (ed * cd[cell]).sum(axis=1) / (nrm * cnrm[cell]), 6
    )
    n = len(vecs)
    keep = np.ones(n, dtype=bool)
    order = sorted(range(n), key=lambda i: (cos_c[i], i))
    for pos, i in enumerate(order):
        for j in order[:pos]:
            if cell[j] != cell[i]:
                continue
            pc = round(float(ed[i] @ ed[j] / (nrm[i] * nrm[j])), 6)
            if pc >= tau:
                keep[i] = False
                break
    return cell, cos_c, keep


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(123)
    base = rng.standard_normal((40, DIM)) * 0.3
    # plant three near-duplicate groups (tiny jitter → cosine ≈ 1)
    dups = []
    for g in range(3):
        v = base[g]
        for _ in range(3):
            dups.append(v + rng.standard_normal(DIM) * 0.003)
    return np.vstack([base, dups]).round(5)


def test_semdedup_matches_python_reference(spark, vecs):
    out = (
        semdedup(_emb_df(spark, vecs), dim=DIM, k=4, iters=2, tau=0.9,
                 seed=7)
        .orderBy("vec_id")
        .collect()
    )
    cell, cos_c, keep = _py_semdedup(vecs, k=4, iters=2, tau=0.9, seed=7)
    assert [r.cell for r in out] == cell.tolist()
    assert [r.cos_centroid for r in out] == [pytest.approx(c, abs=1e-9)
                                             for c in cos_c]
    assert [r.keep for r in out] == keep.tolist()
    # the planted duplicate groups actually lost members
    assert sum(1 for r in out if not r.keep) >= 3


def test_semdedup_keeps_most_peripheral(spark):
    """Within one duplicate clique, the survivor is the doc with the LOWEST
    centroid cosine (the paper's keep rule), ties to the lowest id."""
    v = np.zeros((3, DIM))
    v[:, 0] = [1.0, 0.98, 0.96]  # identical direction, decreasing pull
    v[:, 1] = 0.02
    out = {
        r.vec_id: r
        for r in semdedup(_emb_df(spark, v), dim=DIM, k=2, iters=1,
                          tau=0.99, seed=7).collect()
    }
    cells = {r.cell for r in out.values()}
    assert len(cells) == 1  # one clique, one cluster
    kept = [i for i, r in out.items() if r.keep]
    peripheral = min(out, key=lambda i: (out[i].cos_centroid, i))
    assert kept == [peripheral]


def test_semdedup_deterministic_under_partitioning(spark, vecs):
    df = _emb_df(spark, vecs)
    a = semdedup(df.repartition(1), dim=DIM, k=4, iters=2, tau=0.9,
                 seed=7).orderBy("vec_id").collect()
    b = semdedup(df.repartition(7, "vec_id"), dim=DIM, k=4, iters=2,
                 tau=0.9, seed=7).orderBy("vec_id").collect()
    assert a == b


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """Two tight blobs, k=4: the unpopulated cells must carry their init
    centroids through (coalesce rule) without error."""
    rng = np.random.default_rng(5)
    v = np.vstack([
        rng.standard_normal((10, DIM)) * 0.01 + 0.5,
        rng.standard_normal((10, DIM)) * 0.01 - 0.5,
    ])
    assigned, cents = kmeans_fixed_point(
        _emb_df(spark, v), dim=DIM, k=4, iters=2, seed=7
    )
    assert len(cents) == 4
    assert assigned.select("cell").distinct().count() <= 4
    init = init_centroids_micros(DIM, 4, 7)
    assert any(c == i for c, i in zip(cents, init))  # some cell stayed empty


def test_semdedup_plan_shape(spark, vecs):
    """No per-row Python, no cartesian product: the pair stage is an
    equi-join on the cluster id."""
    plan = semdedup(_emb_df(spark, vecs), dim=DIM, k=4, iters=2,
                    tau=0.9, seed=7)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
