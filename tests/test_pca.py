"""Power-iteration top direction (operators/pca.py): numpy-mirror parity,
partitioning invariance, and convergence toward the true eigenvector."""

import numpy as np
from conftest import SF_DIR

from co_new_spark.operators.kmeans import quantize
from co_new_spark.operators.pca import SCALE, top_direction

D, T = 64, 8


def _mirror(Q, rounds):
    """Independent integer reimplementation: floor-mean centering, exact
    scatter, max-normalized matrix, unrolled integer power iteration."""
    mu = np.floor(Q.sum(0) / len(Q)).astype(np.int64)
    C = Q - mu
    S = C.T @ C  # exact: int64 within documented headroom
    mx = np.abs(S).max()
    Sn = np.floor(S.astype(np.float64) * SCALE / mx).astype(np.int64)
    v = np.full(D, SCALE, dtype=np.int64)
    for _ in range(rounds):
        w = Sn @ v
        m = np.abs(w).max()
        v = np.floor(w.astype(np.float64) * SCALE / m).astype(np.int64)
    return v


def _load_Q(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = quantize(emb).select("vec_id", "q").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return (quantize(emb).select("vec_id", "q"),
            np.array([r["q"] for r in rows], dtype=np.int64))


def test_top_direction_matches_numpy_mirror(spark):
    vecs, Q = _load_Q(spark)
    want = _mirror(Q, T)
    got = np.array([r["v"] for r in
                    top_direction(vecs, dim=D, rounds=T).collect()],
                   dtype=np.int64)
    assert got.shape == (D,)
    assert (got == want).all()
    # the iterate is max-normalized: exactly one entry at +/-SCALE
    assert np.abs(got).max() == SCALE


def test_top_direction_partitioning_invariant(spark):
    vecs, _ = _load_Q(spark)
    a = top_direction(vecs, dim=D, rounds=T).collect()
    b = top_direction(vecs.repartition(7), dim=D, rounds=T).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_top_direction_converges_on_planted_direction(spark):
    """On data with a real dominant component (the web-embedding case the
    operator exists for — the sf embeddings are isotropic noise, eigen-gap
    ~1.07, where NO small-T power iteration can converge), T rounds lock
    onto the planted direction."""
    rng = np.random.RandomState(7)
    d = 16
    u = rng.randn(d)
    u /= np.linalg.norm(u)
    X = rng.randn(200, d) * 0.05 + np.outer(rng.randn(200) * 1.0, u)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>")
    vecs = quantize(df).select("vec_id", "q")
    got = np.array([r["v"] for r in
                    top_direction(vecs, dim=d, rounds=T).collect()],
                   dtype=np.float64)
    cos = abs(got @ u) / (np.linalg.norm(got) * np.linalg.norm(u))
    assert cos > 0.99
