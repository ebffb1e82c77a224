"""Gates for the distance join and OD matrix (queries/geospatial2.py)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from co_new_spark.functions import geo
from co_new_spark.grid import grids
from co_new_spark.operators.knn import ring_cells_udf
from co_new_spark.queries.geospatial2 import (
    _DJ_RADIUS, _DJ_RBITS, _FOCAL_RBITS, g_distance_join, g_focal_sum,
    g_od_matrix,
)

SF = "/root/testdata/sf0.001"


def _brute_pairs(pts, radius):
    """Exact all-pairs ground truth on (id, x, y) numpy arrays."""
    ids, x, y = pts
    out = set()
    r2 = radius * radius
    for a in range(len(ids)):
        dx = x - x[a]
        dy = y - y[a]
        hit = np.nonzero((dx * dx + dy * dy <= r2) & (ids > ids[a]))[0]
        for b in hit:
            out.add((int(ids[a]), int(ids[b]),
                     int(dx[b] * dx[b] + dy[b] * dy[b])))
    return out


def test_distance_join_matches_brute_force(spark):
    """Engine ring-1 plan == brute force, including pairs that straddle an
    L0 boundary and pairs exactly at the radius (boundary inclusive)."""
    rng = np.random.default_rng(7)
    n = 300
    # cluster points NEAR the L0 lattice line x = X0 + L0_SIDE so many pairs
    # cross cells and several cross the L0 boundary itself
    x = grids.L0_ORIGIN_X + grids.L0_SIDE + rng.integers(-40_000, 40_000, n).astype(np.float64)
    y = grids.L0_ORIGIN_Y + rng.integers(0, 2_621_440, n).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"event_id": ids, "x": x, "y": y}))
    pts = (df.withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _DJ_RBITS))
             .filter(F.col("cell") >= 0))
    a = pts.select(F.col("event_id").alias("id_a"), F.col("x").alias("xa"),
                   F.col("y").alias("ya"), "cell")
    b = pts.select(F.col("event_id").alias("id_b"), F.col("x").alias("xb"),
                   F.col("y").alias("yb"),
                   F.explode(ring_cells_udf(1)(F.col("cell"))).alias("nbcell"))
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    got = {(r.id_a, r.id_b, r.dist2) for r in
           (a.join(b, a["cell"] == b["nbcell"])
             .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(_DJ_RADIUS ** 2)))
             .select("id_a", "id_b", d2.cast("long").alias("dist2"))).collect()}

    # ground truth over the grid-valid subset only (mirrors the entry contract)
    keep = [r.event_id for r in pts.select("event_id").collect()]
    mask = np.isin(ids, keep)
    want = _brute_pairs((ids[mask], x[mask], y[mask]), _DJ_RADIUS)
    assert got == want
    assert len(want) > 50  # the fixture is dense enough to mean something


def test_distance_join_entry_shape(spark):
    df = g_distance_join(spark, SF)
    rows = df.collect()
    assert df.columns == ["id_a", "id_b", "dist2"]
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.dist2 <= int(_DJ_RADIUS ** 2) for r in rows)
    # no duplicate pairs out of the ring expansion
    assert len({(r.id_a, r.id_b) for r in rows}) == len(rows)


def test_focal_sum_against_numpy_reference(spark):
    """Engine focal pass == an independent dense-lattice numpy convolution
    (3x3 box filter over the global (i, j) frame, coverage-clipped)."""
    from co_new_spark.queries.geospatial import _event_points

    got = {r.cell: (r.focal_sum, r.n_contrib)
           for r in g_focal_sum(spark, SF).collect()}

    pts = _event_points(spark, SF).toPandas()
    nside = 1 << (_FOCAL_RBITS // 2)
    s = grids.L0_SIDE / nside
    gi = np.floor((pts.x.to_numpy() - grids.L0_ORIGIN_X) / s).astype(np.int64)
    gj = np.floor((pts.y.to_numpy() - grids.L0_ORIGIN_Y) / s).astype(np.int64)

    def valid(ii, jj):
        i, j = ii // nside, jj // nside
        ok = (ii >= 0) & (jj >= 0) & (i < grids.L0_NI) & (j < grids.L0_NJ)
        d = np.where(ok, grids.L0_DIGIT_BY_JI[np.clip(j, 0, grids.L0_NJ - 1),
                                              np.clip(i, 0, grids.L0_NI - 1)], -1)
        return ok & (d >= 0)

    keep = valid(gi, gj)
    occ = {}
    for a, b in zip(gi[keep], gj[keep]):
        occ[(a, b)] = occ.get((a, b), 0) + 1

    want = {}
    for (a, b), n in occ.items():
        for da in (-1, 0, 1):
            for db in (-1, 0, 1):
                ta, tb = a + da, b + db
                if valid(np.array([ta]), np.array([tb]))[0]:
                    fs, nc = want.get((ta, tb), (0, 0))
                    want[(ta, tb)] = (fs + n, nc + 1)

    # map lattice targets to packed cell ids through the trusted kernel
    tg = np.array([k for k in want], dtype=np.int64)
    from co_new_spark.grid import cells as ncells
    cell_ids = ncells.cell_b_from_global_ji(tg[:, 1], tg[:, 0], _FOCAL_RBITS)
    want_by_cell = {int(c): want[(int(a), int(b))]
                    for c, (a, b) in zip(cell_ids, tg)}
    assert got == want_by_cell


def test_od_matrix_conservation(spark):
    """Each user's transition count == (events after the validity filter) - 1;
    the OD matrix must conserve the total."""
    out = g_od_matrix(spark, SF).collect()
    total = sum(r.n_trips for r in out)

    from co_new_spark.sources.tables import load
    ev = load(spark, SF, "events").select(
        "event_id", "user_id",
        (F.lit(grids.L0_ORIGIN_X) + (F.col("event_id") * 2654435761) % 2097152).alias("x"),
        (F.lit(grids.L0_ORIGIN_Y) + (F.col("event_id") * 40503) % 2621440).alias("y"),
    ).withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), 4)).filter(F.col("cell") >= 0)
    per_user = ev.groupBy("user_id").count().collect()
    want = sum(max(0, r["count"] - 1) for r in per_user)
    assert total == want
    assert all(r.n_users <= r.n_trips for r in out)


def test_trajectory_stats_invariants(spark):
    from co_new_spark.queries.geospatial2 import g_trajectory_stats
    from co_new_spark.sources.tables import load

    out = {r.user_id: r for r in g_trajectory_stats(spark, SF).collect()}
    per_user = {r.user_id: r["count"] for r in
                load(spark, SF, "events").groupBy("user_id").count().collect()}
    for uid, n in per_user.items():
        if n >= 2:
            assert out[uid].n_legs == n - 1
            assert out[uid].path_mm >= out[uid].max_leg_mm > 0
        else:
            assert uid not in out


def test_grid_cluster_matches_union_find(spark):
    """Engine clustering == a plain union-find over the same dense-cell
    king-adjacency graph (independent of the large-star/small-star code)."""
    from co_new_spark.grid import cells as ncells
    from co_new_spark.queries.geospatial2 import (
        _CL_MIN_PTS, _CL_RBITS, g_grid_cluster,
    )
    from co_new_spark.queries.geospatial import _event_points

    got = {(r.cluster_id, r.n_cells, r.n_points)
           for r in g_grid_cluster(spark, SF).collect()}

    pts = (_event_points(spark, SF)
           .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _CL_RBITS))
           .filter(F.col("cell") >= 0)).toPandas()
    counts = pts.groupby("cell").size()
    dense = {int(c): int(n) for c, n in counts.items() if n >= _CL_MIN_PTS}
    cells = np.array(sorted(dense), dtype=np.int64)

    parent = {c: c for c in dense}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    nb = ncells.neighbors_b(cells, ring=1)
    for me, row in zip(cells, nb):
        for v in row:
            if v >= 0 and int(v) in dense:
                ra, rb = find(int(me)), find(int(v))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    comp = {}
    for c in dense:
        comp.setdefault(find(c), []).append(c)
    want = {(root, len(mem), sum(dense[c] for c in mem))
            for root, mem in comp.items()}
    assert got == want
    assert len(want) > 1  # subcritical density: several clusters, not one blob


def test_hotspot_gi_properties(spark):
    """Getis-Ord Gi* structural identities on the real raster: sign agrees
    with the centered focal numerator, W_i bounds, self-inclusion, and the
    symmetric-weights identity sum(focal) == sum(n * w)."""
    from conftest import SF_DIR
    from co_new_spark.queries.geospatial2 import g_hotspot_gi

    rows = g_hotspot_gi(spark, SF_DIR).collect()
    assert rows
    nc = len(rows)
    sx = sum(r["n"] for r in rows)
    xbar = sx / nc
    for r in rows:
        assert 1 <= r["w_i"] <= 9
        assert r["focal_sum"] >= r["n"]        # king ring includes self
        num = r["focal_sum"] - xbar * r["w_i"]
        if r["gi_micro"] is not None and r["gi_micro"] != 0:
            assert (r["gi_micro"] > 0) == (num > 0)
    # binary king weights are symmetric over the occupied universe
    assert (sum(r["focal_sum"] for r in rows)
            == sum(r["n"] * r["w_i"] for r in rows))
    assert any(r["gi_micro"] and r["gi_micro"] > 1_000_000 for r in rows)


def test_morans_i_checkerboard_and_cluster(spark):
    """Moran's I numerator machinery on planted lattices, via the same
    integer-Z trick re-derived in pure python over a synthetic occupied
    set: a checkerboard is dispersed (I < E[I]) and a block is clustered
    (I > 0).  (The Spark entry's raster comes from the events table; this
    pins the STATISTIC's behavior on known geometries.)"""
    def moran(cells):  # {(gi,gj): n}
        nc, sx = len(cells), sum(cells.values())
        Z = {k: nc * v - sx for k, v in cells.items()}
        num = w = 0
        for (a, b), z in Z.items():
            for da in (-1, 0, 1):
                for db in (-1, 0, 1):
                    if (da or db) and (a + da, b + db) in Z:
                        num += z * Z[(a + da, b + db)]
                        w += 1
        den = sum(z * z for z in Z.values())
        return nc * num / (w * den)

    checker = {(i, j): 1 + (i + j) % 2 for i in range(8) for j in range(8)}
    block = {(i, j): (3 if i < 4 else 1) for i in range(8) for j in range(8)}
    nc = 64
    assert moran(checker) < -1 / (nc - 1)   # dispersed
    assert moran(block) > 0.3               # clustered


def test_idw_fill_properties(spark):
    """IDW gap-fill invariants: targets are never occupied cells, every
    estimate lies within [min, max] of the occupied counts (convex
    combination), and a single-source target reproduces its source value
    exactly (idw_milli == 1000 * n_src_value)."""
    from conftest import SF_DIR
    from co_new_spark.queries.geospatial2 import _FOCAL_RBITS, g_idw_fill
    from co_new_spark.queries.geospatial import _event_points

    out = {r["cell"]: r for r in g_idw_fill(spark, SF_DIR).collect()}
    assert out
    occ = (_event_points(spark, SF_DIR)
           .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"),
                                                _FOCAL_RBITS))
           .filter(F.col("cell") >= 0)
           .groupBy("cell").agg(F.count("*").alias("n"))).collect()
    occ = {r["cell"]: r["n"] for r in occ}
    lo, hi = min(occ.values()), max(occ.values())
    assert not (set(out) & set(occ))          # fringe only
    for r in out.values():
        assert 1000 * lo <= r["idw_milli"] <= 1000 * hi  # convexity
        assert 1 <= r["n_src"] <= 8
        assert r["den2"] >= 1
    singles = [r for r in out.values() if r["n_src"] == 1]
    assert singles
    for r in singles:  # one neighbor -> exact copy of its value
        assert r["idw_milli"] * r["den2"] == 1000 * r["num2"]


def test_semivariogram_bins_and_symmetry(spark):
    """Variogram invariants: exactly the ring-2 squared-distance bins
    {1,2,4,5,8}; ordered-pair counts are even (symmetry); and the
    rook-1 bin matches a direct recomputation from the idw/occupied
    raster collected once."""
    from conftest import SF_DIR
    from co_new_spark.queries.geospatial2 import (_FOCAL_RBITS,
                                                  g_semivariogram)
    from co_new_spark.queries.geospatial import _event_points
    from co_new_spark.grid import cells as ncells
    import numpy as np

    rows = {r["d2"]: r for r in g_semivariogram(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 4, 5, 8}
    for r in rows.values():
        assert r["n_pairs"] % 2 == 0 and r["ss"] % 2 == 0
        assert r["gamma_milli"] == round(1000.0 * r["ss"]
                                         / (2 * r["n_pairs"]))
    # independent recompute of every bin from the collected raster
    occ = (_event_points(spark, SF_DIR)
           .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"),
                                                _FOCAL_RBITS))
           .filter(F.col("cell") >= 0)
           .groupBy("cell").agg(F.count("*").alias("n"))).collect()
    cells = np.array([r["cell"] for r in occ], dtype=np.int64)
    nval = {r["cell"]: r["n"] for r in occ}
    gy, gx, _, _ = ncells.cell_b_to_global_ji(cells)
    pos = {(int(a), int(b)): nval[int(c)] for a, b, c in zip(gy, gx, cells)}
    want = {}
    for (a, b), ni in pos.items():
        for da in range(-2, 3):
            for db in range(-2, 3):
                if (da or db) and (a + da, b + db) in pos:
                    d2 = da * da + db * db
                    s, c = want.get(d2, (0, 0))
                    want[d2] = (s + (ni - pos[(a + da, b + db)]) ** 2, c + 1)
    assert {k: (rows[k]["ss"], rows[k]["n_pairs"]) for k in rows} == want
