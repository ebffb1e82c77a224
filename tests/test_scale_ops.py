"""Property tests for queries/scale_ops.py: the Misra-Gries superset
guarantee, Bloom-filter soundness (no false negatives) + actual pruning,
rendezvous hashing's minimal-disruption law, and stay-point episode
invariants."""

import pandas as pd
from pyspark.sql import functions as F

from co_new_spark.queries import scale_ops as so
from tests.conftest import SF_DIR


# --- Misra-Gries candidate pass (pure-pandas unit tests, no Spark) --------

def _mg(batches, cap):
    """Run the partition summarizer (int64 hash-key interface)."""
    old = so._HH_CAP
    so._HH_CAP = cap
    try:
        out = pd.concat(list(so._mg_candidates(
            [pd.DataFrame({"hk": b}) for b in batches])))
    finally:
        so._HH_CAP = old
    cands = set(out[out["n_part"] == 0]["hk"])
    n = int(out["n_part"].sum())
    return cands, n


def test_mg_superset_guarantee():
    # 100x key 7, 60x key 9, 200 singletons; cap=3 counters.
    stream = [7] * 100 + [9] * 60 + list(range(1000, 1200))
    cands, n = _mg([stream], cap=3)
    assert n == len(stream)
    # any item with count > N/(cap+1) = 90 MUST survive
    assert 7 in cands
    assert len(cands) <= 3


def test_mg_multi_batch_merge():
    # the guarantee holds across batch merges too
    b1 = [5] * 50 + list(range(2000, 2100))
    b2 = [5] * 50 + list(range(3000, 3100))
    cands, n = _mg([b1, b2], cap=4)
    assert n == 300
    assert 5 in cands  # count 100 > 300/5 = 60


# --- Bloom filter: sound (no false negatives) and actually pruning --------

def test_bloom_no_false_negative_and_prunes(spark):
    from co_new_spark.sources.tables import load

    cust = (load(spark, SF_DIR, "customer")
            .filter(F.col("c_mktsegment") == so._BF_SEGMENT)
            .select("c_custkey").distinct())
    words = so.bloom_build(cust, "c_custkey")
    assert len(words) == so._m64

    orders = load(spark, SF_DIR, "orders")
    pre = orders.filter(
        so.bloom_might_contain(words, F.col("o_custkey")))
    true_keys = {r["c_custkey"] for r in cust.collect()}
    truly = orders.filter(F.col("o_custkey").isin(true_keys))

    n_orders, n_pre, n_true = orders.count(), pre.count(), truly.count()
    # soundness: every true match passes the filter
    missed = truly.join(pre.select("o_orderkey"), "o_orderkey",
                        "left_anti").count()
    assert missed == 0
    # effectiveness: the filter prunes a real fraction of the fact scan
    assert n_true <= n_pre < n_orders


# --- Rendezvous hashing: adding a shard only ever moves docs TO it --------

def test_rendezvous_minimal_disruption(spark):
    out = so.p_shard_rendezvous(spark, SF_DIR).collect()
    moved = [r for r in out if r["shard_old"] != r["shard_new"]]
    stayed = [r for r in out if r["shard_old"] == r["shard_new"]]
    assert moved and stayed
    assert all(r["shard_new"] == so._RV_S for r in moved)
    n_total = sum(r["n_docs"] for r in out)
    n_moved = sum(r["n_docs"] for r in moved)
    # expectation 1/(S+1) ~ 11%; allow wide slack on the small fixture
    assert n_moved < 0.3 * n_total


# --- Stay points: episode invariants --------------------------------------

def test_staypoint_invariants(spark):
    rows = so.g_staypoints(spark, SF_DIR).collect()
    assert rows, "fixture should contain same-cell runs at rbits=2"
    for r in rows:
        assert r["n_events"] >= 2
        assert r["dwell_us"] >= 0
        assert r["cell"] >= 0


def test_heavy_ngrams_threshold(spark):
    df = so.t_heavy_ngrams(spark, SF_DIR)
    rows = df.collect()
    assert rows
    # every reported gram clears the corpus-relative floor; recount is exact
    from co_new_spark.sources.tables import load
    n_total = (so._word_trigrams(load(spark, SF_DIR, "documents"))
               .count())
    assert all(r["n"] * so._HH_K > n_total for r in rows)


# --- Skew-split join: the union of lanes is a partition of the fact -------

def test_skew_split_equals_plain_join(spark):
    from co_new_spark.sources.tables import load

    out = {r["c_mktsegment"]: (r["n_events"], r["value_cents"])
           for r in so.r_skew_split_join(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("c"))
    dim = load(spark, SF_DIR, "customer")
    plain = {r["c_mktsegment"]: (r["n"], r["s"])
             for r in ev.join(dim, ev["user_id"] == dim["c_custkey"])
                        .groupBy("c_mktsegment")
                        .agg(F.count("*").alias("n"), F.sum("c").alias("s"))
                        .collect()}
    assert out == plain


# --- Hilbert range decomposition invariants --------------------------------

def test_hilbert_ranges_partition_the_bbox():
    ranges = so._hilbert_bbox_ranges()
    n_bbox = ((so._HR_GX[1] - so._HR_GX[0] + 1)
              * (so._HR_GY[1] - so._HR_GY[0] + 1))
    # ranges are disjoint, sorted, and cover exactly the bbox lattice
    assert sum(n for _, _, n in ranges) == n_bbox
    for (lo, hi, n) in ranges:
        assert hi - lo + 1 == n  # runs are contiguous
    for (_, hi, _), (lo2, _, _) in zip(ranges, ranges[1:]):
        assert lo2 > hi + 1  # maximal runs (no mergeable neighbors)


def test_hilbert_ranges_counts(spark):
    rows = so.g_hilbert_ranges(spark, SF_DIR).collect()
    assert len(rows) == len(so._hilbert_bbox_ranges())
    assert all(r["n_events"] >= 0 for r in rows)
    assert any(r["n_events"] > 0 for r in rows)


# --- Plan gates -------------------------------------------------------------

def test_bloom_filter_reaches_fact_scan(spark):
    """The bloom bit-test must sit on the orders scan (DataFilters), below
    the join — i.e. the fact is pruned BEFORE any exchange."""
    plan = (so.r_bloom_join(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    scan = [l for l in plan.splitlines()
            if "FileScan" in l and "orders.parquet" in l]
    assert scan and "element_at" in scan[0]  # bloom test pushed into the scan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_heavy_ngrams_recount_is_broadcast(spark):
    plan = (so.t_heavy_ngrams(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# --- Curve decision record (open decision #6) ------------------------------

def test_curve_locality_measured_verdict(spark):
    rows = {r["curve"]: r for r in
            so.g_curve_locality(spark, SF_DIR).collect()}
    assert rows["morton"]["n_pairs"] == rows["hilbert"]["n_pairs"] == 8064
    # the measured (anti-folklore) fact: Morton has the SMALLER mean
    # neighbor distance; Hilbert pays for contiguity with bigger jumps
    assert rows["morton"]["mean_micro"] < rows["hilbert"]["mean_micro"]
    assert rows["morton"]["max_d"] < rows["hilbert"]["max_d"]


def test_curve_clustering_hilbert_wins(spark):
    rows = so.g_curve_clustering(spark, SF_DIR).collect()
    by = {}
    for r in rows:
        by.setdefault(r["rect_id"], {})[r["curve"]] = r
    assert len(by) == len(so._CC_RECTS)
    for rect_id, cs in by.items():
        assert cs["morton"]["n_cells"] == cs["hilbert"]["n_cells"]
        # the Moon et al. clustering property, per rect
        assert cs["hilbert"]["n_runs"] <= cs["morton"]["n_runs"]
    tot_m = sum(c["morton"]["n_runs"] for c in by.values())
    tot_h = sum(c["hilbert"]["n_runs"] for c in by.values())
    assert tot_h < tot_m  # strictly fewer scan ranges overall
