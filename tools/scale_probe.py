"""10x input-size probe for the heavy non-flagship entries (round-3 VERDICT
ask #7) — same protocol as the flagship's 10x probe in BENCH.md: same
session, same plan, input replicated 10x, wall + marginal-throughput ratio.

Replication is structure-preserving:
* documents: copy c remaps doc_id += c * 10^7 and suffixes EVERY word with
  'x{c}' — a bijection on word 3-gram shingles WITHIN a copy (every
  within-copy Jaccard/span relation is preserved exactly) while making
  cross-copy shingles disjoint (no artificial quadratic blowup from
  identical texts).  The dup/near-dup graph is therefore exactly 10 disjoint
  copies of the 1x graph: CC round counts and span-explosion constants are
  probed at 10x the data, not at a different problem.
* events: copy c remaps event_id += c * 10^7 (kept under the position-hash
  multiplier's ANSI-overflow headroom); positions are a hash of event_id
  (queries/geospatial.position_cols), so the 10x point cloud occupies ~10x
  the cells — the occupied-cell graph genuinely grows.  Both offsets are
  guarded against id collisions at larger base tables.

Usage:  python tools/scale_probe.py [sf_dir] [replicas]
Prints one JSON line per entry: {entry, rows_1x, wall_1x, rows_Rx, wall_Rx,
wall_ratio, marginal_throughput_ratio}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# full-input path for the capped entries (same convention as bench.py),
# BEFORE the registry modules are imported
os.environ.setdefault("CO_ND_DOCS", str(1 << 60))
os.environ.setdefault("CO_CLUSTER_EVENTS", str(1 << 60))
os.environ.setdefault("CO_PR_EVENTS", str(1 << 60))
os.environ.setdefault("CO_MST_EVENTS", str(1 << 60))
os.environ.setdefault("CO_CT_EVENTS", str(1 << 60))

# train_simhash added round 5 (VERDICT ask #3): the guaranteed-recall
# banding explodes 28 block-pair keys per doc — probe that the candidate
# join stays sub-linear at 10x like its peers
# train_dsir_weights added round 5 (VERDICT ask #1 follow-through): the
# rebuilt scale-safe selection (TakeOrderedAndProject + broadcast flag
# join over a once-materialized weight table) — probe that the whole
# pairs→scores→weights→top-K chain grows with rows, not rows²
# train_dedup_bloom added round 5: the bucket-partitioned Bloom prefilter —
# probe that growing the store 10x grows only the sketch build + the
# verified sliver, not any all-rows join
# train_perplexity_buckets added round 5: the trigram-LM pairs→scores→
# terciles chain — probe that the only fact exchanges (pairs groupBys +
# the score join) grow with rows, with the tercile window staying on the
# bounded histogram.  Note the 'x{c}' word suffixing shifts every copy's
# trigram DISTRIBUTION identically, so the LM's bucket table stays
# bounded while the stream grows 10x — exactly the production shape.
# train_kmeans_lloyd added round 5: the iterative clustering rounds —
# probe that T rounds over 10x vectors cost ~10x the per-round exchanges
# (replicated vectors keep the SAME optimum, so round structure is
# comparable; the K x D model side is constant)
# train_semdedup added round 5: kmeans + within-cluster pair join — with
# 10x replicated vectors every cluster holds 10x the members, so the
# quadratic-in-cluster pair stage is probed at its true growth (the
# operator's K-grows-with-N contract is the caller's; this is the
# worst case of holding K fixed)
# train_bpe_merges added round 5: doc-partitioned window rounds over the
# char position table — probe that T rounds over 10x chars cost ~10x
# (the 'x{c}' word suffix shifts pair counts identically per copy, so
# the merge sequence stays comparable)
# train_bm25_topk added round 5: postings x probe-terms join — suffixing
# makes cross-copy terms disjoint, so 10x docs also means 10x probes
# over disjoint vocabularies: the candidate set grows linearly, never
# probes x corpus
# train_pmi_pairs added round 5: bigram + marginal aggs and the
# vocabulary-keyed marginal join — 'x{c}' suffixing makes copies'
# vocabularies disjoint, so both the (w1,w2) key space and the marginal
# table grow 10x: probes that the whole chain is linear in tokens with
# no pair blowup (bigrams are positional, never cross-doc)
# train_winnowing added round 5c: doc-partitioned frame-min windows — the
# 'x{c}' suffix keeps per-copy gram sequences isomorphic, so 10x docs is
# exactly 10x independent window partitions: probes that per-doc windows
# never couple across docs
# train_shingle_contain added round 5c: the capped shingle-key self-join —
# suffixing makes cross-copy shingles disjoint, so the candidate pair
# space is 10 disjoint 1x spaces: probes that the fan-in cap (not corpus
# size) bounds per-shingle join width
# train_heavy_ngrams added round 5f: the two-pass exact heavy-hitter
# trigrams — both passes are map-side-only over the gram stream, so 10x
# grams must cost ~10x two scans.  NOTE the output legitimately shrinks
# toward empty at 10x: per-copy gram counts are unchanged while the
# corpus-relative floor N/K rises 10x (disjoint vocabularies) — the probe
# measures the pass cost, the frequency floor is doing its job
# web_cdc_chunks added round 5h: the Arrow window scan is per-doc linear
# and the 'x{c}' suffix makes cross-copy chunk bytes (and hence chunk
# hashes) disjoint — probes that the chunk-store groupBy and the share
# equi-join grow with unique content, never quadratically
ENTRIES = ["train_neardup_components", "geo_grid_cluster",
           "train_substring_dedup", "train_neardup_scaled",
           "train_simhash", "train_dsir_weights", "train_dedup_bloom",
           "train_perplexity_buckets", "train_kmeans_lloyd",
           "train_semdedup", "train_bpe_merges", "train_bm25_topk",
           "train_pmi_pairs", "train_winnowing", "train_shingle_contain",
           "train_heavy_ngrams", "web_cdc_chunks",
           # round-5k: the two sf-scaled spatial additions over events —
           # skyline probes that dedup + bucket histogram + partitioned
           # windows stay linear (the frontier itself only grows ~log n);
           # str_pack probes the two rank shuffles (bucket histogram +
           # slice window) at 10x the points
           "geo_skyline", "geo_str_pack",
           # round-5 continuing: geo_mst probes that only the first
           # points->cells agg grows 10x while the Boruvka rounds stay on
           # the lattice-bounded graph; geo_contour likewise (one fact agg,
           # then raster-sized block assembly); train_unigram_lm probes the
           # row-local DP fold — 10x docs must cost ~10x one codegen scan;
           # geo_rtree_probe probes directory build (two rank shuffles) +
           # pruned refine at 10x points
           "geo_mst", "geo_contour", "train_unigram_lm", "geo_rtree_probe"]


def build_scaled(spark, sf_dir: str, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # collision guard: replica offsets must exceed every base id, or copies
    # silently merge and the 'R disjoint copies' premise breaks
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    max_ev = ev.agg(F.max("event_id")).collect()[0][0]
    if max_doc >= 10_000_000 or max_ev >= 10_000_000:
        raise ValueError(f"id range too large for replica offsets: "
                         f"max doc_id={max_doc}, max event_id={max_ev}")
    parts = []
    for c in range(replicas):
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", rf"$1x{c}").alias("text"),
            "lang", "source", "n_chars"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))

    parts = []
    for c in range(replicas):
        # offset stays small: position_cols multiplies event_id by 2.65e9,
        # so ids must remain < ~3.4e9 to avoid ANSI long overflow
        parts.append(ev.withColumn(
            "event_id", F.col("event_id") + F.lit(c * 10_000_000)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet"))

    # embeddings: fresh vec_ids, vectors verbatim — R exact copies of the
    # point cloud share the 1x optimum, so k-means probes cost, not a
    # different problem (seeding differs with the new id set; harmless)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    parts = [emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * 10_000_000))
             for c in range(replicas)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    from co_new_spark.plans.session import get_spark
    from co_new_spark.queries import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3:])  # optional entry-name filter
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="scale-probe", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    scaled = os.path.join("/tmp", "co_scale_probe", f"x{replicas}")
    build_scaled(spark, sf_dir, scaled, replicas)

    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    n_ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    n_emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    in_rows = {"train_neardup_components": n_docs, "geo_grid_cluster": n_ev,
               "train_substring_dedup": n_docs, "train_neardup_scaled": n_docs,
               "train_simhash": n_docs, "train_dsir_weights": n_docs,
               "train_dedup_bloom": n_docs,
               "train_perplexity_buckets": n_docs,
               "train_kmeans_lloyd": n_emb,
               "train_semdedup": n_emb,
               "train_bpe_merges": n_docs,
               "train_bm25_topk": n_docs,
               "train_pmi_pairs": n_docs,
               "train_winnowing": n_docs,
               "train_shingle_contain": n_docs,
               "train_heavy_ngrams": n_docs,
               "web_cdc_chunks": n_docs,
               "geo_skyline": n_ev, "geo_str_pack": n_ev,
               "geo_mst": n_ev, "geo_contour": n_ev,
               "geo_rtree_probe": n_ev, "train_unigram_lm": n_docs}

    from co_new_spark.queries import mat

    def run(name: str, d: str) -> float:
        # un-memoize ALL oracle materializations so every timed run (1x and
        # Rx alike) executes its full upstream — a memo-warm 1x vs memo-cold
        # Rx would overstate the ratio (the artifact this probe rules out)
        mat.reset()
        fn, _ = REGISTRY[name]
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in ENTRIES:
        if only and name not in only:
            continue
        run(name, sf_dir)                      # untimed warmup (codegen etc.)
        w1 = min(run(name, sf_dir) for _ in range(2))
        wr = run(name, scaled)
        r1 = in_rows[name]
        print(json.dumps({
            "entry": name, "rows_1x": r1, "wall_1x_s": round(w1, 2),
            "rows_Rx": r1 * replicas, "wall_Rx_s": round(wr, 2),
            "replicas": replicas,
            "wall_ratio": round(wr / w1, 2),
            "throughput_1x": round(r1 / w1, 1),
            "throughput_Rx": round(r1 * replicas / wr, 1),
        }), flush=True)

        if name == "train_semdedup":
            # the registry entry holds K fixed for the static oracle, which
            # is the quadratic worst case (clusters grow Rx -> pairs Rx²);
            # the operator's documented contract is K ∝ N.  Evidence it:
            # re-run the Rx input with K scaled by R — per-cluster
            # population (and the pair stage) returns to the 1x shape.
            from pyspark.sql import functions as F

            from co_new_spark.operators.kmeans import quantize
            from co_new_spark.queries.training6 import _KM_K, semdedup

            def run_sd(d: str, k: int) -> float:
                vecs = quantize(
                    spark.read.parquet(os.path.join(d, "embeddings.parquet"))
                ).select("vec_id", "q")
                t0 = time.time()
                semdedup(vecs, k=k).write.format("noop") \
                    .mode("overwrite").save()
                return time.time() - t0

            run_sd(sf_dir, _KM_K)  # warmup
            c1 = min(run_sd(sf_dir, _KM_K) for _ in range(2))
            cr = run_sd(scaled, _KM_K * replicas)
            print(json.dumps({
                "entry": "train_semdedup[K∝N contract]",
                "rows_1x": r1, "k_1x": _KM_K, "wall_1x_s": round(c1, 2),
                "rows_Rx": r1 * replicas, "k_Rx": _KM_K * replicas,
                "wall_Rx_s": round(cr, 2), "replicas": replicas,
                "wall_ratio": round(cr / c1, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
