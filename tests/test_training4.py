"""Exact repeated-substring dedup (queries/training4.py)."""

from pyspark.sql import functions as F

from conftest import SF_DIR

from co_new_spark.queries.training4 import (
    SPAN_K,
    _spans,
    substring_profile,
    t_substring_hotspans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_span_count_and_short_doc_guard(spark):
    """n tokens -> n-k+1 spans; below k -> ZERO spans (not a descending
    sequence artifact)."""
    toks = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    df = _docs(spark, [toks(SPAN_K + 1), toks(SPAN_K), toks(SPAN_K - 1), ""])
    got = dict(_spans(df).groupBy("doc_id").count().collect())
    assert got == {0: 2, 1: 1}  # doc 2 (k-1 tokens) and doc 3 (empty) absent


def test_spans_are_contiguous_token_windows(spark):
    df = _docs(spark, ["a b c d e f g h i"])
    rows = _spans(df, as_text=True).collect()
    assert sorted(r["span"] for r in rows) == [
        "a b c d e f g h", "b c d e f g h i"]


def test_verbatim_copies_fully_flagged(spark):
    """Two identical docs: every span duplicated (dup_frac 1.0); a disjoint
    doc: none; a short doc: (0, 0, 0.0)."""
    body = " ".join(f"tok{i}" for i in range(SPAN_K + 4))
    other = " ".join(f"other{i}" for i in range(SPAN_K + 4))
    df = _docs(spark, [body, body, other, "tiny doc"])
    got = {r["doc_id"]: r for r in substring_profile(df).collect()}
    assert got[0]["n_spans"] == 5 and got[0]["dup_frac"] == 1.0
    assert got[1]["dup_frac"] == 1.0
    assert got[2]["dup_spans"] == 0 and got[2]["dup_frac"] == 0.0
    assert (got[3]["n_spans"], got[3]["dup_spans"], got[3]["dup_frac"]) \
        == (0, 0, 0.0)


def test_partial_overlap_counts_shared_spans_only(spark):
    """Doc B embeds doc A's text plus a unique prefix: A is 100% duplicated,
    B only on the shared suffix spans."""
    shared = " ".join(f"s{i}" for i in range(SPAN_K + 2))  # k+2 toks, 3 spans
    df = _docs(spark, [shared, "u0 u1 u2 " + shared])
    got = {r["doc_id"]: r for r in substring_profile(df).collect()}
    assert (got[0]["n_spans"], got[0]["dup_spans"]) == (3, 3)
    # B has (k+5)-k+1 = 6 spans, of which exactly A's 3 are shared
    assert (got[1]["n_spans"], got[1]["dup_spans"]) == (6, 3)
    assert got[1]["dup_frac"] == 0.5


def test_hotspans_brute_force_parity(spark):
    """Top hot spans on the sf fixture match a pure-Python recount."""
    from co_new_spark.sources.tables import load

    docs = load(spark, SF_DIR, "documents").limit(200)
    counts: dict[str, set] = {}
    occ: dict[str, int] = {}
    for r in docs.collect():
        t = r["text"].split(" ")
        for i in range(len(t) - SPAN_K + 1):
            s = " ".join(t[i:i + SPAN_K])
            counts.setdefault(s, set()).add(r["doc_id"])
            occ[s] = occ.get(s, 0) + 1
    want = sorted(
        ((s, len(d), occ[s]) for s, d in counts.items() if len(d) >= 2),
        key=lambda x: (-x[2], -x[1], x[0]))[:20]

    g = (_spans(docs, as_text=True).groupBy("span")
         .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
              F.count("*").alias("n_occ"))
         .filter(F.col("n_docs") >= 2)
         .orderBy(F.col("n_occ").desc(), F.col("n_docs").desc(), "span")
         .limit(20))
    got = [(r["span"], r["n_docs"], r["n_occ"]) for r in g.collect()]
    assert got == want


def test_plan_no_python_and_distributed_topk(spark):
    """Span generation is pure codegen (no Arrow/Python eval anywhere), and
    the hotspans top-k is TakeOrderedAndProject, NOT a global-window sort
    of the full candidate set."""
    prof = substring_profile(
        _docs(spark, ["a b c d e f g h i j"]))
    p1 = prof._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p1 and "ArrowEval" not in p1
    # the fact-sized (h, doc_id) reduction MUST combine map-side (a hot
    # span collapses per mapper before the wire — the skew defence)
    assert "partial_count(1)" in p1

    hot = t_substring_hotspans(spark, SF_DIR)
    p2 = hot._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p2
    assert "BatchEvalPython" not in p2 and "ArrowEval" not in p2


def test_perplexity_buckets_semantics(spark):
    """The es-trained trigram LM must (a) score Spanish docs lower-NLL on
    average than non-Spanish docs, (b) produce value-ordered terciles with
    ties-to-better-bucket, (c) bucket every doc of every language."""
    from co_new_spark.queries.training4 import t_perplexity_buckets

    rows = t_perplexity_buckets(spark, SF_DIR).collect()
    assert rows
    es = [r["q"] for r in rows if r["lang"] == "es"]
    other = [r["q"] for r in rows if r["lang"] != "es"]
    assert es and other
    assert sum(es) / len(es) < sum(other) / len(other)
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        qs = {"head": [], "middle": [], "tail": []}
        for r in rs:
            qs[r["bucket"]].append(r["q"])
        n = len(rs)
        assert len(qs["head"]) >= (n + 2) // 3, lang          # ties inflate head
        if qs["middle"]:
            assert max(qs["head"]) < min(qs["middle"]), lang  # strict: ties went head
        if qs["tail"]:
            assert max(qs["middle"] or qs["head"]) < min(qs["tail"]), lang
