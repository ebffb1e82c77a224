"""Exact prefix-filtered set-similarity join (queries/training13.py):
brute-force parity, losslessness of the prefix+positional filters on
adversarial random corpora, and the candidate-reduction claim."""

import itertools
import random

from pyspark.sql import functions as F

from co_new_spark.queries.training13 import _T_DEN, _T_NUM, setsim_join


def _shingle_set(text):
    w = text.split(" ")
    return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 0))}


def _brute(rows):
    """Ground-truth all-pairs Jaccard >= _T_NUM/_T_DEN over 3-gram shingles."""
    sets = {d: _shingle_set(t) for d, t in rows}
    out = {}
    for (da, sa), (db, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if _T_DEN * inter >= _T_NUM * union:
            out[(da, db)] = (inter, union)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = setsim_join(df).collect()
    return {(r.doc_a, r.doc_b): (r.n_inter, r.n_union) for r in got}


def test_parity_handmade(spark):
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i j"),            # exact dup of 0
        (2, "a b c d e f g h i X"),            # near dup (one word changed)
        (3, "z y x w v u t s r q"),            # disjoint
        (4, "a b"),                            # <3 tokens: empty shingle set
        (5, "a b c d e f g h i j k l m n o"),  # superset of 0
    ]
    assert _run(spark, rows) == _brute(rows)


def test_lossless_on_random_corpora(spark):
    """Prefix + positional + length filters must lose NO qualifying pair on
    corpora built to sit near the threshold (shared prefixes, high overlap)."""
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(40):
        base = rng.randrange(4)  # 4 clusters of heavily-overlapping docs
        toks = [vocab[(base * 3 + i) % 12] for i in range(rng.randint(3, 9))]
        if rng.random() < 0.5:
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rows.append((d, " ".join(toks)))
    assert _run(spark, rows) == _brute(rows)


def test_prefix_join_smaller_than_full_join(spark):
    """The candidate join probes strictly fewer (doc, element) rows than the
    every-shared-shingle join train_ngram_jaccard performs."""
    rows = [(d, " ".join(f"t{(d + i) % 30}" for i in range(20)))
            for d in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from co_new_spark.queries.training13 import _tokens

    tok = _tokens(df)
    full = tok.count()
    # reproduce the entry's prefix predicate
    from pyspark.sql import Window

    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (tok.join(dfreq, "tok")
              .withColumn("pos", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("df", "tok")))
              .withColumn("la", F.count("*").over(Window.partitionBy("doc_id"))))
    pfx = ranked.filter(
        F.col("pos") <= F.col("la")
        - ((_T_NUM * F.col("la") + (_T_DEN - 1)) / _T_DEN).cast("long")
        + F.lit(1)).count()
    assert pfx < full / 2  # t=3/5 keeps ~2/5 of each set (+1)
