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


# ---------------------------------------------------------------------------
# Ed-Join (train_edit_join)

from co_new_spark.queries.training13 import _ED_K, _ED_MINL, _ED_SLEN, edit_join


def _lev(a, b):
    """Plain O(l^2) DP — independent ground truth for the bounded native fn."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ed_brute(rows):
    strs = {d: t[:_ED_SLEN] for d, t in rows if t is not None
            and len(t[:_ED_SLEN]) >= _ED_MINL}
    out = {}
    for (da, sa), (db, sb) in itertools.combinations(sorted(strs.items()), 2):
        ed = _lev(sa, sb)
        if ed <= _ED_K:
            out[(da, db)] = (len(sa), len(sb), ed)
    return out


def _ed_run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = edit_join(df).collect()
    return {(r.doc_a, r.doc_b): (r.len_a, r.len_b, r.ed) for r in got}


def test_edjoin_parity_handmade(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # ed 0
        (2, "the quick brown fox jumped over the lazy dog"),  # ed 2 (insert+sub)
        (3, "the quick brown cat jumps over the lazy dog"),   # ed 3
        (4, "a completely different sentence about spark"),
        (5, "short str"),                                     # < 16 chars: out
        (6, None),                                            # null: out
        (7, "x" * 100),                                       # prefix-truncated
        (8, "x" * 99 + "y"),                                  # same 64-prefix as 7
    ]
    assert _ed_run(spark, rows) == _ed_brute(rows)


def test_edjoin_lossless_on_random_edit_clusters(spark):
    """Planted <=K-edit neighbours around random 20-40 char seeds, plus noise
    docs sharing hot grams — the prefix/length filters must miss nothing."""
    rng = random.Random(131)
    alpha = "abcdef "
    rows, d = [], 0
    for _ in range(12):
        seed = "".join(rng.choice(alpha) for _ in range(rng.randint(20, 40)))
        rows.append((d, seed)); d += 1
        for _ in range(3):   # mutate 0..4 times (some past K => excluded pairs)
            s = list(seed)
            for _ in range(rng.randint(0, 4)):
                op = rng.randrange(3)
                p = rng.randrange(len(s))
                if op == 0:
                    s[p] = rng.choice(alpha)
                elif op == 1 and len(s) > _ED_MINL + 1:
                    del s[p]
                else:
                    s.insert(p, rng.choice(alpha))
            rows.append((d, "".join(s))); d += 1
    assert _ed_run(spark, rows) == _ed_brute(rows)


def test_edjoin_prefix_index_drops_hot_grams(spark):
    """Every doc shares the hot boilerplate gram; rarest-first ranking must
    keep it OUT of every prefix, so the candidate join never fans out on it."""
    from co_new_spark.queries.training13 import _ED_PFX, _ED_Q, _ed_strings

    rows = []
    for d in range(25):
        rng = random.Random(d)
        rows.append((d, "common boilerplate header " + "".join(
            rng.choice("xyzuvw") for _ in range(30))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = _ed_strings(df)
    grams = (base.select("doc_id", F.explode(F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.col("l") - _ED_Q + 1),
        lambda i: F.col("s").substr(i, F.lit(_ED_Q))))).alias("g")))
    dfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    from pyspark.sql import Window
    pfx = (grams.join(dfreq, "g")
           .withColumn("pos", F.row_number().over(
               Window.partitionBy("doc_id").orderBy("df", "g")))
           .filter(F.col("pos") <= _ED_PFX))
    hot = pfx.filter(F.col("g") == "comm").count()
    assert hot == 0  # df=25 gram never enters the inverted prefix index
