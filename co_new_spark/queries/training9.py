"""Corpus curation verbs, round 5c: winnowing fingerprints
(``train_winnowing``), asymmetric shingle containment
(``train_shingle_contain``), and global curriculum ordering without a
global sort (``train_curriculum_order``).

Why they exist:

* **Winnowing** (Schleimer, Wilkerson & Aiken, SIGMOD 2003) is the
  fingerprint-selection scheme with a POSITIONAL guarantee the registry's
  rolling-hash entry (train_fingerprint) lacks: any match of length
  >= w + k - 1 between two documents shares at least one selected
  fingerprint.  It is the standard local-fingerprinting pass for
  plagiarism / contamination detection (MOSS) — at crawl scale, the
  cheap filter before exact substring verification (train_substring_dedup).
* **Shingle containment** (Broder 1997 §2) is the DIRECTIONAL near-dup
  relation |S(a) ∩ S(b)| / |S(a)|: resemblance (train_ngram_jaccard,
  train_minhash_lsh) misses a short page embedded in a long one because
  the union in the denominator drowns it; containment is how quote-farms
  and scraped-excerpt mirrors are actually caught.
* **Curriculum ordering** (Bengio et al. 2009) needs ONE global,
  deterministic, stable step index over the whole corpus (easy docs
  first) — the textbook global ``row_number()`` is the exact
  single-partition sort the plan gate bans.  This entry shows the
  scale-safe construction: bounded (stage, bucket) histogram -> exclusive
  prefix offsets (48 rows, driver-side) -> broadcast join back -> per-
  (stage, bucket)-PARTITIONED rank + offset.  Identical output to the
  oracle's global window, zero global sorts.

Scale design:

* Winnowing: every window (the frame min and the gram count) is
  PARTITIONED BY doc_id; output is a per-doc summary aggregate that
  combines map-side.  The (hash, pos) pair is packed into ONE int64
  (h * 2^20 + (2^20 - pos)) so the frame min simultaneously resolves the
  rightmost-on-tie rule — identical integer arithmetic in both engines.
  POS_CAP = 2^20 grams/doc; a crawl page is ~10^3.
* Containment: never all-pairs.  Candidate pairs come from an equi-join
  on the shingle key with a deterministic per-shingle fan-in CAP
  (md5-rank, the web_cocitation trade: a shingle shared by > CAP docs
  contributes only its CAP-ranked head, documented recall loss, mirrored
  exactly by the oracle).  Intersection counts combine map-side; the
  per-doc shingle-set sizes join back doc-keyed; the final cut is
  ``orderBy().limit()`` — TakeOrderedAndProject, not a global sort.
  The containment ratio is emitted in integer micro-units via int64
  ``div`` (the SQL_KNN float protocol, exact in both engines).
* Curriculum: the only driver-side structure is the (stage, bucket)
  histogram — 3 * 16 rows BY CONSTRUCTION (both keys are bounded CASE /
  mod expressions), the operators/cover.py dimension-collect rule.  The
  rank window is partitioned by (stage, bucket); a stage hotter than a
  reducer splits across its 16 hash buckets by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

# winnowing parameters (Schleimer et al. fig. 2: guarantee t = w + k - 1)
_K = 3          # shingle/gram width, words
_W = 4          # winnow window, grams
_POS_CAP = 1 << 20   # max grams per doc packable into the int64 key

# containment parameters
_CT_CAP = 20    # fan-in cap: docs kept per shingle (md5-ranked)
_CT_MIN_INTER = 2    # pairs must share >= 2 shingles (hapax noise gate)
_CT_TOPK = 50   # pairs emitted

# curriculum parameters
_CU_T1, _CU_T2 = 220, 380   # n_chars stage cuts (easy/medium/hard)
_CU_B = 16      # hash buckets per stage


def _grams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, gram): 1-based word ``_K``-grams.  The CASE guard
    matters: Spark's ``sequence(1, n)`` DESCENDS for n < 1, it does not
    return empty like DuckDB's ``range``."""
    t = F.split(F.col("text"), " ")
    seq = F.expr(
        f"CASE WHEN size(t) >= {_K} THEN "
        f"transform(sequence(1, size(t) - {_K - 1}), "
        f"i -> array_join(slice(t, i, {_K}), ' ')) "
        f"ELSE array() END")
    return (docs.select("doc_id", t.alias("t"))
            .select("doc_id", F.posexplode(seq).alias("p0", "gram"))
            .select("doc_id", (F.col("p0") + 1).alias("pos"), "gram"))


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing selection over a (doc_id, text) frame:
    (doc_id, ng, fp_h, fp_pos) — one row per selected fingerprint."""
    g = _grams(docs)
    h = F.conv(F.substring(F.md5("gram"), 1, 6), 16, 10).cast("long")
    key = (h * _POS_CAP + (F.lit(_POS_CAP) - F.col("pos"))).alias("key")
    keyed = g.select("doc_id", "pos", key)

    wd = Window.partitionBy("doc_id")
    frame = (Window.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(0, _W - 1))
    starts = (keyed
              .withColumn("ng", F.max("pos").over(wd))
              .withColumn("wmin", F.min("key").over(frame))
              # valid window starts; for docs shorter than one window the
              # single truncated frame at pos=1 selects the global min
              .filter(F.col("pos") <=
                      F.greatest(F.col("ng") - (_W - 1), F.lit(1))))
    return (starts.select("doc_id", "ng", "wmin").distinct()
            .select("doc_id", "ng",
                    (F.col("wmin") / _POS_CAP).cast("long").alias("fp_h"),
                    (F.lit(_POS_CAP) - F.pmod("wmin", F.lit(_POS_CAP)))
                    .cast("long").alias("fp_pos")))


def t_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc winnowing-fingerprint summary: gram count, fingerprint
    count, and sum/min/max of the selected 24-bit hashes plus sum of
    selected positions (any selection error shifts at least one of them).
    """
    fp = winnow_fingerprints(load(spark, sf, "documents"))
    return (fp.groupBy("doc_id")
            .agg(F.max("ng").cast("long").alias("n_grams"),
                 F.count("*").alias("n_fp"),
                 F.sum("fp_h").alias("sum_h"),
                 F.min("fp_h").alias("min_h"),
                 F.max("fp_h").alias("max_h"),
                 F.sum("fp_pos").alias("sum_pos"))
            .orderBy("doc_id"))


SQL_WINNOWING = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, i AS pos,
         CAST(concat('0x', substring(
           md5(array_to_string(list_slice(w, i, i + {_K - 1}), ' ')),
           1, 6)) AS BIGINT) * {_POS_CAP} + ({_POS_CAP} - i) AS key
  FROM t, LATERAL (
    SELECT unnest(range(1, greatest(len(w) - {_K - 1}, 0) + 1)) AS i)
), st AS (
  SELECT doc_id, pos,
         max(pos) OVER (PARTITION BY doc_id) AS ng,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING)
           AS wmin
  FROM g
), fp AS (
  SELECT DISTINCT doc_id, ng, wmin
  FROM st WHERE pos <= greatest(ng - {_W - 1}, 1)
)
SELECT doc_id,
       CAST(max(ng) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_fp,
       CAST(sum(wmin // {_POS_CAP}) AS BIGINT) AS sum_h,
       CAST(min(wmin // {_POS_CAP}) AS BIGINT) AS min_h,
       CAST(max(wmin // {_POS_CAP}) AS BIGINT) AS max_h,
       CAST(sum({_POS_CAP} - wmin % {_POS_CAP}) AS BIGINT) AS sum_pos
FROM fp GROUP BY doc_id ORDER BY doc_id
"""


def containment_pairs(docs: DataFrame) -> DataFrame:
    """Directional containment candidates over a (doc_id, text) frame
    (pre-limit): (src, dst, inter, na, contain_micro)."""
    sh = _grams(docs).select("doc_id", "gram").distinct()
    na = sh.groupBy("doc_id").agg(F.count("*").alias("na"))

    wg = Window.partitionBy("gram").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    capped = (sh.withColumn("rn", F.row_number().over(wg))
              .filter(F.col("rn") <= _CT_CAP).drop("rn"))

    a = capped.select(F.col("gram"), F.col("doc_id").alias("src"))
    b = capped.select(F.col("gram"), F.col("doc_id").alias("dst"))
    inter = (a.join(b, "gram")
             .filter(F.col("src") != F.col("dst"))
             .groupBy("src", "dst").agg(F.count("*").alias("inter")))
    return (inter.filter(F.col("inter") >= _CT_MIN_INTER)
            .join(na.withColumnRenamed("doc_id", "src"), "src")
            .select("src", "dst", "inter", "na",
                    F.expr("(inter * 1000000) div na")
                    .alias("contain_micro")))


def t_shingle_contain(spark: SparkSession, sf: str) -> DataFrame:
    """Top-``_CT_TOPK`` directional containment pairs: src's distinct
    ``_K``-gram set covered by dst, in integer micro-units."""
    return (containment_pairs(load(spark, sf, "documents"))
            .orderBy(F.col("contain_micro").desc(), "src", "dst")
            .limit(_CT_TOPK))


SQL_SHINGLE_CONTAIN = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, i + {_K - 1}), ' ') AS gram
  FROM t, LATERAL (
    SELECT unnest(range(1, greatest(len(w) - {_K - 1}, 0) + 1)) AS i)
), na AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS na FROM sh GROUP BY doc_id
), capped AS (
  SELECT gram, doc_id FROM sh
  QUALIFY row_number() OVER (
    PARTITION BY gram
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= {_CT_CAP}
), inter AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, CAST(count(*) AS BIGINT) AS inter
  FROM capped a JOIN capped b USING (gram)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT src, dst, inter, na,
       (inter * 1000000) // na AS contain_micro
FROM inter JOIN na ON na.doc_id = src
WHERE inter >= {_CT_MIN_INTER}
ORDER BY contain_micro DESC, src, dst
LIMIT {_CT_TOPK}
"""


def t_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    """Global curriculum step index (stage asc, then deterministic
    md5 shuffle within stage) with NO global sort: bounded histogram ->
    exclusive offsets -> partitioned rank."""
    docs = load(spark, sf, "documents")
    stage = (F.when(F.col("n_chars") < _CU_T1, 0)
             .when(F.col("n_chars") < _CU_T2, 1)
             .otherwise(2)).cast("int")
    hkey = F.md5(F.col("doc_id").cast("string"))
    bucket = F.pmod(
        F.conv(F.substring(hkey, 1, 2), 16, 10).cast("long"),
        F.lit(_CU_B)).cast("long")
    base = docs.select("doc_id", stage.alias("stage"),
                       bucket.alias("bucket"), hkey.alias("hkey"))

    # bounded by construction: 3 stages x _CU_B buckets = 48 rows max
    hist = sorted((r["stage"], r["bucket"], r["n"]) for r in
                  base.groupBy("stage", "bucket")
                  .agg(F.count("*").alias("n")).collect())
    offs, run = [], 0
    for st, bk, n in hist:
        offs.append((st, bk, run))
        run += n
    off_df = spark.createDataFrame(offs, "stage int, bucket long, off long")

    wr = Window.partitionBy("stage", "bucket").orderBy("hkey", "doc_id")
    return (base.withColumn("rn", F.row_number().over(wr))
            .join(F.broadcast(off_df), ["stage", "bucket"])
            .select("doc_id", "stage", "bucket",
                    (F.col("off") + F.col("rn")).cast("long").alias("step"))
            .orderBy("step"))


SQL_CURRICULUM_ORDER = f"""
WITH base AS (
  SELECT doc_id,
         CAST(CASE WHEN n_chars < {_CU_T1} THEN 0
                   WHEN n_chars < {_CU_T2} THEN 1
                   ELSE 2 END AS INTEGER) AS stage,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
              AS BIGINT) % {_CU_B} AS bucket,
         md5(CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
)
SELECT doc_id, stage, bucket,
       row_number() OVER (ORDER BY stage, bucket, hkey, doc_id) AS step
FROM base ORDER BY step
"""


QUERIES = {
    "train_winnowing": (t_winnowing, SQL_WINNOWING),
    "train_shingle_contain": (t_shingle_contain, SQL_SHINGLE_CONTAIN),
    "train_curriculum_order": (t_curriculum_order, SQL_CURRICULUM_ORDER),
}
