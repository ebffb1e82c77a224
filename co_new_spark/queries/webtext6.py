"""Web-text surface, part 6: byte-level UTF-8 validation (RFC 3629) — the
sanitation step every Common-Crawl-style pipeline runs between raw transfer
bytes and text processing: shortest-form enforcement (no overlongs), the
surrogate gap (U+D800..DFFF unencodable), the U+10FFFF ceiling, and
truncated-sequence detection, with per-document codepoint width profiles.

One driver-oracle-checked entry:

* ``web_utf8_validate`` — build a deterministic byte string per document
  (8 ASCII bytes from the text, a fixed valid 2/3/4-byte span, a parity
  extra, then one of seven planted tails: valid, overlong ``C0 AF``,
  surrogate ``ED A0 80``, truncated ``E2 82``, bare continuation ``80``,
  beyond-U+10FFFF ``F4 90 80 80``, invalid lead ``FE``), then validate the
  byte array with a GENERIC RFC 3629 state machine that knows nothing about
  the construction: per-doc ASCII/2/3/4-byte sequence counts up to the first
  error, the 1-based offset of the first invalid byte (the lead's offset for
  a truncated tail), and the validity flag.

The validator is a row-local Catalyst ``aggregate`` fold over the byte array
(struct state: pending-continuation count, second-byte constraint class from
the lead — E0→A0..BF, ED→80..9F, F0→90..BF, F4→80..8F — width, counts,
first-error offset).  No UDF, no shuffle: the only exchange in the plan is
the presentation sort.  The DuckDB oracle restates BOTH the construction and
the state machine — the transition logic as a recursive CTE walking each
document's byte positions — so a validator bug and a corpus bug are both
caught.  tests/test_webtext6.py additionally anchors the validity flag to
CPython's own ``bytes.decode("utf-8")`` acceptance on every corpus row.

Scale notes (100 TB): per-row, embarrassingly parallel — the fold pipelines
over the scan; Catalyst higher-order functions run interpreted (not
codegen), which is fine at header-sized arrays; for multi-KB payloads the
vectorized mapInPandas pattern of web_cdc_chunks (training5) is the
documented fast path.  No data shuffle anywhere before the output sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

# fixed valid span: é (C3 A9), € (E2 82 AC), 😀 (F0 9F 98 80)
_VALID_SPAN = [195, 169, 226, 130, 172, 240, 159, 152, 128]
# parity extra: ö (C3 B6) on even doc_id
_PARITY_EXTRA = [195, 182]
# planted tails by doc_id % 7 (class 0 = clean)
_TAILS = {
    1: [192, 175],            # overlong '/' (C0 AF) — C0/C1 never valid leads
    2: [237, 160, 128],       # CESU-8 surrogate U+D800 (ED A0 80)
    3: [226, 130],            # truncated 3-byte seq (E2 82 ...)
    4: [128],                 # bare continuation byte
    5: [244, 144, 128, 128],  # F4 90 80 80 = U+110000 > U+10FFFF
    6: [254],                 # FE — never a UTF-8 byte
}
_N_ASCII = 8  # leading ASCII bytes taken from the document text


def _arr(vals):
    return F.array(*[F.lit(v) for v in vals]).cast("array<int>")


def _built(docs: DataFrame) -> DataFrame:
    """(doc_id, bs) — deterministic byte array per document."""
    ascii_part = F.transform(
        F.sequence(F.lit(1), F.lit(_N_ASCII)),
        lambda i: F.ascii(F.col("text").substr(i, F.lit(1)))).cast("array<int>")
    extra = F.when(F.pmod("doc_id", F.lit(2)) == 0,
                   _arr(_PARITY_EXTRA)).otherwise(_arr([]))
    tail = _arr([])
    for k, t in _TAILS.items():
        tail = F.when(F.pmod("doc_id", F.lit(7)) == k, _arr(t)).otherwise(tail)
    return (docs
            .filter(F.col("text").isNotNull())
            .filter(F.length("text") >= _N_ASCII)
            .select("doc_id",
                    F.concat(ascii_part, _arr(_VALID_SPAN), extra, tail)
                     .alias("bs")))


# struct-state field order for the fold
_S = ("err", "exp", "cls", "w", "n1", "n2", "n3", "n4", "lead", "pos")


def _st(**kw):
    return F.struct(*[kw[f].alias(f) for f in _S])


def _keep(acc, **kw):
    vals = {f: acc[f] for f in _S}
    vals.update(kw)
    return _st(**vals)


def validate_utf8(raw: DataFrame) -> DataFrame:
    """Generic RFC 3629 validator over (doc_id, bs array<int>) rows."""
    zero = F.lit(0).cast("int")

    def merge(acc, b):
        pos = acc["pos"] + F.lit(1)
        # continuation expected: range depends on the lead's constraint class
        ok_cont = (
            F.when(acc["cls"] == 1, b.between(160, 191))
             .when(acc["cls"] == 2, b.between(128, 159))
             .when(acc["cls"] == 3, b.between(144, 191))
             .when(acc["cls"] == 4, b.between(128, 143))
             .otherwise(b.between(128, 191)))
        done = acc["exp"] == 1  # this continuation completes the sequence
        cont_state = F.when(
            ok_cont,
            _keep(acc, pos=pos, exp=acc["exp"] - 1, cls=zero,
                  n2=acc["n2"] + F.when(done & (acc["w"] == 2), 1).otherwise(0),
                  n3=acc["n3"] + F.when(done & (acc["w"] == 3), 1).otherwise(0),
                  n4=acc["n4"] + F.when(done & (acc["w"] == 4), 1).otherwise(0)),
        ).otherwise(_keep(acc, pos=pos, err=pos))
        # lead expected
        lead_state = (
            F.when(b <= 127, _keep(acc, pos=pos, n1=acc["n1"] + F.lit(1)))
             .when(b.between(194, 223),
                   _keep(acc, pos=pos, exp=F.lit(2 - 1).cast("int"),
                         cls=zero, w=F.lit(2).cast("int"), lead=pos))
             .when(b == 224, _keep(acc, pos=pos, exp=F.lit(2).cast("int"),
                                   cls=F.lit(1).cast("int"),
                                   w=F.lit(3).cast("int"), lead=pos))
             .when(b == 237, _keep(acc, pos=pos, exp=F.lit(2).cast("int"),
                                   cls=F.lit(2).cast("int"),
                                   w=F.lit(3).cast("int"), lead=pos))
             .when(b.between(225, 239),  # E1..EC, EE, EF (E0/ED caught above)
                   _keep(acc, pos=pos, exp=F.lit(2).cast("int"),
                         cls=zero, w=F.lit(3).cast("int"), lead=pos))
             .when(b == 240, _keep(acc, pos=pos, exp=F.lit(3).cast("int"),
                                   cls=F.lit(3).cast("int"),
                                   w=F.lit(4).cast("int"), lead=pos))
             .when(b == 244, _keep(acc, pos=pos, exp=F.lit(3).cast("int"),
                                   cls=F.lit(4).cast("int"),
                                   w=F.lit(4).cast("int"), lead=pos))
             .when(b.between(241, 243),
                   _keep(acc, pos=pos, exp=F.lit(3).cast("int"),
                         cls=zero, w=F.lit(4).cast("int"), lead=pos))
             .otherwise(_keep(acc, pos=pos, err=pos)))  # 80..C1, F5..FF
        return (F.when(acc["err"] != 0, _keep(acc, pos=pos))
                 .when(acc["exp"] > 0, cont_state)
                 .otherwise(lead_state))

    def finish(acc):
        # truncated trailing sequence: error at the lead's offset
        err = F.when((acc["err"] == 0) & (acc["exp"] > 0),
                     acc["lead"]).otherwise(acc["err"])
        return F.struct(err.alias("err"), acc["n1"].alias("n1"),
                        acc["n2"].alias("n2"), acc["n3"].alias("n3"),
                        acc["n4"].alias("n4"))

    init = _st(**{f: zero for f in _S})
    out = raw.select(
        "doc_id", F.size("bs").alias("nbytes"),
        F.aggregate("bs", init, merge, finish).alias("r"))
    return (out.select(
                "doc_id",
                F.col("nbytes").cast("long").alias("nbytes"),
                F.col("r.n1").cast("long").alias("n_ascii"),
                F.col("r.n2").cast("long").alias("n_2byte"),
                F.col("r.n3").cast("long").alias("n_3byte"),
                F.col("r.n4").cast("long").alias("n_4byte"),
                F.col("r.err").cast("long").alias("err_off"),
                (F.col("r.err") == 0).cast("long").alias("valid"))
            .orderBy("doc_id"))


def t_utf8_validate(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "text")
    return validate_utf8(_built(docs))


def _sql_utf8_validate() -> str:
    span = ", ".join(str(v) for v in _VALID_SPAN)
    extra = ", ".join(str(v) for v in _PARITY_EXTRA)
    tails = " ".join(
        f"WHEN doc_id % 7 = {k} THEN [{', '.join(str(v) for v in t)}]"
        for k, t in _TAILS.items())
    return f"""
WITH RECURSIVE built AS (
  SELECT doc_id,
         list_transform(range(1, {_N_ASCII} + 1),
                        i -> ascii(substr(text, CAST(i AS INT), 1)))
         || [{span}]
         || (CASE WHEN doc_id % 2 = 0 THEN [{extra}] ELSE [] END)
         || (CASE {tails} ELSE [] END) AS bs
  FROM documents
  WHERE text IS NOT NULL AND length(text) >= {_N_ASCII}),
b AS (
  SELECT doc_id, len(bs) AS nb, unnest(bs) AS v,
         generate_subscripts(bs, 1) AS pos
  FROM built),
walk AS (
  -- RFC 3629 state machine, one recursion step per byte position
  SELECT doc_id, nb, 0 AS pos, 0 AS err, 0 AS exp, 0 AS cls, 0 AS w,
         0 AS n1, 0 AS n2, 0 AS n3, 0 AS n4, 0 AS lead
  FROM (SELECT DISTINCT doc_id, nb FROM b)
  UNION ALL
  SELECT w0.doc_id, w0.nb, w0.pos + 1,
    CASE WHEN w0.exp > 0 THEN
           CASE WHEN ok_cont THEN 0 ELSE w0.pos + 1 END
         WHEN b.v <= 127 OR is_lead THEN 0
         ELSE w0.pos + 1 END AS err,
    CASE WHEN w0.exp > 0 THEN CASE WHEN ok_cont THEN w0.exp - 1 ELSE 0 END
         WHEN b.v <= 127 THEN 0
         WHEN b.v BETWEEN 194 AND 223 THEN 1
         WHEN b.v BETWEEN 224 AND 239 THEN 2
         WHEN b.v BETWEEN 240 AND 244 THEN 3
         ELSE 0 END AS exp,
    CASE WHEN w0.exp > 0 THEN 0
         WHEN b.v = 224 THEN 1 WHEN b.v = 237 THEN 2
         WHEN b.v = 240 THEN 3 WHEN b.v = 244 THEN 4
         ELSE 0 END AS cls,
    CASE WHEN w0.exp > 0 THEN w0.w
         WHEN b.v BETWEEN 194 AND 223 THEN 2
         WHEN b.v BETWEEN 224 AND 239 THEN 3
         WHEN b.v BETWEEN 240 AND 244 THEN 4
         ELSE 0 END AS w,
    w0.n1 + CASE WHEN w0.exp = 0 AND b.v <= 127 THEN 1 ELSE 0 END AS n1,
    w0.n2 + CASE WHEN w0.exp = 1 AND ok_cont AND w0.w = 2
                 THEN 1 ELSE 0 END AS n2,
    w0.n3 + CASE WHEN w0.exp = 1 AND ok_cont AND w0.w = 3
                 THEN 1 ELSE 0 END AS n3,
    w0.n4 + CASE WHEN w0.exp = 1 AND ok_cont AND w0.w = 4
                 THEN 1 ELSE 0 END AS n4,
    CASE WHEN w0.exp = 0 AND is_lead AND b.v > 127
         THEN w0.pos + 1 ELSE w0.lead END AS lead
  FROM (SELECT *,
          CASE WHEN cls = 1 THEN 160 WHEN cls = 2 THEN 128
               WHEN cls = 3 THEN 144 WHEN cls = 4 THEN 128
               ELSE 128 END AS lo,
          CASE WHEN cls = 1 THEN 191 WHEN cls = 2 THEN 159
               WHEN cls = 3 THEN 191 WHEN cls = 4 THEN 143
               ELSE 191 END AS hi
        FROM walk) w0
  JOIN b ON b.doc_id = w0.doc_id AND b.pos = w0.pos + 1,
  LATERAL (SELECT b.v BETWEEN w0.lo AND w0.hi AS ok_cont,
                  b.v BETWEEN 194 AND 244 AS is_lead) f
  WHERE w0.err = 0 AND w0.pos < w0.nb),
terminal AS (
  SELECT doc_id, nb, err, exp, lead, n1, n2, n3, n4,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos DESC) AS rn
  FROM walk)
SELECT doc_id, CAST(nb AS BIGINT) AS nbytes,
       CAST(n1 AS BIGINT) AS n_ascii, CAST(n2 AS BIGINT) AS n_2byte,
       CAST(n3 AS BIGINT) AS n_3byte, CAST(n4 AS BIGINT) AS n_4byte,
       CAST(CASE WHEN err = 0 AND exp > 0 THEN lead ELSE err END
            AS BIGINT) AS err_off,
       CAST(CASE WHEN err = 0 AND exp = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS valid
FROM terminal WHERE rn = 1 ORDER BY doc_id
"""


QUERIES = {
    "web_utf8_validate": (t_utf8_validate, _sql_utf8_validate()),
}
