"""RFC 3492 Punycode (Bootstring) decode as a row-local Catalyst fold
(``web_punycode``) — completing the byte-level web-standards family
(UTF-8 validation, HTTP/1.1 parse, gzip members, WARC walk, splittable
CSV/JSON/grep).

Why it exists: internationalized domain names arrive in crawls as
``xn--...`` ACE labels; resolving them is a per-label Bootstring decode —
variable-length integer clusters with an ADAPTIVE bias (the decoded history
changes how subsequent digits parse), insertions into a growing code-point
string, and a divide-until-threshold bias adaptation loop.  It is the
registry's representative ADAPTIVE state machine: unlike the UTF-8 fold
(fixed transition table) the transition function itself evolves with the
output, so the fold state carries the whole decoder configuration
(output array, n, i, bias, w, k, iold, first, pending).

Engine shape: the corpus (arithmetically constructed in BOTH engines from
md5 hex — letters-only digit alphabet, documented below) is decoded by ONE
``F.aggregate`` over character positions; every step is integer arithmetic
+ array slice/concat insertion, zero Python, zero shuffles past the scan —
10^12 labels parallelize embarrassingly.  The adapt divide-loop is unrolled
to ``_ADAPT_UNROLL`` levels — sufficient for any post-scale delta up to
455*35^3 ~ 19.5M, i.e. any label whose per-cluster code-point jump x length
stays under ~39M (every label <= 35 chars within Unicode, and this corpus
by a 600x margin).  A theorem about THIS corpus, pytest-pinned: with digits
<= 15, t reaches tmax at the third cluster digit and the post-first-adapt
bias keeps t above every digit, so clusters cap at 3 digits, deltas at
18915, and the divide-loop never fires here (its semantics are anchored via
astral-plane stdlib round-trips in the python mirror, where single
U+10FFxx labels make it iterate exactly once).

Semantics notes: a trailing unterminated digit cluster sets ``valid = 0``
(every 7th label is a forced-continuing 2-digit head that ends mid-cluster
— see _TR_PEND for why pending is only reachable at the unadapted head on
this corpus).  Every 5th label prepends ``pppppa`` — the maximum-weight
head cluster (18915), exercising the deep i-div-nlen insert path and the
largest adapt delta the alphabet admits.
Integer bounds are corpus-proven (3-digit cluster cap): max w = 35^2, max
i < 19k — all exact int64 in both engines; every division has non-negative
operands so truncation == floor cross-engine.

Oracle: the same transition walked by a recursive CTE over character
positions carrying the full state INCLUDING the output LIST; per-step
helper quantities (digit, i', t, the adapt chain) are computed as LATERAL
aliases inside a subquery wrapping the recursive reference — fresh ``h_``
names, because DuckDB shadows lateral aliases with the recursive table's
same-named columns (the DTW-oracle trap).  The python mirror is anchored
against CPython's stdlib ``punycode`` codec on real Unicode round-trips in
pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

_PNY_DOCS = 300
_PNY_BASIC = 4       # basic-part chars (md5 hex)
_PNY_EXT = 9         # raw extended chars before mapping
# divide-loop levels: sufficient for any post-scale delta <= 455 * 35^3 =
# 19.5M (the corpus maxes at 18915 PRE-scale — the loop provably never
# fires here; see the module docstring).  Kept minimal on purpose: each
# Catalyst when() level TRIPLES the references to the previous delta
# expression (3^U copies), and U = 4 was measured to broadcast a 4.2 MiB
# task binary.
_ADAPT_UNROLL = 3
_PNY_TMIN, _PNY_TMAX, _PNY_BASE = 1, 26, 36
_PNY_SKEW, _PNY_DAMP = 38, 700
_PNY_INIT_N, _PNY_INIT_BIAS = 128, 72
_PNY_CUTOFF = 455    # ((BASE - TMIN) * TMAX) // 2

# hex -> letters-only digit alphabet: values {0, 8..15}; 'a' (digit 0) is
# the common terminator, 'i'..'p' continue while t == 1
_TR_FROM = "0123456789abcdef"
_TR_TO = "aaaaaaaaijklmnop"
# forced-continuing alphabet for the planted-PENDING docs: no digit-0 at
# all, so a 2-char extended part ends INSIDE the first cluster (t stays
# tmin for the first two digits).  Ending mid-cluster any later is
# impossible on this corpus: once a small-delta cluster adapts, bias
# drops and t == tmax > every digit, so clusters become self-terminating
# — the pending path exists ONLY at the unadapted head, which is exactly
# what this plant exercises.
_TR_PEND = "ijklmnopijklmnop"


def _label_cols():
    """(basic, ext) string Columns for doc_id — the arithmetic corpus."""
    did = F.col("doc_id").cast("string")
    basic = F.substring(F.md5(F.concat(F.lit("puny_b"), did)), 1, _PNY_BASIC)
    raw = F.md5(F.concat(F.lit("puny_e"), did))
    ext = F.when(
        F.col("doc_id") % 7 == 3,
        F.translate(F.substring(raw, 1, 2), _TR_FROM, _TR_PEND)
    ).otherwise(F.concat(
        F.when(F.col("doc_id") % 5 == 0, F.lit("pppppa")).otherwise(F.lit("")),
        F.translate(F.substring(raw, 1, _PNY_EXT), _TR_FROM, _TR_TO),
        F.lit("a")))
    return basic, ext


def _fdiv(a, b):
    """Exact non-negative integer division (operands << 2^26, so the double
    quotient's ulp is far below the 1/b gap to the next integer)."""
    return F.floor(a / b).cast("long")


def _decode_state(ext_col):
    """F.aggregate fold returning the final decoder state struct."""
    def step(s, p):
        dgt = F.ascii(F.substring(ext_col, p, 1)) - 97
        i2 = s["i"] + dgt * s["w"]
        t = (F.when(s["k"] <= s["bias"] + _PNY_TMIN, _PNY_TMIN)
              .when(s["k"] >= s["bias"] + _PNY_TMAX, _PNY_TMAX)
              .otherwise(s["k"] - s["bias"])).cast("long")
        nlen = F.size(s["out"]) + 1
        # adapt: scale delta, then the unrolled divide-until-<=cutoff loop
        delta = F.when(s["first"] == 1,
                       _fdiv(i2 - s["iold"], _PNY_DAMP)) \
                 .otherwise(_fdiv(i2 - s["iold"], 2))
        delta = delta + _fdiv(delta, nlen)
        kk = F.lit(0).cast("long")
        for _ in range(_ADAPT_UNROLL):
            over = delta > _PNY_CUTOFF
            kk = F.when(over, kk + _PNY_BASE).otherwise(kk)
            delta = F.when(over, _fdiv(delta, 35)).otherwise(delta)
        bias2 = kk + _fdiv(delta * _PNY_BASE, delta + _PNY_SKEW)
        n2 = s["n"] + _fdiv(i2, nlen)
        i3 = i2 % nlen
        out2 = F.concat(F.slice(s["out"], 1, i3),
                        F.array(n2),
                        F.slice(s["out"], i3 + 1, nlen - 1 - i3))
        done = F.struct(out2.alias("out"), n2.alias("n"),
                        (i3 + 1).alias("i"), bias2.alias("bias"),
                        F.lit(1).cast("long").alias("w"),
                        F.lit(_PNY_BASE).cast("long").alias("k"),
                        (i3 + 1).alias("iold"),
                        F.lit(0).cast("long").alias("first"),
                        F.lit(0).cast("long").alias("pend"))
        cont = F.struct(s["out"].alias("out"), s["n"].alias("n"),
                        i2.alias("i"), s["bias"].alias("bias"),
                        (s["w"] * (_PNY_BASE - t)).alias("w"),
                        (s["k"] + _PNY_BASE).alias("k"),
                        s["iold"].alias("iold"), s["first"].alias("first"),
                        F.lit(1).cast("long").alias("pend"))
        return F.when(dgt < t, done).otherwise(cont)

    out0 = F.transform(
        F.sequence(F.lit(1), F.lit(_PNY_BASIC)),
        lambda j: F.ascii(F.substring(F.col("basic"), j, 1)).cast("long"))
    init = F.struct(out0.alias("out"),
                    F.lit(_PNY_INIT_N).cast("long").alias("n"),
                    F.lit(0).cast("long").alias("i"),
                    F.lit(_PNY_INIT_BIAS).cast("long").alias("bias"),
                    F.lit(1).cast("long").alias("w"),
                    F.lit(_PNY_BASE).cast("long").alias("k"),
                    F.lit(0).cast("long").alias("iold"),
                    F.lit(1).cast("long").alias("first"),
                    F.lit(0).cast("long").alias("pend"))
    idx = F.sequence(F.lit(1), F.length(ext_col))
    return F.aggregate(idx, init, step)


def g_punycode(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("doc_id") < _PNY_DOCS)
    basic, ext = _label_cols()
    lab = d.select("doc_id", F.concat(basic, F.lit("-"), ext).alias("s"))
    # parse the ACE label: basic part before the delimiter, digits after
    lab = lab.select("doc_id",
                     F.split("s", "-").getItem(0).alias("basic"),
                     F.split("s", "-").getItem(1).alias("ext"))
    st = _decode_state(F.col("ext"))
    out = lab.select("doc_id", st.alias("st"))
    o = F.col("st.out")
    return out.select(
        "doc_id",
        (1 - F.col("st.pend")).alias("valid"),
        F.size(o).cast("long").alias("out_len"),
        F.array_max(o).alias("cp_max"),
        F.md5(F.concat_ws(",", F.transform(o, lambda v: v.cast("string"))))
         .alias("digest"),
    ).orderBy("doc_id")


def _sql_adapt_chain() -> str:
    """Lateral-alias adapt chain: h_d0 .. h_d{U}, h_k0 .. h_k{U}."""
    lines = [f"CASE WHEN h_first = 1 THEN (h_i2 - h_iold) // {_PNY_DAMP}"
             f" ELSE (h_i2 - h_iold) // 2 END AS h_dpre",
             "h_dpre + h_dpre // h_nlen AS h_d0",
             "CAST(0 AS BIGINT) AS h_k0"]
    for j in range(1, _ADAPT_UNROLL + 1):
        lines.append(f"CASE WHEN h_d{j-1} > {_PNY_CUTOFF} THEN h_d{j-1} // 35"
                     f" ELSE h_d{j-1} END AS h_d{j}")
        lines.append(f"CASE WHEN h_d{j-1} > {_PNY_CUTOFF} THEN h_k{j-1} + "
                     f"{_PNY_BASE} ELSE h_k{j-1} END AS h_k{j}")
    u = _ADAPT_UNROLL
    lines.append(f"h_k{u} + (h_d{u} * {_PNY_BASE}) // (h_d{u} + {_PNY_SKEW})"
                 f" AS h_bias2")
    return ",\n         ".join(lines)


SQL_PUNYCODE = f"""
WITH RECURSIVE src AS (
  SELECT doc_id,
         substring(md5(concat('puny_b', CAST(doc_id AS VARCHAR))), 1,
                   {_PNY_BASIC}) AS basic,
         CASE WHEN doc_id % 7 = 3 THEN
           translate(substring(md5(concat('puny_e',
                        CAST(doc_id AS VARCHAR))), 1, 2),
                     '{_TR_FROM}', '{_TR_PEND}')
         ELSE concat(
           CASE WHEN doc_id % 5 = 0 THEN 'pppppa' ELSE '' END,
           translate(substring(md5(concat('puny_e',
                        CAST(doc_id AS VARCHAR))), 1, {_PNY_EXT}),
                     '{_TR_FROM}', '{_TR_TO}'),
           'a') END AS ext
  FROM documents WHERE doc_id < {_PNY_DOCS}
), lab AS (
  -- build then re-parse the ACE label, mirroring the engine
  SELECT doc_id,
         string_split(concat(basic, '-', ext), '-')[1] AS basic,
         string_split(concat(basic, '-', ext), '-')[2] AS ext
  FROM src
), walk AS (
  SELECT doc_id, ext, 0 AS pos,
         list_transform(generate_series(1, {_PNY_BASIC}),
                        j -> CAST(ascii(substring(basic, j, 1)) AS BIGINT))
           AS out,
         CAST({_PNY_INIT_N} AS BIGINT) AS n, CAST(0 AS BIGINT) AS i,
         CAST({_PNY_INIT_BIAS} AS BIGINT) AS bias,
         CAST(1 AS BIGINT) AS w, CAST({_PNY_BASE} AS BIGINT) AS k,
         CAST(0 AS BIGINT) AS iold, CAST(1 AS BIGINT) AS first,
         CAST(0 AS BIGINT) AS pend
  FROM lab
  UNION ALL
  SELECT doc_id, ext, pos + 1,
         CASE WHEN h_term THEN out[1:h_i3] || [h_n2] || out[h_i3+1:]
              ELSE out END,
         CASE WHEN h_term THEN h_n2 ELSE n END,
         CASE WHEN h_term THEN h_i3 + 1 ELSE h_i2 END,
         CASE WHEN h_term THEN h_bias2 ELSE bias END,
         CASE WHEN h_term THEN 1 ELSE w * ({_PNY_BASE} - h_t) END,
         CASE WHEN h_term THEN {_PNY_BASE} ELSE k + {_PNY_BASE} END,
         CASE WHEN h_term THEN h_i3 + 1 ELSE iold END,
         CASE WHEN h_term THEN 0 ELSE first END,
         CASE WHEN h_term THEN 0 ELSE 1 END
  FROM (
    SELECT *,
         ascii(substring(ext, pos + 1, 1)) - 97 AS h_dgt,
         i + h_dgt * w AS h_i2,
         CASE WHEN k <= bias + {_PNY_TMIN} THEN {_PNY_TMIN}
              WHEN k >= bias + {_PNY_TMAX} THEN {_PNY_TMAX}
              ELSE k - bias END AS h_t,
         h_dgt < h_t AS h_term,
         len(out) + 1 AS h_nlen,
         iold AS h_iold, first AS h_first,
         {_sql_adapt_chain()},
         n + h_i2 // h_nlen AS h_n2,
         h_i2 % h_nlen AS h_i3
    FROM walk WHERE pos < length(ext)
  )
)
SELECT doc_id,
       1 - pend AS valid,
       CAST(len(out) AS BIGINT) AS out_len,
       list_max(out) AS cp_max,
       md5(array_to_string(list_transform(out, v -> CAST(v AS VARCHAR)), ','))
         AS digest
FROM walk WHERE pos = length(ext)
ORDER BY doc_id
"""


QUERIES = {
    "web_punycode": (g_punycode, SQL_PUNYCODE),
}
