"""WARC codec: framing contracts + decoy resistance + entry parity."""

import pytest

from co_new_spark.functions import warc


def test_single_record_roundtrip():
    rec = warc.build_record("https://a.co/x", b"hello world")
    out = warc.parse_warc(rec)
    assert len(out) == 1
    r = out[0]
    assert r["uri"] == "https://a.co/x"
    assert r["content_length"] == 11
    assert r["offset"] == 0
    assert r["header_length"] + r["content_length"] + 4 == len(rec)


def test_multi_record_offsets_and_decoy_payload():
    # record 2's payload CONTAINS a full fake record — a split-on-magic
    # parser would report 4 records / wrong offsets
    fake = warc.build_record("https://evil/d", b"xx")
    blob = (warc.build_record("u1", b"a" * 7)
            + warc.build_record("u2", fake)
            + warc.build_record("u3", b""))
    out = warc.parse_warc(blob)
    assert [r["uri"] for r in out] == ["u1", "u2", "u3"]
    assert out[1]["content_length"] == len(fake)
    for prev, cur in zip(out, out[1:]):
        assert cur["offset"] == (prev["offset"] + prev["header_length"]
                                 + prev["content_length"] + 4)
    assert (out[-1]["offset"] + out[-1]["header_length"]
            + out[-1]["content_length"] + 4 == len(blob))


def test_malformed_records_raise():
    good = warc.build_record("u", b"abc")
    with pytest.raises(ValueError):  # truncated payload
        warc.parse_warc(good[:-6])
    with pytest.raises(ValueError):  # bad version line
        warc.parse_warc(b"HTTP/1.1 200\r\n\r\n" + good)
    # missing Content-Length
    noclen = good.replace(b"Content-Length: 3\r\n", b"")
    with pytest.raises(ValueError):
        warc.parse_warc(noclen)
    # header never terminates
    with pytest.raises(ValueError):
        warc.parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n")


def test_warc_entry_stats_consistent(spark):
    """Entry invariants straight off the documents table: record counts
    tile the table, file_bytes = headers + payloads + separators, offsets
    are the exact prefix sums (verified via the closed form: sum of
    offsets + sum of record sizes == n * file_size telescopes per shard)."""
    from co_new_spark.queries.warc_q import _N_SHARDS, t_warc_scan
    from co_new_spark.sources.tables import load

    sf = "/root/testdata/sf0.001"
    rows = t_warc_scan(spark, sf).collect()
    assert len(rows) == _N_SHARDS
    n_docs = load(spark, sf, "documents").count()
    assert sum(r.n_records for r in rows) == n_docs
    for r in rows:
        assert r.file_bytes == r.header_bytes + r.payload_bytes + 4 * r.n_records
        # last record's end == file size => offsets strictly inside the file
        assert r.sum_offsets < r.n_records * r.file_bytes


def test_wet_export_geometry(spark):
    """WET shards: container identity (wet = headers + payloads + seps),
    extraction never grows bytes (yield <= 1.0), every latest-url record
    lands in exactly one shard."""
    from co_new_spark.queries.warc_q import _WET_SHARDS, t_wet_export
    from co_new_spark.queries.webtext_q import _fixture

    rows = t_wet_export(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= _WET_SHARDS
    n_urls = _fixture(spark).select("url").distinct().count()
    assert sum(r.n_records for r in rows) == n_urls
    for r in rows:
        assert r.wet_bytes == r.header_bytes + r.text_bytes + 4 * r.n_records
        assert 0 < r.yield_micro <= 1_000_000


def test_cdx_index_offsets_tile_and_surt(spark):
    """CDX: within each shard the records tile the WARC byte range exactly
    (offset[i+1] = offset[i] + rec_bytes[i] in (urlkey, ts) order), keys
    are SURT-formed, one line per CAPTURE (not per url)."""
    from co_new_spark.queries.warc_q import t_cdx_index
    from co_new_spark.queries.webtext_q import _fixture

    rows = t_cdx_index(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == _fixture(spark).count()  # every capture indexed
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for recs in by_shard.values():
        recs.sort(key=lambda r: r.offset)
        assert recs[0].offset == 0
        for a, b in zip(recs, recs[1:]):
            assert b.offset == a.offset + a.rec_bytes
    # SURT: reversed host labels before ')', path after
    k = rows[0].urlkey
    assert ")" in k and "," in k.split(")")[0]
    assert k.split(")")[1].startswith("/")


def test_wat_envelope_is_valid_json(spark):
    """Every WAT payload must parse as JSON and carry exactly the fixture's
    3 outlinks per page; the shard stats must tile the file geometry."""
    import json

    from pyspark.sql import functions as F

    from co_new_spark.queries.mat import materialize
    from co_new_spark.queries.warc_q import t_wat_export, wat_payload_cols
    from co_new_spark.queries.webgraph import _link_pages
    from tests.conftest import SF_DIR

    pg = materialize(_link_pages(spark), "linkpages", key=SF_DIR)
    _, payload = wat_payload_cols()
    sample = pg.select("url", payload.alias("p"), F.length("html").alias("hb")).limit(20).collect()
    assert sample
    for r in sample:
        env = json.loads(r["p"])["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == r["url"]
        assert env["Payload-Metadata"]["Actual-Content-Length"] == r["hb"]
        links = env["Payload-Metadata"]["HTML-Metadata"]["Links"]
        assert len(links) == 3 and all(l["url"].startswith("https://") for l in links)

    out = {r["shard"]: r for r in t_wat_export(spark, SF_DIR).collect()}
    n = sum(r["n_records"] for r in out.values())
    assert sum(r["n_links"] for r in out.values()) == 3 * n
    for r in out.values():
        # per-shard file geometry: wat_bytes == sum of record sizes
        assert r["wat_bytes"] > r["json_bytes"] > 0


def test_build_record_extra_headers_roundtrip():
    from co_new_spark.functions import warc

    rec = warc.build_record(
        "https://a.co/x", b"", warc_type="revisit",
        extra_headers=[("WARC-Date", "2024-01-01T00:00:07Z"),
                       ("WARC-Refers-To-Target-URI", "https://a.co/x")])
    out = warc.parse_warc(rec)
    assert len(out) == 1
    assert out[0]["warc_type"] == "revisit"
    assert out[0]["content_length"] == 0
    # extra headers land between Target-URI and Content-Length, in order
    head = rec.split(b"\r\n\r\n")[0].decode()
    lines = head.split("\r\n")
    assert lines[3].startswith("WARC-Date:")
    assert lines[4].startswith("WARC-Refers-To-Target-URI:")
    assert lines[5].startswith("Content-Length:")


def test_warc_revisit_dedup_semantics(spark):
    from co_new_spark.queries.warc_q import t_warc_revisit
    from tests.conftest import SF_DIR

    rows = {r["shard"]: r for r in t_warc_revisit(spark, SF_DIR).collect()}
    n_resp = sum(r["n_response"] for r in rows.values())
    n_rev = sum(r["n_revisit"] for r in rows.values())
    # 500 docs, 1 + doc_id % 3 captures each: exactly one response per doc
    assert n_resp == 500
    assert n_rev == sum(d % 3 for d in range(500))
    for r in rows.values():
        # revisits store zero payload: savings == logical - stored >= 0,
        # with equality only if the shard holds no revisit
        assert r["saved_bytes"] == (r["logical_payload_bytes"]
                                    - r["stored_payload_bytes"])
        assert (r["saved_bytes"] > 0) == (r["n_revisit"] > 0)
        assert r["file_bytes"] > r["stored_payload_bytes"]
