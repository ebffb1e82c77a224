"""gzip member codec (functions/gzipw.py) + web_warc_gz entry: stdlib
interop both directions, FLG-bit handling, defect flagging, framing traps."""

import gzip
import struct
import zlib

import pytest

from co_new_spark.functions.gzipw import build_member, parse_members


def test_stdlib_decodes_our_members():
    payload = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody bytes" * 7
    assert gzip.decompress(build_member(payload)) == payload
    assert gzip.decompress(build_member(payload, fname="r.warc")) == payload


def test_we_decode_stdlib_members_and_multimember_concat():
    a, b, c = b"abc" * 50, b"", b"tail"
    blob = gzip.compress(a) + gzip.compress(b) + gzip.compress(c)
    recs = parse_members(blob)
    assert [r["payload"] for r in recs] == [a, b, c]
    assert all(r["crc_ok"] and r["isize_ok"] for r in recs)
    assert sum(r["member_length"] for r in recs) == len(blob)
    assert [r["offset"] for r in recs][0] == 0


def test_flg_bits_fextra_fcomment_fhcrc():
    """Hand-build a header exercising FEXTRA + FNAME + FCOMMENT + FHCRC."""
    payload = b"flagged member"
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    extra = b"AB" + struct.pack("<H", 3) + b"xyz"
    head = (b"\x1f\x8b\x08" + bytes([2 | 4 | 8 | 16]) + b"\x00" * 4 +
            b"\x00\xff" + struct.pack("<H", len(extra)) + extra +
            b"name.warc\x00" + b"a comment\x00" + b"\x00\x00")
    m = (head + body +
         struct.pack("<II", zlib.crc32(payload), len(payload)))
    (r,) = parse_members(m)
    assert r["payload"] == payload and r["fname"] == "name.warc"
    assert r["crc_ok"] and r["isize_ok"]
    assert gzip.decompress(m) == payload  # stdlib agrees the member is legal


def test_magic_bytes_inside_payload_do_not_misframe():
    tricky = b"prefix \x1f\x8b\x08\x00 fake member header " * 20
    blob = build_member(tricky) + build_member(b"second")
    recs = parse_members(blob)
    assert [r["payload"] for r in recs] == [tricky, b"second"]


def test_crc_flip_flagged_not_fatal_and_isize_separate():
    m = bytearray(build_member(b"payload bytes here"))
    m[-5] ^= 0xFF
    (r,) = parse_members(bytes(m))
    assert not r["crc_ok"] and r["isize_ok"]
    m2 = bytearray(build_member(b"payload bytes here"))
    m2[-1] ^= 0x01
    (r2,) = parse_members(bytes(m2))
    assert r2["crc_ok"] and not r2["isize_ok"]


def test_truncations_raise():
    m = build_member(b"x" * 1000)
    with pytest.raises(ValueError):
        parse_members(m[:-3])          # trailer cut
    with pytest.raises(ValueError):
        parse_members(m[: len(m) // 2])  # mid-deflate cut
    with pytest.raises(ValueError):
        parse_members(m[:6])           # header cut
    with pytest.raises(ValueError):
        parse_members(b"\x1f\x8c" + m[2:])  # bad magic
    with pytest.raises(ValueError):
        parse_members(b"\x1f\x8b\x07" + m[3:])  # bad CM


def test_entry_flags_match_planted_defects(spark):
    from co_new_spark.queries.warc2_q import t_warc_gz

    out = {r.shard: r for r in t_warc_gz(spark, "/root/testdata/sf0.001")
           .collect()}
    assert len(out) == 6
    # shard 0 holds doc_ids 0,6,12,... — multiples of 66 are crc-flipped
    assert all(r.all_isize_ok == 1 for r in out.values())
    assert sum(r.n_crc_fail for r in out.values()) == len(
        [d for d in range(500) if d % 11 == 0])
    assert sum(r.n_fname for r in out.values()) == len(
        [d for d in range(500) if d % 3 == 0])
