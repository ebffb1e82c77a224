"""Per-record gzip member codec (RFC 1952) — the ``.warc.gz`` layer.

Common Crawl does not ship bare WARC: every record is its own gzip MEMBER
and the file is the concatenation of members (the warc.gz convention from
ISO 28500 Annex D).  That framing is what makes a 1 GB crawl file
random-accessible: a reader seeks to a member offset (from the CDX index)
and inflates ONE record without touching the rest of the file.

``build_member`` emits a canonical member: the 10-byte header (magic
``1F 8B``, CM=8 deflate, MTIME=0 and XFL=0 for determinism, OS=255
unknown), an optional FNAME extension, a raw-deflate body, and the CRC32 +
ISIZE trailer.  ``parse_members`` walks a multi-member blob generically:
header parse honours the FLG bits (FEXTRA / FNAME / FCOMMENT / FHCRC) per
the RFC, the member END is discovered from the deflate stream itself
(``decompressobj.unused_data`` after end-of-stream — members do NOT record
their own compressed length, so a walker that guesses lengths or splits on
the magic bytes mis-frames, exactly like the WARC decoy-line trap), and the
trailer's CRC32 / ISIZE (mod 2^32) are verified against the inflated bytes
and surfaced as flags rather than raised, so a corrupt member is reported,
not fatal to the shard.

stdlib-only (zlib); compression level pinned for byte-deterministic builds.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x1f\x8b"
_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def build_member(payload: bytes, fname: str | None = None) -> bytes:
    """One deterministic gzip member wrapping ``payload``."""
    flg = _FNAME if fname is not None else 0
    head = _MAGIC + bytes([8, flg]) + struct.pack("<I", 0) + bytes([0, 255])
    if fname is not None:
        head += fname.encode("latin-1") + b"\x00"
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    trailer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                          len(payload) & 0xFFFFFFFF)
    return head + body + trailer


def parse_members(blob: bytes) -> list[dict]:
    """Walk concatenated gzip members ->
    [{offset, member_length, fname, payload, crc_ok, isize_ok}].

    Raises ValueError on bad magic/CM, a truncated header, or a deflate
    stream that never terminates (truncated member); CRC32/ISIZE mismatches
    are surfaced as flags.
    """
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos:pos + 2] != _MAGIC:
            raise ValueError(f"bad gzip magic at offset {pos}")
        if pos + 10 > n:
            raise ValueError(f"truncated gzip header at offset {pos}")
        cm, flg = blob[pos + 2], blob[pos + 3]
        if cm != 8:
            raise ValueError(f"unsupported CM={cm} at offset {pos}")
        p = pos + 10
        if flg & _FEXTRA:
            if p + 2 > n:
                raise ValueError(f"truncated FEXTRA at offset {pos}")
            xlen = struct.unpack_from("<H", blob, p)[0]
            p += 2 + xlen
        fname = None
        if flg & _FNAME:
            end = blob.find(b"\x00", p)
            if end < 0:
                raise ValueError(f"unterminated FNAME at offset {pos}")
            fname = blob[p:end].decode("latin-1")
            p = end + 1
        if flg & _FCOMMENT:
            end = blob.find(b"\x00", p)
            if end < 0:
                raise ValueError(f"unterminated FCOMMENT at offset {pos}")
            p = end + 1
        if flg & _FHCRC:
            p += 2
        if p > n:
            raise ValueError(f"truncated gzip extensions at offset {pos}")
        do = zlib.decompressobj(-15)
        payload = do.decompress(blob[p:])
        payload += do.flush()
        if not do.eof:
            raise ValueError(f"truncated deflate stream at offset {pos}")
        # everything past the deflate stream end is unused_data — the 8-byte
        # trailer is its first 8 bytes
        trailer_at = n - len(do.unused_data)
        if trailer_at + 8 > n:
            raise ValueError(f"missing gzip trailer at offset {pos}")
        crc, isize = struct.unpack_from("<II", blob, trailer_at)
        out.append({
            "offset": pos,
            "member_length": trailer_at + 8 - pos,
            "fname": fname,
            "payload": payload,
            "crc_ok": crc == (zlib.crc32(payload) & 0xFFFFFFFF),
            "isize_ok": isize == (len(payload) & 0xFFFFFFFF),
        })
        pos = trailer_at + 8
    return out
