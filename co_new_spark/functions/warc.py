"""Minimal WARC/1.0 container codec (ISO 28500 — Common Crawl's on-disk
format).

A 100 TB web corpus arrives as WARC files: concatenated records, each a
header block (CRLF-terminated lines, blank-line terminated) followed by
exactly ``Content-Length`` payload bytes and a CRLF CRLF record separator.
The ONLY correct way to walk a WARC is length-driven — read the header,
jump ``Content-Length`` bytes — because payloads are arbitrary bytes and
may themselves contain ``WARC/1.0`` (response bodies quoting WARC specs,
crawler docs, ...).  ``parse_warc`` does exactly that; the registry entry
plants decoy ``WARC/1.0`` lines inside payloads so a split-on-magic parser
fails its oracle.

Only the record fields the engine needs are surfaced (Target-URI,
Content-Length, byte offset); unknown headers are preserved-but-ignored,
per the spec's extensibility rule.
"""

from __future__ import annotations

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def build_record(uri: str, payload: bytes,
                 warc_type: str = "response",
                 extra_headers: list[tuple[str, str]] | None = None) -> bytes:
    """One WARC/1.0 record: header block + payload + CRLF CRLF.

    ``extra_headers`` (ordered (name, value) pairs — e.g. WARC-Date,
    WARC-Payload-Digest, the revisit WARC-Refers-To-* family) are emitted
    between WARC-Target-URI and Content-Length, in the given order, so the
    byte layout is a pure function of the arguments."""
    extra = "".join(f"{k}: {v}\r\n" for k, v in (extra_headers or []))
    header = (f"WARC/1.0\r\n"
              f"WARC-Type: {warc_type}\r\n"
              f"WARC-Target-URI: {uri}\r\n"
              f"{extra}"
              f"Content-Length: {len(payload)}\r\n\r\n").encode("ascii")
    return header + payload + _SEP


def parse_warc(blob: bytes) -> list[dict]:
    """Walk a WARC blob -> [{offset, uri, content_length, header_length}].

    Length-driven: never searches payload bytes for record starts.  Raises
    ValueError on a malformed header, a missing Content-Length, or a record
    that runs past the end of the blob (truncated file).
    """
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        hdr_end = blob.find(_SEP, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        head = blob[pos:hdr_end].decode("ascii", errors="strict")
        lines = head.split("\r\n")
        if lines[0] != "WARC/1.0":
            raise ValueError(
                f"bad WARC version line at offset {pos}: {lines[0]!r}")
        uri = None
        clen = None
        wtype = None
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            k = k.strip().lower()
            if k == "warc-target-uri":
                uri = v.strip()
            elif k == "content-length":
                clen = int(v.strip())
            elif k == "warc-type":
                wtype = v.strip()
        if clen is None:
            raise ValueError(f"record at offset {pos} has no Content-Length")
        hlen = hdr_end + 4 - pos
        body_end = pos + hlen + clen
        if body_end + 4 > n:
            raise ValueError(
                f"record at offset {pos} truncated: needs {body_end + 4 - n} "
                "more bytes")
        if blob[body_end:body_end + 4] != _SEP:
            raise ValueError(
                f"record at offset {pos}: missing CRLF CRLF terminator")
        out.append({"offset": pos, "uri": uri, "content_length": clen,
                    "header_length": hlen, "warc_type": wtype})
        pos = body_end + 4
    return out
