"""WARC (ISO 28500 / WARC 1.0) record kernels: build + parse.

Common Crawl ships pages as WARC files — concatenated records, each a
``WARC/1.0`` header block (CRLF-separated ``Name: value`` fields, blank
line terminated) followed by ``Content-Length`` payload bytes. For
``response`` records the payload is an HTTP/1.1 response whose own body
is the page. This module is the pure single-blob kernel pair behind
:func:`ferenda_spark.operators.warc.warc_records` — the ingestion step
that turns a lake of raw WARC segments into the (url, warc_ts, html)
pages table the whole engine consumes (BASELINE input_hint; the
reference's analogous surface is ``download()``'s requests+cache layer,
ref ferenda/documentrepository.py:571-723, which fetches one URL at a
time — at crawl scale the fetch is already done and ingestion is
parsing).

Parser contract (documented subset of the spec):

- records are located by scanning for the ``WARC/`` magic; a record
  whose header block is malformed (no CRLFCRLF terminator, a header
  line without ``:``, or a missing/non-numeric ``Content-Length``) is
  skipped and the scan resyncs at the next magic — the standard
  tolerant-reader behavior for real crawl data;
- header names are case-insensitive; values are ``strip()``-ed;
- the payload is exactly ``Content-Length`` bytes — payload content
  (including stray ``WARC/`` strings) can never confuse the scan
  because the scan resumes after the declared length;
- payloads beginning with ``HTTP/`` are unwrapped: status code, HTTP
  headers (case-insensitive), media type (the ``Content-Type`` value
  up to ``;``), and the body after the header terminator; other
  payloads pass through verbatim with NULL http fields.

Both kernels are allocation-light bytes code — no regex, no codec
beyond one utf-8 'replace' decode of the header block.
"""

from __future__ import annotations

CRLF = b"\r\n"


# ----------------------------------------------------------------- build

def build_record(rec_type: str, url: str | None, date: str,
                 block: bytes, content_type: str) -> bytes:
    """One WARC record (the writer half; tests and synthetic corpora
    use it so the parser is exercised against real container bytes)."""
    head = [b"WARC/1.0",
            b"WARC-Type: " + rec_type.encode()]
    if url is not None:
        head.append(b"WARC-Target-URI: " + url.encode())
    head += [b"WARC-Date: " + date.encode(),
             b"Content-Type: " + content_type.encode(),
             b"Content-Length: " + str(len(block)).encode()]
    return CRLF.join(head) + CRLF + CRLF + block + CRLF + CRLF


def build_response(url: str, date: str, body: bytes,
                   status: int = 200,
                   mime: str = "text/html; charset=utf-8") -> bytes:
    """One ``response`` record wrapping an HTTP/1.1 response."""
    reason = {200: "OK", 404: "Not Found"}.get(status, "X")
    http = (b"HTTP/1.1 " + str(status).encode() + b" " +
            reason.encode() + CRLF +
            b"Content-Type: " + mime.encode() + CRLF +
            b"Content-Length: " + str(len(body)).encode() +
            CRLF + CRLF + body)
    return build_record("response", url, date, http,
                        "application/http; msgtype=response")


# ----------------------------------------------------------------- parse

def _http_fields(block: bytes):
    """HTTP payload → (status, mime, body); (None, None, block) when
    the block is not an HTTP message."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    end = block.find(CRLF + CRLF)
    if end < 0:
        return None, None, block
    lines = block[:end].decode("utf-8", "replace").split("\r\n")
    parts = lines[0].split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    mime = None
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            if k.strip().lower() == "content-type":
                mime = v.split(";")[0].strip()
    return status, mime, block[end + 4:]


def parse_warc(blob: bytes) -> list[dict]:
    """Concatenated WARC records → list of dicts with keys
    ``offset, rec_type, url, warc_date, warc_content_type,
    http_status, mime, payload``."""
    out: list[dict] = []
    pos = 0
    while True:
        i = blob.find(b"WARC/", pos)
        if i < 0:
            break
        hdr_end = blob.find(CRLF + CRLF, i)
        if hdr_end < 0:
            break
        lines = blob[i:hdr_end].decode("utf-8", "replace").split("\r\n")
        fields = {}
        ok = True
        for line in lines[1:]:
            if ":" not in line:
                ok = False
                break
            k, v = line.split(":", 1)
            fields[k.strip().lower()] = v.strip()
        clen = fields.get("content-length", "")
        if not ok or not clen.isdigit():
            pos = i + 5          # resync at the next magic
            continue
        n = int(clen)
        block = blob[hdr_end + 4:hdr_end + 4 + n]
        pos = hdr_end + 4 + n
        status, mime, payload = _http_fields(block)
        out.append({
            "offset": i,
            "rec_type": fields.get("warc-type"),
            "url": fields.get("warc-target-uri"),
            "warc_date": fields.get("warc-date"),
            "warc_content_type": fields.get("content-type"),
            "http_status": status,
            "mime": mime,
            "payload": payload,
        })
    return out
