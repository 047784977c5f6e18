"""WARC source — the Common-Crawl container for the driver-mandated
pages table ``(url, warc_ts, html, text, lang)``. The reference's
input hint is a Common-Crawl-style web corpus; this reads the real
thing: ISO 28500 WARC files (optionally gzip multistream, the format
CC ships) into the standard pages shape.

Scale model: Common Crawl distributes ~1 GB WARC files by the tens of
thousands — FILE-granular parallelism is the production pattern (a
gzip multistream can't be split mid-file). Plan shape: the built-in
``binaryFile`` DataFrame source lists + reads files distributed (one
task per file), then an Arrow-batched ``mapInPandas`` parses each
file's records and EXPLODES them to one row per response record — no
RDDs, no driver-side reads, and Catalyst still prunes/filters the
output columns.

Parsing is from the public ISO 28500 spec: records are
``WARC/1.x CRLF headers CRLF CRLF block CRLF CRLF``; Content-Length
counts block bytes; response records carry an HTTP message whose body
is the page payload.

Robustness (real crawls are hostile): parsing is INCREMENTAL — gzip
members decompress through a bounded buffer and records are emitted
as soon as they complete, so peak memory is one record (+ the gzip
window), never the whole ~1 GB decompressed file. Malformed records
(non-WARC bytes at a record boundary, missing/garbage Content-Length,
truncated blocks) are skipped-and-counted by default (``strict=False``,
the CC-production behavior): the parser resyncs on the next
``\\r\\nWARC/`` magic and every emitted row carries the file's final
``n_skipped`` so lineage shows exactly how lossy each input was.
``strict=True`` raises on the first malformation instead.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts string, html binary, "
    "warc_record_id string, content_type string, source_file string, "
    "n_skipped long"
)

# binaryFile materializes one file's bytes per row; beyond this the
# file can't round-trip through Arrow (and a single task would own a
# multi-GB buffer). CC shards are ~1 GB by construction — a larger
# input is a mis-packed shard, not a bigger corpus.
MAX_COMPRESSED_BYTES = 2 * 1024**3 - 1

_MAGIC = b"WARC/"
_READ_CHUNK = 1 << 20


class WarcSyntaxError(ValueError):
    pass


def _iter_chunks(content: bytes) -> Iterator[bytes]:
    """Yield decompressed chunks incrementally. Gzip multistream (the
    CC layout: one member per record) decompresses member-by-member
    through GzipFile — bounded memory regardless of file size."""
    if content[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(content)) as g:
            while True:
                chunk = g.read(_READ_CHUNK)
                if not chunk:
                    return
                yield chunk
    else:
        for pos in range(0, len(content), _READ_CHUNK):
            yield content[pos:pos + _READ_CHUNK]


def iter_warc_records(
    chunks: Iterator[bytes], strict: bool = False
) -> Iterator[dict]:
    """Incremental WARC record parser over a chunk stream. Yields one
    dict per well-formed record (lowercase WARC header keys + ``block``)
    and finally a ``{"__n_skipped__": n}`` sentinel.

    Tolerant mode (default): a malformed record boundary (no WARC/
    magic, bad/missing Content-Length) or a truncated final block is
    counted and the parser RESYNCS at the next ``\\r\\nWARC/``
    occurrence; well-formed records before and after land
    byte-identical. Peak memory is one record's bytes."""
    buf = bytearray()
    eof = False
    n_skipped = 0
    it = iter(chunks)

    def fill(need: int) -> bool:
        """Grow buf to ≥ need bytes; False if the stream ends first."""
        nonlocal eof
        while len(buf) < need and not eof:
            try:
                buf.extend(next(it))
            except StopIteration:
                eof = True
        return len(buf) >= need

    def find_with_fill(needle: bytes, start: int = 0) -> int:
        nonlocal eof
        while True:
            i = buf.find(needle, start)
            if i >= 0:
                return i
            if eof:
                return -1
            start = max(0, len(buf) - len(needle) + 1)
            try:
                buf.extend(next(it))
            except StopIteration:
                eof = True

    def resync(frm: int) -> None:
        """Drop bytes up to the next record magic after ``frm``."""
        nonlocal n_skipped
        n_skipped += 1
        i = find_with_fill(b"\r\n" + _MAGIC, frm)
        if i < 0:
            buf.clear()
        else:
            del buf[: i + 2]

    while True:
        # skip inter-record CRLFs
        while fill(2) and buf[:2] == b"\r\n":
            del buf[:2]
        if not fill(1):
            break
        if not fill(len(_MAGIC)) or bytes(buf[: len(_MAGIC)]) != _MAGIC:
            if strict:
                raise WarcSyntaxError(
                    f"not a WARC record boundary: {bytes(buf[:40])!r}"
                )
            resync(0)
            continue
        head_end = find_with_fill(b"\r\n\r\n")
        if head_end < 0:
            if strict:
                raise WarcSyntaxError("unterminated WARC header")
            n_skipped += 1
            break
        head = buf[:head_end].decode("utf-8", errors="replace")
        hdrs: dict = {}
        for line in head.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        try:
            length = int(hdrs["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            if strict:
                raise WarcSyntaxError(
                    f"bad Content-Length in record at {head.splitlines()[0]!r}"
                )
            resync(head_end)
            continue
        block_start = head_end + 4
        if not fill(block_start + length):
            # truncated final block
            if strict:
                raise WarcSyntaxError(
                    f"truncated block: need {length} bytes, stream ended"
                )
            n_skipped += 1
            break
        hdrs["block"] = bytes(buf[block_start: block_start + length])
        del buf[: block_start + length]
        yield hdrs
    yield {"__n_skipped__": n_skipped}


def parse_warc_records(raw: bytes, strict: bool = True) -> list[dict]:
    """All WARC records of one (decompressed) WARC byte stream —
    the eager wrapper over iter_warc_records (strict by default: the
    historical behavior of this helper, used by spec-vector tests)."""
    out = [r for r in iter_warc_records(iter([raw]), strict=strict)]
    return [r for r in out if "__n_skipped__" not in r]


def http_payload(block: bytes) -> tuple[bytes, str]:
    """Split an HTTP response message into (body, content_type)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return block, ""
    head = block[:sep].decode("latin-1", errors="replace")
    ctype = ""
    for line in head.split("\r\n")[1:]:
        if line.lower().startswith("content-type:"):
            ctype = line.split(":", 1)[1].strip()
    return block[sep + 4:], ctype


def read_warc_pages(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """→ one row per WARC *response* record:
    (url, warc_ts, html binary, warc_record_id, content_type,
    source_file, n_skipped). ``path`` may be a glob over many .warc /
    .warc.gz files — one input task per file (the CC-scale unit of
    work). ``n_skipped`` is the file-level count of malformed records
    the tolerant parser dropped (0 everywhere in strict mode, which
    instead raises on the first malformation)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content)
                if len(content) > MAX_COMPRESSED_BYTES:
                    raise ValueError(
                        f"{fpath}: {len(content)} bytes exceeds the "
                        f"{MAX_COMPRESSED_BYTES}-byte single-file limit; "
                        "split the shard (CC ships ~1 GB files) — "
                        "binaryFile cannot round-trip larger payloads"
                    )
                recs, n_skipped = [], 0
                for rec in iter_warc_records(_iter_chunks(content), strict):
                    if "__n_skipped__" in rec:
                        n_skipped = rec["__n_skipped__"]
                        continue
                    if rec.get("warc-type") != "response":
                        continue
                    body, ctype = http_payload(rec["block"])
                    recs.append((
                        rec.get("warc-target-uri", ""),
                        rec.get("warc-date", ""),
                        body,
                        rec.get("warc-record-id", ""),
                        ctype,
                        fpath,
                    ))
                rows.extend(r + (n_skipped,) for r in recs)
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "warc_record_id",
                         "content_type", "source_file", "n_skipped"],
            )

    return files.mapInPandas(op, schema=PAGES_SCHEMA)


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Adapt the WARC rows to the driver-mandated pages schema
    (url, warc_ts timestamp, html binary, text, lang): text/lang start
    NULL — they are produced by the extraction + language-ID operators
    (operators/extract.extract_text, operators/text.lang_id), which is
    exactly the pipeline order a real CC ingest runs."""
    return warc_df.select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
