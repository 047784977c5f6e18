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
    "warc_record_id string, content_type string, source_file string"
)


def parse_warc_records(raw: bytes) -> list[dict]:
    """All WARC records of one (decompressed) WARC byte stream.
    Returns dicts with lowercase WARC header keys plus ``block``."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos:pos + 2] in (b"\r\n",):
            pos += 2
        if pos >= n:
            break
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = raw[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {lines[0][:40]!r}")
        hdrs: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        length = int(hdrs["content-length"])
        block_start = head_end + 4
        block = raw[block_start:block_start + length]
        hdrs["block"] = block
        out.append(hdrs)
        pos = block_start + length
    return out


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


def _decompress(content: bytes) -> bytes:
    if content[:2] == b"\x1f\x8b":
        # gzip MULTISTREAM (one member per record, the CC layout):
        # decompress every member, not just the first
        out = io.BytesIO()
        with gzip.GzipFile(fileobj=io.BytesIO(content)) as g:
            while True:
                chunk = g.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
        return out.getvalue()
    return content


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """→ one row per WARC *response* record:
    (url, warc_ts, html binary, warc_record_id, content_type,
    source_file). ``path`` may be a glob over many .warc / .warc.gz
    files — one input task per file (the CC-scale unit of work)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = _decompress(bytes(content))
                for rec in parse_warc_records(raw):
                    if rec.get("warc-type") != "response":
                        continue
                    body, ctype = http_payload(rec["block"])
                    rows.append((
                        rec.get("warc-target-uri", ""),
                        rec.get("warc-date", ""),
                        body,
                        rec.get("warc-record-id", ""),
                        ctype,
                        fpath,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "warc_record_id",
                         "content_type", "source_file"],
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
