"""WARC source (ISO 28500): synthetic byte-exact WARC files — plain
and gzip-multistream (the Common Crawl layout) — read through the
distributed binaryFile + Arrow parse path, then composed with the
HTML→text extractor: the full CC-style ingest chain."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from hope_graph_builder_spark.sources.warc import (
    parse_warc_records,
    read_warc_pages,
    warc_to_pages,
)


def _record(wtype: str, headers: dict, block: bytes) -> bytes:
    h = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        + "".join(f"{k}: {v}\r\n" for k, v in headers.items())
        + f"Content-Length: {len(block)}\r\n"
    ).encode()
    return h + b"\r\n" + block + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\nContent-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )


HTML1 = b"<html><head><title>t</title></head><body><p>Hello WARC</p></body></html>"
HTML2 = "<html><body><p>Päge two</p></body></html>".encode("utf-8")


def _warc_bytes() -> list[bytes]:
    return [
        _record("warcinfo", {"WARC-Record-ID": "<urn:uuid:0>"}, b"software: test\r\n"),
        _record(
            "request",
            {"WARC-Record-ID": "<urn:uuid:1>", "WARC-Target-URI": "https://a.example/x"},
            b"GET /x HTTP/1.1\r\n\r\n",
        ),
        _record(
            "response",
            {
                "WARC-Record-ID": "<urn:uuid:2>",
                "WARC-Target-URI": "https://a.example/x",
                "WARC-Date": "2024-03-01T10:00:00Z",
            },
            _http(HTML1),
        ),
        _record(
            "response",
            {
                "WARC-Record-ID": "<urn:uuid:3>",
                "WARC-Target-URI": "https://b.example/y",
                "WARC-Date": "2024-03-01T11:30:00Z",
            },
            _http(HTML2, "text/html; charset=utf-8"),
        ),
    ]


def test_parse_records_offsets_and_blocks():
    raw = b"".join(_warc_bytes())
    recs = parse_warc_records(raw)
    assert [r.get("warc-type") for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    assert recs[2]["warc-target-uri"] == "https://a.example/x"
    assert recs[2]["block"].endswith(HTML1)


@pytest.mark.parametrize("gz", [False, True])
def test_read_warc_pages_spark(spark, tmp_path, gz):
    if gz:
        # one gzip MEMBER per record — the Common Crawl multistream form
        data = b"".join(gzip.compress(r) for r in _warc_bytes())
        p = tmp_path / "part.warc.gz"
    else:
        data = b"".join(_warc_bytes())
        p = tmp_path / "part.warc"
    p.write_bytes(data)
    df = read_warc_pages(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://a.example/x", "https://b.example/y"}
    assert bytes(rows["https://a.example/x"]["html"]) == HTML1  # byte-identical payload
    assert bytes(rows["https://b.example/y"]["html"]) == HTML2
    assert rows["https://a.example/x"]["content_type"].startswith("text/html")
    assert rows["https://b.example/y"]["warc_ts"] == "2024-03-01T11:30:00Z"


def test_warc_feeds_pages_schema_and_extractor(spark, tmp_path):
    """WARC → mandated pages schema → native HTML→text extraction:
    the end-to-end CC ingest chain."""
    from hope_graph_builder_spark.operators.extract import extract_text

    p = tmp_path / "part.warc"
    p.write_bytes(b"".join(_warc_bytes()))
    pages = warc_to_pages(read_warc_pages(spark, str(p)))
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    out = {r["url"]: r["extracted_text"] for r in extract_text(pages).collect()}
    assert out["https://a.example/x"] == "Hello WARC"
    assert out["https://b.example/y"] == "Päge two"
    ts = {r["url"]: r["warc_ts"] for r in pages.collect()}
    assert ts["https://a.example/x"].isoformat().startswith("2024-03-01T10:00:00")
