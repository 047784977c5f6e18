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


def test_warc_through_webtext_ingest(spark, tmp_path):
    """The full CC chain in one go: WARC file → pages → extraction →
    signals → near-dup clusters → keep flags."""
    from hope_graph_builder_spark.pipelines.webtext import run_webtext_ingest

    body = ("<html><head><title>x</title></head><body><p>"
            + "the quick brown fox jumps over the lazy dog and the cat " * 8
            + "</p></body></html>").encode()
    recs = []
    for i, (url, payload) in enumerate([
        ("https://a.example/1", body),
        ("https://a.example/2", body),            # exact dup of 1
        ("https://b.example/3", "<html><body><p>xs</p></body></html>".encode()),
    ]):
        recs.append(_record(
            "response",
            {"WARC-Record-ID": f"<urn:uuid:{i}>", "WARC-Target-URI": url,
             "WARC-Date": "2024-03-01T10:00:00Z"},
            _http(payload),
        ))
    p = tmp_path / "c.warc"
    p.write_bytes(b"".join(recs))
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.sources.warc import read_warc_pages, warc_to_pages

    pages = warc_to_pages(read_warc_pages(spark, str(p))).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    # stable small ids for cluster-canonical assertions
    pages = pages.orderBy("url").withColumn(
        "doc_id", F.row_number().over(__import__("pyspark").sql.window.Window.orderBy("url")).cast("long")
    )
    out = {r.url: r for r in run_webtext_ingest(pages).collect()}
    assert out["https://a.example/1"].cluster_id == out["https://a.example/2"].cluster_id
    assert out["https://a.example/1"].keep != out["https://a.example/2"].keep or (
        not out["https://a.example/1"].keep and not out["https://a.example/2"].keep
    )
    kept = [u for u, r in out.items() if r.keep]
    # the rich duplicated page survives once; the 2-word page fails the
    # quality gate
    assert kept == ["https://a.example/1"]
    assert out["https://b.example/3"].quality < 0.5
    assert out["https://a.example/1"].lang_pred == "en"
