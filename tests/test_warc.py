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


RICH = " ".join(
    f"item{i} value{i * 7 % 97} the record of {i}" for i in range(30)
)  # long, varied, stopword-rich — passes quality AND repetition gates
LOOPED = "the spam boilerplate line of junk " * 30  # looped → rep gate fails


def test_warc_through_webtext_ingest(spark, tmp_path):
    """The full CC chain in one go: WARC file → pages → extraction →
    trigram lang-ID → signals (incl. Gopher repetition gates) →
    near-dup clusters → quality-first keep flags. The looped
    boilerplate page passes the v1 quality gate but FLIPS keep under
    the v2 repetition gate."""
    from hope_graph_builder_spark.pipelines.webtext import run_webtext_ingest

    def html(t):
        return f"<html><head><title>x</title></head><body><p>{t}</p></body></html>".encode()

    recs = []
    for i, (url, payload) in enumerate([
        ("https://a.example/1", html(RICH)),
        ("https://a.example/2", html(RICH)),     # exact dup of 1
        ("https://b.example/3", html("xs")),     # 1 word → quality fail
        ("https://c.example/4", html(LOOPED)),   # long but looped → rep fail
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
    from pyspark.sql.window import Window

    from hope_graph_builder_spark.sources.warc import read_warc_pages, warc_to_pages

    # a real ingest trains profiles on a labeled sample; here every page
    # is labeled 'en' (lang rides the pages schema)
    pages = (
        warc_to_pages(read_warc_pages(spark, str(p)))
        .withColumn("lang", F.lit("en"))
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")).cast("long"))
    )
    out = {r.url: r for r in run_webtext_ingest(pages).collect()}
    assert out["https://a.example/1"].cluster_id == out["https://a.example/2"].cluster_id
    kept = sorted(u for u, r in out.items() if r.keep)
    # the rich duplicated page survives exactly once
    assert kept == ["https://a.example/1"]
    assert out["https://b.example/3"].quality < 0.5
    # the looped page clears quality but fails the repetition gate —
    # the v2 keep flip
    assert out["https://c.example/4"].quality >= 0.5
    assert not out["https://c.example/4"].rep_pass
    assert not out["https://c.example/4"].keep
    assert out["https://a.example/1"].rep_pass
    assert out["https://a.example/1"].lang_pred == "en"


@pytest.mark.parametrize("gz", [False, True])
def test_warc_tolerant_parsing_skips_and_counts(spark, tmp_path, gz):
    """Hostile crawl input: garbage at a record boundary, a record
    with an unparseable Content-Length, and a TRUNCATED final record.
    Tolerant mode (the default) must (a) land every well-formed
    record byte-identical, (b) resync after each malformation, and
    (c) report the exact per-file skip count. strict=True raises."""
    import gzip as _gzip

    from hope_graph_builder_spark.sources.warc import (
        WarcSyntaxError,
        iter_warc_records,
        read_warc_pages,
    )

    def resp(i, body):
        return _record(
            "response",
            {"WARC-Record-ID": f"<urn:uuid:{i}>",
             "WARC-Target-URI": f"https://ok.example/{i}",
             "WARC-Date": "2024-03-01T10:00:00Z"},
            _http(body),
        )

    garbage = b"this is not a warc record at all\r\n"
    bad_cl = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: https://bad.example/cl\r\n"
              b"Content-Length: NaN\r\n\r\n"
              b"HTTP/1.1 200 OK\r\n\r\njunkbody\r\n\r\n")
    truncated = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"WARC-Target-URI: https://bad.example/trunc\r\n"
                 b"Content-Length: 999999\r\n\r\nonly a few bytes")
    chunks = [
        resp(1, b"<html><body><p>one</p></body></html>"),
        garbage,
        resp(2, b"<html><body><p>two</p></body></html>"),
        bad_cl,
        resp(3, b"<html><body><p>three</p></body></html>"),
        truncated,
    ]
    if gz:
        data = b"".join(_gzip.compress(c) for c in chunks)
        p = tmp_path / "bad.warc.gz"
    else:
        data = b"".join(chunks)
        p = tmp_path / "bad.warc"
    p.write_bytes(data)

    df = read_warc_pages(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {f"https://ok.example/{i}" for i in (1, 2, 3)}
    assert bytes(rows["https://ok.example/1"]["html"]) == b"<html><body><p>one</p></body></html>"
    assert bytes(rows["https://ok.example/3"]["html"]) == b"<html><body><p>three</p></body></html>"
    assert all(r["n_skipped"] == 3 for r in rows.values())  # exact count

    with pytest.raises(WarcSyntaxError):
        list(iter_warc_records(iter([b"".join(chunks)]), strict=True))


def test_warc_single_file_size_guard(spark, tmp_path, monkeypatch):
    """Files beyond the single-file cap fail with a clear message
    instead of an opaque Arrow/memory error mid-task."""
    from hope_graph_builder_spark.sources import warc as warcmod

    p = tmp_path / "big.warc"
    p.write_bytes(b"".join(_warc_bytes()))
    monkeypatch.setattr(warcmod, "MAX_COMPRESSED_BYTES", 10)
    with pytest.raises(Exception, match="single-file limit"):
        warcmod.read_warc_pages(spark, str(p)).collect()
