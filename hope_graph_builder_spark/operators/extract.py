"""HTML → text extraction — the webtext pipeline's per-row invariant
operator (BASELINE.json input_hint: "byte-identical extracted text per
url"; the pages table carries the raw ``html`` binary alongside the
reference-extracted ``text``).

Entirely native Column expressions (regexp in whole-stage codegen — no
UDF): decode UTF-8, drop <head>, join block elements, strip inline
tags, unescape entities, trim. This is the regex family of extractor
(the fixture's markup is well-formed); real-world tag-soup HTML needs
a parser-backed extractor behind the same (html → text) signature —
the Spark-side plumbing (binary column in, string column out, pure map
stage, no shuffle) is identical.

``markup_pages`` is the fixture-side twin: it wraps the ground-truth
text into deterministic markup (title head, <p> paragraphs, inline
<b>, escaped entities) so the extractor has something real to undo;
byte-identity of extract(markup(text)) against text is the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORDS_PER_PARA = 7
BOLD_EVERY = 5


def escape_html_expr(s: Column) -> Column:
    """Entity-escape text content: & first, then < > "."""
    s = F.regexp_replace(s, "&", "&amp;")
    s = F.regexp_replace(s, "<", "&lt;")
    s = F.regexp_replace(s, ">", "&gt;")
    return F.regexp_replace(s, '"', "&quot;")


def unescape_html_expr(s: Column) -> Column:
    """Inverse of escape_html_expr: named entities, &amp; LAST."""
    s = F.regexp_replace(s, "&lt;", "<")
    s = F.regexp_replace(s, "&gt;", ">")
    s = F.regexp_replace(s, "&quot;", '"')
    return F.regexp_replace(s, "&amp;", "&")


def markup_html_expr(text: Column, url: Column) -> Column:
    """Deterministic synthetic page: the escaped text split into
    7-word <p> paragraphs, every 5th word <b>-wrapped, plus a <head>
    whose title must NOT leak into the extraction."""
    words = F.split(escape_html_expr(text), " ")
    deco = F.transform(
        words,
        lambda w, i: F.when(
            i % BOLD_EVERY == BOLD_EVERY - 1, F.concat(F.lit("<b>"), w, F.lit("</b>"))
        ).otherwise(w),
    )
    pieces = F.transform(
        deco,
        lambda w, i: F.when(i == 0, w)
        .when(i % WORDS_PER_PARA == 0, F.concat(F.lit("</p><p>"), w))
        .otherwise(F.concat(F.lit(" "), w)),
    )
    body = F.concat(F.lit("<p>"), F.concat_ws("", pieces), F.lit("</p>"))
    return F.concat(
        F.lit('<html><head><title>'),
        escape_html_expr(url),
        F.lit('</title><meta charset="utf-8"></head><body>'),
        body,
        F.lit("</body></html>"),
    )


def markup_pages(pages: DataFrame, text: str = "text", url: str = "url") -> DataFrame:
    """pages(url, text, …) → html binary column rebuilt from markup."""
    return pages.withColumn(
        "html", F.encode(markup_html_expr(F.col(text), F.col(url)), "UTF-8")
    )


def extract_text_expr(html: Column) -> Column:
    """The extractor: html binary → text string.

    1. decode UTF-8
    2. drop <head>…</head> (titles/meta must not leak)
    3. adjacent block boundaries join with a single space
    4. strip every remaining tag (block shells, inline markup)
    5. unescape entities

    No trim: tag stripping introduces no whitespace of its own, so
    leading/trailing whitespace in the ORIGINAL text survives — trim
    would silently break byte-identity for such rows.
    """
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, "(?s)<head>.*?</head>", "")
    s = F.regexp_replace(s, "</p><p>", " ")
    s = F.regexp_replace(s, "<[^>]*>", "")
    return unescape_html_expr(s)


def extract_text(pages: DataFrame, html: str = "html", out: str = "extracted_text") -> DataFrame:
    """Map-stage extraction over the pages table — no shuffle, scales
    as a pure scan at any corpus size."""
    return pages.withColumn(out, extract_text_expr(F.col(html)))
