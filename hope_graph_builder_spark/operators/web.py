"""URL / host operators for the web-text corpus — the per-host layer
every CC-style pipeline keeps next to the per-document one (host
quality priors, host-level dedup blocks, crawl politeness budgets).

Engine-portable by construction: parsing uses split/substring only
(no regex-engine- or locale-sensitive constructs), so every oracle
matches byte-for-byte; aggregates follow the repo's
quantize-then-decimal-sum rule so float means are order-free exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_expr(url: Column) -> Column:
    """Lowercased hostname of an absolute URL, port and userinfo
    stripped: split on '/' (scheme://host/... puts the authority at
    index 2), then take the part after the last '@' and before the
    first ':'."""
    auth = F.split(url, "/").getItem(2)
    host = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.split(host, ":").getItem(0))


def registered_domain_expr(url: Column) -> Column:
    """Last-two-labels approximation of the registered domain
    (example.org of a.b.example.org). A real pipeline substitutes the
    public-suffix list — pure DATA riding a broadcast join, the
    operator shape is identical; the approximation is wrong only for
    multi-label suffixes like .co.uk (documented)."""
    parts = F.split(host_expr(url), "\\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host_expr(url))


def url_canonical_expr(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL — the key for
    URL-level dedup (the FIRST dedup stage of a CC-style pipeline:
    the same page is crawled under many spellings long before content
    hashes ever meet):

    - fragment stripped (``#...`` never reaches the server),
    - scheme and host lowercased, userinfo dropped,
    - default port stripped (``:80`` for http, ``:443`` for https;
      other ports kept),
    - ONE trailing slash stripped from the path when there is no
      query string (``/a/`` ≡ ``/a``, and ``host/`` ≡ ``host``).

    Split/substring only (no regex, no locale), so oracles byte-agree.
    Non-absolute inputs (no ``://``) pass through fragment-stripped
    and otherwise untouched. IPv6 literals (colons inside the host)
    are out of scope — documented, as is percent-encoding
    normalization (a real pipeline adds a decode table in front; the
    operator shape is identical)."""
    u0 = F.substring_index(url, "#", 1)
    has_scheme = F.instr(u0, "://") > 0
    scheme = F.lower(F.substring_index(u0, "://", 1))
    rest = F.substr(u0, F.instr(u0, "://") + F.lit(3))
    auth = F.substring_index(rest, "/", 1)
    pathq = F.substr(rest, F.length(auth) + F.lit(1))
    hostport = F.element_at(F.split(auth, "@"), -1)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        F.instr(hostport, ":") > 0, F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path_c = F.when(
        pathq.endswith("/") & ~pathq.contains("?"),
        F.substr(pathq, F.lit(1), F.length(pathq) - F.lit(1)),
    ).otherwise(pathq)
    return F.when(
        has_scheme,
        F.concat(scheme, F.lit("://"), host, portpart, path_c),
    ).otherwise(u0)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup on the canonical form: one row per input
    document with ``(id, canon_url, keep, n_dups)`` — ``keep`` marks
    the min-id document per canonical URL, ``n_dups`` the group size.
    ``df.filter("keep")`` is the dedup.

    100 TB shape: ONE exchange on the canonical URL feeding two
    unordered window aggregates (min id, count) — sort-based, no
    per-key state, so a URL crawled 10⁶ times cannot OOM a task. The
    r05 groupBy → equi-join-back form evaluated the canonicalizer
    over the corpus twice and exchanged it twice (r06, guide §2.4)."""
    from pyspark.sql.window import Window as W

    canon = url_canonical_expr(F.col(url_col))
    keyed = df.select(F.col(id_col), canon.alias("canon_url"))
    w = W.partitionBy("canon_url")
    return keyed.select(
        id_col,
        "canon_url",
        (F.col(id_col) == F.min(id_col).over(w)).alias("keep"),
        F.count(F.lit(1)).over(w).alias("n_dups"),
    )


def host_stats(
    docs: DataFrame,
    url: str = "url",
    quality: str = "quality",
    tokens: str = "n_tokens",
) -> DataFrame:
    """Per-host corpus stats: (host, n_docs, n_tokens, mean_quality).
    One shuffle on the host key; mean is decimal-sum / count (exact,
    order-free). At 100 TB the host table is ~10^7 rows — small
    enough to broadcast back as a quality prior."""
    return (
        docs.select(
            host_expr(F.col(url)).alias("host"),
            F.col(quality).cast("double").alias("_q"),
            F.col(tokens).cast("long").alias("_t"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_t").alias("n_tokens"),
            (
                F.sum(F.bround(F.col("_q"), 6).cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_quality"),
        )
    )


def host_boilerplate_strip(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ratio: float = 0.5,
    min_pages: int = 2,
    min_chars: int = 1,
    sep: str = "\n",
    key_method: str = "raw",
) -> DataFrame:
    """Per-HOST boilerplate removal — the within-site complement of
    corpus-wide line dedup: a line is boilerplate for a host when it
    appears on at least ``min_ratio`` of that host's pages (and the
    host has at least ``min_pages`` pages to make the ratio evidence
    rather than noise). Nav bars, cookie banners and footers repeat on
    most of a site's pages; genuine content does not — so unlike
    keep-first line dedup, EVERY occurrence is dropped (the site's nav
    bar is not content on any page). Lines shorter than ``min_chars``
    are exempt (blank lines are structure, not boilerplate evidence).

    Returns one row per input page: ``(id, clean_text, n_lines,
    n_removed)``, kept lines re-joined by ``sep`` in original order.

    The ratio test is integer-exact: ``df_pages·10⁶ ≥ ratio_ppm·
    n_pages`` — no float division, so the decision is identical in any
    engine. 100 TB shape: page-presence counts come from a distinct on
    (host, line, id) then groupBy(host, line) — both partially
    aggregate map-side, and the per-host page totals are one tiny
    groupBy(host) that broadcasts back; the strip itself is one
    equi-join on (host, line) (AQE skew-split absorbs mega-hosts) and
    reassembly one groupBy(id), exactly the line_dedup plan.

    ``key_method='xx'`` carries ``xxhash64(line)`` through the
    presence-count exchanges and the strip join instead of the raw
    line text (8 bytes/key vs the whole line — the dominant shuffle
    payload); identical results up to 64-bit collisions within one
    host (the line_dedup 'xx' convention). 'raw' is the default and
    the oracle-replayed mode."""
    if key_method not in ("raw", "xx"):
        raise ValueError(f"unknown key_method {key_method!r} (use 'raw' or 'xx')")
    ratio_ppm = int(round(min_ratio * 1_000_000))
    raw_lines = df.select(
        F.col(id_col),
        F.col(host_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line"),
    )
    key = F.xxhash64("line") if key_method == "xx" else F.col("line")
    lines = raw_lines.select(id_col, host_col, "pos", "line", key.alias("_lk"))
    host_pages = df.groupBy(host_col).agg(F.count("*").alias("n_pages"))
    page_presence = (
        lines.filter(F.length("line") >= F.lit(min_chars))
        .select(host_col, "_lk", id_col)
        .distinct()
    )
    boiler = (
        page_presence.groupBy(host_col, "_lk")
        .agg(F.count("*").alias("df_pages"))
        .join(host_pages, host_col)
        .filter(
            (F.col("n_pages") >= F.lit(min_pages))
            & (F.col("df_pages") * F.lit(1_000_000) >= F.lit(ratio_ppm) * F.col("n_pages"))
        )
        .select(host_col, "_lk", F.lit(True).alias("_boiler"))
    )
    kept = (
        lines.join(boiler, [host_col, "_lk"], "left")
        .filter(F.col("_boiler").isNull())
        .select(id_col, "pos", "line")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("_n_kept"),
    )
    return (
        df.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), sep, -1)).alias("n_lines"),
        )
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_lines"),
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias("n_removed"),
        )
    )


def parse_json_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    prefix: str = "",
) -> DataFrame:
    """Typed extraction from a semi-structured JSON string column (the
    ``props`` bag every event/crawl table carries): for each
    ``field → sql_type``, adds ``prefix + field`` =
    ``get_json_object($.field)`` TRY-cast to the type (NULL on a
    missing key, malformed JSON or uncastable value — the tolerant
    path even under ANSI mode; schema enforcement belongs in a
    quarantine filter on the NULLs, not in a crash).
    Nested paths work via dotted field names ('a.b' → '$.a.b').

    Scale shape: a pure map stage in codegen — the JSON is parsed per
    referenced field, no UDF, no schema inference scan; pushes through
    any upstream filter. For many fields from huge JSON prefer
    ``from_json`` with an explicit struct schema (one parse per row);
    per-field extraction wins below ~5 fields and keeps the output
    schema explicit either way."""
    names = [(prefix + n).replace(".", "_") for n in fields]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"output column collision after '.'→'_' mapping: {dupes} — "
            f"rename or prefix the conflicting fields"
        )
    out = df
    for name, typ in fields.items():
        out = out.withColumn(
            (prefix + name).replace(".", "_"),
            F.get_json_object(F.col(json_col), f"$.{name}").try_cast(typ),
        )
    return out
