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
