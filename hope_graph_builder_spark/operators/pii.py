"""PII scrubbing for training corpora — the redaction pass every
published web-text pipeline runs before tokenization (emails, IPv4
addresses, phone numbers → typed placeholder tokens, with per-document
match counts kept as lineage columns).

Engine-portable by construction: the three patterns use only literal
classes, bounded repetition, non-capturing groups, and the ASCII word
boundary — constructs with identical semantics in Java regex (Spark)
and RE2 (DuckDB), so the oracle replays the exact same scrub. Matching
is leftmost, non-overlapping, greedy in both engines.

Scale shape: a pure native map stage (regexp_count / regexp_replace,
whole-stage codegen) — zero shuffles, zero Python; the three passes
pipeline inside one projection per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered scrub: emails first (their local parts contain digits that
# the phone pattern would otherwise chew on), then IPv4 (dotted quads
# are NOT phone numbers), then phones over the already-redacted text —
# the placeholder tokens contain no digits, so later passes can never
# match inside an earlier redaction.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d -]{7,}\d"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def with_pii_scrubbed(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """``df`` + ``out_col`` (the scrubbed text) and per-document match
    counts ``n_emails`` / ``n_ips`` / ``n_phones`` (long). Counts are
    taken against the SAME intermediate each replacement saw, so
    count k ⇔ k placeholder tokens of that kind in the output."""
    t0 = F.col(text_col)
    n_emails = F.regexp_count(t0, F.lit(EMAIL_RE))
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_TOKEN)
    n_ips = F.regexp_count(t1, F.lit(IPV4_RE))
    t2 = F.regexp_replace(t1, IPV4_RE, IP_TOKEN)
    n_phones = F.regexp_count(t2, F.lit(PHONE_RE))
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    return df.withColumns(
        {
            out_col: t3,
            "n_emails": n_emails.cast("long"),
            "n_ips": n_ips.cast("long"),
            "n_phones": n_phones.cast("long"),
        }
    )
