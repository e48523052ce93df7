"""PII detection / redaction over document text (training-data hygiene).

Three channels — email, IPv4, phone — each a single alternation-free regex
chosen so Java regex (Spark executors) and RE2 (the DuckDB oracle) produce
identical spans: greedy quantifiers over character classes only, no
backtracking-dependent constructs, ASCII \\d semantics in both engines.

The email channel is deliberately the TOKEN heuristic, not the full RFC
kernel: redaction is a recall-oriented scrub of things that look like
addresses (the kernel's strict/lax verdict still decides validity wherever
validity matters — extraction uses kernel/grammar.py). Counts are emitted
alongside the redacted text so downstream filters can threshold on PII
density without re-scanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_TOKEN_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9()\- ]{6,}[0-9]"

_MASKS = (
    (EMAIL_TOKEN_RE, "[EMAIL]"),
    (IPV4_RE, "[IP]"),
    (PHONE_RE, "[PHONE]"),
)


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (id, n_emails, n_ips, n_phones, redacted). Counts are measured on
    the ORIGINAL text; masks are applied in a fixed order (email → ip →
    phone) so the output is deterministic and the oracle can replay the
    exact same replacement sequence."""
    text = F.col(text_col)
    out = df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_TOKEN_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("n_phones"),
        text.alias("redacted"),
    )
    for pat, mask in _MASKS:
        out = out.withColumn(
            "redacted", F.regexp_replace(F.col("redacted"), pat, mask)
        )
    return out
