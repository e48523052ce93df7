"""F2/F3/F4/F5 — candidate extraction, parse, and canonicalization operators.

transcripts(conv_id, turn_idx, role, text, tool, ts)
    → mentions(conv_id, turn_idx, mention_idx, raw, local_part, domain,
               valid_strict, valid_lax, email, local_canon, domain_canon)

Plan shape (scale notes):
  * a Catalyst-native pre-filter (`text` contains '@') runs BEFORE the Python
    stage, so the Arrow boundary is only crossed for turns that can possibly
    contain an address — the first-byte-gating tactic of the reference
    (nom_parser.rs:510) lifted to the row level. Parquet scans prune to the
    needed columns automatically (ReadSchema).
  * posexplode assigns mention_idx = position of the candidate within the turn
    text (stable, deterministic ordering key).
  * the parse UDF is a single ArrowEvalPython node; everything around it is
    whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import extract_parse_udf

# chars a verbatim capture may be wrapped in that the canonical form drops:
# single framing WSP of strict dot-atoms, full CFWS of lax forms.
_COMMENT_PATTERN = r"\((?:[^()\\]|\\.)*\)"


def extract_mentions(transcripts: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """transcripts → one row per candidate mention, parsed strict-first.

    Single fused ArrowEvalPython stage (extract_parse_udf): candidates never
    round-trip the JVM↔Python boundary between extraction and parse.
    `passthrough` columns (e.g. the event-time `ts` for streaming windows)
    are carried alongside the mention columns."""
    exploded = (
        transcripts
        # cheap JVM-side gate: no '@' ⇒ no address; avoids the Python hop
        .where(F.col("text").contains("@"))
        .select(
            "conv_id",
            "turn_idx",
            *passthrough,
            F.posexplode(extract_parse_udf(F.col("text"))).alias(
                "mention_idx", "m"
            ),
        )
    )
    return exploded.select(
        "conv_id",
        "turn_idx",
        *passthrough,
        "mention_idx",
        F.col("m.raw").alias("raw"),
        F.col("m.local_part").alias("local_part"),
        F.col("m.domain").alias("domain"),
        F.col("m.valid_strict").alias("valid_strict"),
        F.col("m.valid_lax").alias("valid_lax"),
    ).withColumn(
        "email",
        F.when(
            F.col("valid_lax"),
            F.concat(F.col("local_part"), F.lit("@"), F.col("domain")),
        ),
    )


def canon_local(col: Column) -> Column:
    """Matching-only canonical local part (parity columns stay verbatim, §1.4):
    strip comments and whitespace/folds, unquote + unescape quoted strings."""
    c = F.regexp_replace(col, _COMMENT_PATTERN, "")
    c = F.regexp_replace(c, r"[ \t\r\n]+", "")
    # unquote: "..." wrapper, then unescape \x -> x
    unquoted = F.regexp_replace(F.regexp_extract(c, r'^"(.*)"$', 1), r"\\(.)", "$1")
    return F.when(c.rlike(r'^".*"$'), unquoted).otherwise(c)


def canon_domain(col: Column) -> Column:
    """Matching-only canonical domain: strip CFWS, lowercase. Domain literals
    keep their brackets (they are part of the value, not decoration)."""
    c = F.regexp_replace(col, _COMMENT_PATTERN, "")
    c = F.regexp_replace(c, r"[ \t\r\n]+", "")
    return F.lower(c)


def with_canonical(mentions: DataFrame) -> DataFrame:
    """Add match-feature columns: local_canon, domain_canon, match_key.

    match_key additionally drops dots from the local part — the reference's
    equality is exact (email_address.rs:78), so dot-variants are distinct
    *mentions*; re-uniting them is precisely the entity-resolution task."""
    out = (
        mentions.withColumn("local_canon", canon_local(F.col("local_part")))
        .withColumn("domain_canon", canon_domain(F.col("domain")))
        .withColumn(
            "match_key",
            F.concat(
                F.regexp_replace(F.col("local_canon"), r"\.", ""),
                F.lit("@"),
                F.col("domain_canon"),
            ),
        )
    )
    return out
