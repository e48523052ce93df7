"""F1 source adapters (sources/text.py): JSONL/CSV transcript ingestion —
schema projection, corrupt-row handling, normalization, and end-to-end
compatibility with the extraction stage."""

from __future__ import annotations

import json

import pytest

from email_address_parser_spark.sources.text import (
    corrupt_record_count,
    read_transcripts_csv,
    read_transcripts_jsonl,
)

ROWS = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user",
     "text": "mail me at alice@example.com", "tool": None,
     "ts": "2026-01-01 10:00:00"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
     "text": "cc bob@example.com too", "tool": "",
     "ts": "2026-01-01 10:00:05"},
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "t.jsonl"
    lines = [json.dumps({**r, "extra_field": 42}) for r in ROWS]
    # duplicate redelivery of turn 0 + one corrupt line
    lines.append(json.dumps(ROWS[0]))
    lines.append('{"conv_id": "broken", "turn_idx": "not-an')
    p.write_text("\n".join(lines))
    return str(p)


def test_jsonl_reader_projects_normalizes_dedupes(spark, jsonl_path):
    df = read_transcripts_jsonl(spark, jsonl_path)
    rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
    assert set(rows) == {("c1", 0), ("c1", 1)}  # dup + corrupt dropped
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert rows[("c1", 1)]["tool"] is None  # empty string -> NULL
    assert rows[("c1", 0)]["ts"] is not None
    assert corrupt_record_count(spark, jsonl_path, fmt="json") == 1


def test_csv_reader_handles_quoted_multiline_text(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        'c9,0,user,"line one\nreach carol@example.com",,2026-02-01 09:00:00\n'
    )
    df = read_transcripts_csv(spark, str(p))
    row = df.collect()[0]
    assert row["conv_id"] == "c9" and "carol@example.com" in row["text"]
    assert "\n" in row["text"]  # multiline cell survived


def test_sources_feed_extraction_end_to_end(spark, jsonl_path):
    from email_address_parser_spark.operators.extract import (
        extract_mentions,
        with_canonical,
    )

    m = with_canonical(extract_mentions(read_transcripts_jsonl(spark, jsonl_path)))
    emails = {r["email"] for r in m.where("valid_lax").collect()}
    assert emails == {"alice@example.com", "bob@example.com"}


def test_jsonl_dedup_tiebreak_is_value_deterministic(spark, tmp_path):
    """Equal/NULL-ts duplicates of the same (conv_id, turn_idx) must keep
    the same survivor on every read: the window orders by ts THEN the row
    values (role, text, tool), so no arbitrary row-number tie remains."""
    p = tmp_path / "dup.jsonl"
    dups = [
        {"conv_id": "c9", "turn_idx": 0, "role": "user",
         "text": "zz write z@example.com", "tool": None, "ts": None},
        {"conv_id": "c9", "turn_idx": 0, "role": "assistant",
         "text": "aa write a@example.com", "tool": None, "ts": None},
        {"conv_id": "c9", "turn_idx": 0, "role": "assistant",
         "text": "aa write a@example.com", "tool": "mail", "ts": None},
    ]
    import json as _json
    # write the duplicates in two different file orders; survivor must match
    p.write_text("\n".join(_json.dumps(r) for r in dups))
    first = read_transcripts_jsonl(spark, str(p)).collect()
    p.write_text("\n".join(_json.dumps(r) for r in reversed(dups)))
    second = read_transcripts_jsonl(spark, str(p)).collect()
    assert len(first) == len(second) == 1
    assert first[0].asDict() == second[0].asDict()
    # earliest in the value order: role 'assistant' < 'user', tool NULL last
    assert first[0]["role"] == "assistant" and first[0]["tool"] == "mail"
