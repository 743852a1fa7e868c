"""JSONL corpus ingestion: schema enforcement, corrupt-line quarantine,
round-trip export (sources/jsonl.py)."""

from __future__ import annotations

import json

from data_warehouse_project_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "books"},
    {"doc_id": 3, "text": "", "lang": "en", "source": "web"},
]
BAD_LINES = [
    '{"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "web"}',
    '{broken json',
]


def _write_corpus(tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [json.dumps(g) for g in GOOD] + BAD_LINES
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_rows_parsed_with_schema(spark, tmp_path):
    clean, _ = read_documents_jsonl(spark, _write_corpus(tmp_path))
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_chars"] == 10
    assert rows[3]["n_chars"] == 0
    assert dict(clean.dtypes)["doc_id"] == "bigint"


def test_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    clean, quarantined = read_documents_jsonl(spark, _write_corpus(tmp_path))
    bad = [r["raw_line"] for r in quarantined.collect()]
    # Both bad lines preserved verbatim for replay; none leak into clean.
    assert len(bad) == 2
    assert any("not-a-number" in b for b in bad)
    assert any("broken" in b for b in bad)
    assert clean.count() == 3


def test_roundtrip_export(spark, tmp_path):
    clean, _ = read_documents_jsonl(spark, _write_corpus(tmp_path))
    out = str(tmp_path / "export")
    write_documents_jsonl(clean, out, partitions=1)
    back = spark.read.json(out)
    assert back.count() == 3
    assert {r["doc_id"] for r in back.collect()} == {1, 2, 3}


def test_contract_violations_quarantined_not_vanished(spark, tmp_path):
    """Well-formed JSON missing doc_id or text must land in quarantine
    (reason 'contract'), not silently vanish between the two frames."""
    p = tmp_path / "c.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web"}\n'
        '{"text": "no id", "lang": "en", "source": "web"}\n'
        '{"doc_id": 2, "lang": "en", "source": "web"}\n'
        "this is not json\n"
    )
    clean, quarantined = read_documents_jsonl(spark, str(p))
    assert clean.count() == 1
    q = quarantined.collect()
    assert len(q) == 3
    reasons = sorted(r["reason"] for r in q)
    assert reasons == ["contract", "contract", "parse"]
    contract_lines = [r["raw_line"] for r in q if r["reason"] == "contract"]
    assert any("no id" in line for line in contract_lines)
