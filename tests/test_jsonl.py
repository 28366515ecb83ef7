"""JSONL corpus source (sources/jsonl.py): pinned schema, corrupt-line
quarantine, row fidelity."""

from __future__ import annotations

import pytest

from neo4j_arrow_spark.sources.jsonl import read_documents_jsonl, split_corrupt


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "lang": "en", "source": "web", "text": "hello world"}',
        '{"doc_id": 2, "lang": "de", "source": "web", "text": "hallo welt"}',
        'this is not json at all',
        '{"doc_id": 3, "lang": "fr", "source": "book", "text": "bonjour", "extra_field": 42}',
        '{"doc_id": broken',
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_corrupt_split(spark, jsonl_path):
    df = read_documents_jsonl(spark, jsonl_path)
    clean, bad = split_corrupt(df)
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    # unknown extra fields are ignored under the pinned schema
    assert rows == {1: "hello world", 2: "hallo welt", 3: "bonjour"}
    assert "_corrupt_record" not in clean.columns
    bad_lines = sorted(r["_corrupt_record"] for r in bad.collect())
    assert bad_lines == ["this is not json at all", '{"doc_id": broken']


def test_schema_is_pinned_not_inferred(spark, jsonl_path):
    df = read_documents_jsonl(spark, jsonl_path)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "lang", "source", "text", "_corrupt_record",
    ]
    assert df.schema["doc_id"].dataType.simpleString() == "bigint"
