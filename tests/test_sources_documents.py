"""JSONL/CSV document sources: round-trip parity with the parquet
documents table plus corrupt-row capture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from degdb_spark.sources.documents import (
    corrupt_documents,
    documents,
    read_documents_csv,
    read_documents_jsonl,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def parquet_docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


def test_jsonl_roundtrip(spark, parquet_docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jsonl") / "docs")
    parquet_docs.write.json(path)
    back = documents(read_documents_jsonl(spark, path))
    assert _sorted_rows(back) == _sorted_rows(parquet_docs)
    assert corrupt_documents(read_documents_jsonl(spark, path)).count() == 0


def test_csv_roundtrip(spark, parquet_docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "docs")
    # quoted multiline text must survive the round trip
    parquet_docs.write.option("header", True).option("escape", '"').csv(path)
    back = documents(read_documents_csv(spark, path))
    assert _sorted_rows(back) == _sorted_rows(parquet_docs)


def test_jsonl_corrupt_rows_quarantined(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bad")
    f = d / "part-0.jsonl"
    f.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    raw = read_documents_jsonl(spark, str(d))
    good = documents(raw)
    bad = corrupt_documents(raw)
    assert good.count() == 2
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]["_corrupt"]
