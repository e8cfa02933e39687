"""Document-corpus sources beyond parquet: JSONL and CSV.

Training-data corpora commonly arrive as JSONL shards (one doc per
line) or CSV exports long before they are parquet. Both readers here
are SCHEMA-PINNED: at 100 TB, schema inference is a full extra pass
over the data and a correctness hazard (a shard whose sample rows are
all-null types a column differently), so the schema is declared and
malformed rows are captured instead of crashing the job
(PERMISSIVE + columnNameOfCorruptRecord).

Round-trip parity with the parquet documents table is tested in
tests/test_sources_documents.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents.parquet schema (TESTDATA.md) + the corrupt-row capture col
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)

_READ_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL document corpus with the pinned schema; rows that
    fail to parse land whole in `_corrupt` (inspect with
    corrupt_documents) rather than failing the 1000-executor job."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV variant: header expected, quotes/escapes RFC-4180 defaults,
    multiline quoted text supported (multiLine scans serially per file —
    shard CSVs small, or prefer JSONL, where newline framing keeps
    splits parallel)."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def documents(df: DataFrame) -> DataFrame:
    """The clean rows, parquet-table-shaped (drop the capture column).

    The clean/corrupt split keys on doc_id nullability, NOT on the
    capture column: a malformed row parses to all-null schema columns,
    and doc_id is a required field of the corpus contract. Filtering on
    the capture column directly would trip Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction once column pruning
    reduces a count()-style query to just that column (the documented
    alternative is caching the parse — wrong default at 100 TB)."""
    return df.filter(F.col("doc_id").isNotNull()).select(*_READ_COLS)


def corrupt_documents(df: DataFrame) -> DataFrame:
    """The rows that failed parsing (or lack the required doc_id), for
    quarantine/repair pipelines; the raw line rides in `_corrupt`."""
    return df.filter(F.col("doc_id").isNull()).select("doc_id", "_corrupt")
