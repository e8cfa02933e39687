"""JSON triple sources — parity with the reference's ingest surface.

- ``triples_from_json``: a JSON array of (partial) triples, the payload
  of POST /api/v1/insert (/root/reference/core/http.go:40-59).
- ``read_triples_jsonl``: distributed JSONL ingest (the at-scale path:
  spark.read.json with an explicit schema — no inference pass).
"""

from __future__ import annotations

import json
from typing import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.schemas import TRIPLE_SCHEMA


def triples_from_json(spark: SparkSession, payload: str | Iterable[Mapping]) -> DataFrame:
    """Parse a JSON array of triples into a TRIPLE_SCHEMA DataFrame
    (handleInsertTriple's json.Decode, core/http.go:46-52). Unknown keys
    are rejected, missing keys are NULL."""
    rows = json.loads(payload) if isinstance(payload, str) else list(payload)
    if isinstance(rows, Mapping):
        rows = [rows]
    field_names = {f.name for f in TRIPLE_SCHEMA.fields}
    clean = []
    for r in rows:
        unknown = set(r) - field_names
        if unknown:
            raise ValueError(f"unknown triple fields: {sorted(unknown)}")
        clean.append({name: r.get(name) for name in field_names})
    return spark.createDataFrame(clean, schema=TRIPLE_SCHEMA)


def read_triples_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Distributed JSONL triple ingest with the fixed schema (scale path:
    schema-on-read, no inference job)."""
    df = spark.read.schema(TRIPLE_SCHEMA).json(path)
    return df.select([f.name for f in TRIPLE_SCHEMA.fields])
