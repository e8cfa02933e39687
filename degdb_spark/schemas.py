"""Canonical schemas.

TRIPLE_SCHEMA mirrors the reference's universal record
(/root/reference/protocol/protocol.proto:29-39): one table shape, all
values strings, plus server-stamped ``created``. Testdata schemas match
/root/testdata (TESTDATA.md / FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The universal triple record (protocol/protocol.proto:29-39). ``created``
#: is a timestamp here (reference stores epoch seconds, core/http.go:64-69).
TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("sig", T.StringType(), True),
        T.StructField("created", T.TimestampType(), True),
    ]
)

#: Columns that identify a triple — set semantics / unique index in the
#: reference (triplestore/triplestore.go:42).
TRIPLE_KEY = ["subj", "pred", "obj"]

#: Non-deterministic fields stripped before comparison, exactly as the
#: reference's own tests do (core/query_test.go:64-72).
TRIPLE_VOLATILE = ["author", "sig", "created"]

#: Driver testdata table names (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
