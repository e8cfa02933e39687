"""DegDB — the reference's user-facing API surface, Spark-backed.

Mirrors the HTTP endpoints of /root/reference/core/http.go:29-35
(/api/v1/{insert,query,triples,info}) as methods, so a degdb user's
workflow maps 1:1:

    db = DegDB(spark)
    db.insert_json('[{"subj": "...", "pred": "...", "obj": "..."}]')
    db.query_json('[{"subj": "/m/02mjmr"}]', limit=10)   # → list[dict]
    db.query_steps([...])                                 # path queries
    db.triples()                                          # full dump
    db.info()                                             # {"triples": N, ...}

Differences by design: signing is opt-in (pass a key) because Spark jobs
are trusted-perimeter; gossip/keyspace routing is replaced by Spark's own
data placement (SURVEY.md §2.6).
"""

from __future__ import annotations

import json
from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from degdb_spark.functions.signing import sign_triples
from degdb_spark.operators.traversal import chain_steps
from degdb_spark.operators.triplestore import TripleStore
from degdb_spark.plans.pattern import parse_query_json
from degdb_spark.sources.json_triples import triples_from_json


class DegDB:
    """One node's worth of the degdb surface over a TripleStore."""

    def __init__(self, spark: SparkSession, path: str | None = None, signing_key: bytes | None = None):
        self.spark = spark
        self.store = TripleStore(spark, path=path)
        self.signing_key = signing_key

    # ---- POST /api/v1/insert (core/http.go:40-59) ----
    def insert_json(self, payload: str) -> int:
        df = triples_from_json(self.spark, payload)
        return self.insert(df)

    def insert(self, df: DataFrame) -> int:
        if self.signing_key is not None:
            df = sign_triples(df, self.signing_key)  # W1/W2 (crypto.go:62-91)
        return self.store.insert(df)

    # ---- GET /api/v1/query?q= (core/http.go:94-120) ----
    def query_json(self, q: str, limit: int = -1) -> list[dict]:
        patterns = parse_query_json(q)
        df = self.store.query(patterns, limit=limit)
        return self._dump(df)

    def query_array_op_json(self, q: str, limit: int = -1) -> list[dict]:
        """Full ArrayOp boolean-tree query as JSON — the binary
        protocol's QueryRequest form (protocol.proto:80-89):
        {"mode": "AND", "triples": [...], "arguments": [...]}."""
        import json as _json

        from degdb_spark.plans.pattern import ArrayOp

        op = ArrayOp.from_dict(_json.loads(q))
        df = self.store.query_array_op(op, limit=limit)
        return self._dump(df)

    def query_steps(self, steps: Sequence[Mapping | Iterable[Mapping]]) -> list[dict]:
        """Multi-step path query (ExecuteQuery's chaining,
        core/query.go:14-28), with result dedup (fixing the reference's
        TODO at core/query.go:58)."""
        df = chain_steps(self.store.df, steps)
        return self._dump(df)

    # ---- GET /api/v1/triples (core/http.go:122-130) ----
    def triples(self) -> list[dict]:
        return self._dump(self.store.sort_canonical())

    # ---- GET /api/v1/info (core/http.go + triplestore.go:150-170) ----
    def info(self) -> dict:
        return self.store.size()

    def _dump(self, df: DataFrame) -> list[dict]:
        cols = ["subj", "pred", "obj", "lang", "author", "sig", "created"]
        out = []
        for r in df.select(*cols).collect():
            d = {k: v for k, v in r.asDict().items() if v is not None}
            if "created" in d:
                d["created"] = d["created"].isoformat()
            out.append(d)
        return out

    def to_json(self, rows: list[dict]) -> str:
        return json.dumps(rows, sort_keys=True)
