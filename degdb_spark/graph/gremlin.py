"""A Gremlin-style fluent traversal DSL over the triple graph.

The reference *declares* GREMLIN (and MQL) query types but returns
ErrNotImplemented for both (/root/reference/protocol/protocol.proto:68-74,
core/query.go:109-112, query/query.go:12). This module implements the
useful core of that declared surface, compiling each traversal step to
DataFrame joins — so the whole chain stays one Catalyst plan (lazy until
``toList``/``df``).

    g = G(triples_df)
    g.V("customer/1").out("in_nation").out("in_region").values()
    g.V().has_pred("name").in_("in_region").count()

Steps: V(ids…) · out(pred?) · in_(pred?) · both(pred?) · has_pred(p) ·
dedup() · limit(n). Terminals: df() / values() / toList() / count().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class G:
    """Traversal source over a triple DataFrame (subj, pred, obj)."""

    def __init__(self, triples: DataFrame):
        self._triples = triples

    def V(self, *ids: str) -> "Traversal":
        spark = self._triples.sparkSession
        if ids:
            frontier = spark.createDataFrame([(i,) for i in ids], ["node"])
        else:
            frontier = (
                self._triples.select(F.col("subj").alias("node"))
                .union(self._triples.select(F.col("obj").alias("node")))
                .distinct()
            )
        return Traversal(self._triples, frontier)


class Traversal:
    def __init__(self, triples: DataFrame, frontier: DataFrame):
        self._t = triples
        self._f = frontier

    # ------------------------------------------------------------ steps
    def out(self, pred: str | None = None) -> "Traversal":
        e = self._t if pred is None else self._t.filter(F.col("pred") == pred)
        nxt = (
            e.join(self._f.withColumnRenamed("node", "subj"), on="subj")
            .select(F.col("obj").alias("node"))
            .distinct()
        )
        return Traversal(self._t, nxt)

    def in_(self, pred: str | None = None) -> "Traversal":
        e = self._t if pred is None else self._t.filter(F.col("pred") == pred)
        nxt = (
            e.join(self._f.withColumnRenamed("node", "obj"), on="obj")
            .select(F.col("subj").alias("node"))
            .distinct()
        )
        return Traversal(self._t, nxt)

    def both(self, pred: str | None = None) -> "Traversal":
        o = self.out(pred)
        i = self.in_(pred)
        return Traversal(self._t, o._f.union(i._f).distinct())

    def has_pred(self, pred: str) -> "Traversal":
        """Keep nodes having at least one outgoing ``pred`` edge."""
        keys = self._t.filter(F.col("pred") == pred).select(
            F.col("subj").alias("node")
        )
        return Traversal(self._t, self._f.join(keys, on="node", how="left_semi"))

    def dedup(self) -> "Traversal":
        return Traversal(self._t, self._f.distinct())

    def limit(self, n: int) -> "Traversal":
        return Traversal(self._t, self._f.orderBy("node").limit(n))

    # -------------------------------------------------------- terminals
    def df(self) -> DataFrame:
        return self._f

    def values(self) -> DataFrame:
        """Literal values attached to the frontier nodes via any pred."""
        return (
            self._t.join(self._f.withColumnRenamed("node", "subj"), on="subj")
            .select("subj", "pred", "obj")
        )

    def toList(self) -> list[str]:
        return sorted(r["node"] for r in self._f.collect())

    def count(self) -> int:
        return self._f.count()
