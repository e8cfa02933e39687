from degdb_spark.operators.triplestore import TripleStore

__all__ = ["TripleStore"]
