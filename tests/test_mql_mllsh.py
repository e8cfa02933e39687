"""MQL template resolution + pyspark.ml LSH wrapper tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from degdb_spark.plans.mql import query_mql


@pytest.fixture(scope="module")
def tri(spark):
    rows = [
        ("/m/02mjmr", "/type/object/name", "Barack Obama"),
        ("/m/02mjmr", "/type/object/type", "/people/person"),
        ("/m/02mjmr", "/people/person/spouse", "/m/025s5v9"),
        ("/m/025s5v9", "/type/object/name", "Michelle Obama"),
        ("/m/025s5v9", "/type/object/type", "/people/person"),
        ("/m/0hume", "/type/object/name", "Hume"),
        ("/m/0hume", "/type/object/type", "/organization/team"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_fill_by_id(tri):
    out = query_mql(tri, {"id": "/m/02mjmr", "/type/object/name": None})
    assert out == [{"id": "/m/02mjmr", "/type/object/name": "Barack Obama"}]


def test_find_by_constraint(tri):
    out = query_mql(
        tri, {"id": None, "/type/object/type": "/people/person", "/type/object/name": None}
    )
    names = sorted(r["/type/object/name"] for r in out)
    assert names == ["Barack Obama", "Michelle Obama"]


def test_list_placeholder(tri):
    out = query_mql(tri, {"id": "/m/02mjmr", "/type/object/type": []})
    assert out[0]["/type/object/type"] == ["/people/person"]


def test_nested_template(tri):
    out = query_mql(
        tri,
        {"id": "/m/02mjmr", "/people/person/spouse": {"/type/object/name": None}},
    )
    spouse = out[0]["/people/person/spouse"]
    assert spouse == [
        {"id": "/m/025s5v9", "/type/object/name": "Michelle Obama"}
    ]


def test_missing_property_is_null(tri):
    out = query_mql(tri, {"id": "/m/0hume", "/people/person/spouse": None})
    assert out[0]["/people/person/spouse"] is None


def test_mql_job_count_independent_of_matches(tri, spark):
    # A flat template resolves in ONE action (a handful of AQE stage
    # jobs) regardless of how many subjects match — the old per-subject
    # _fill loop ran a separate Spark job per matching subject.
    sc = spark.sparkContext
    sc.setJobGroup("mql-flat-probe", "job count probe")
    try:
        out = query_mql(
            tri,
            {"id": None, "/type/object/type": "/people/person", "/type/object/name": None},
        )
        assert len(out) == 2
        jobs = len(sc.statusTracker().getJobIdsForGroup("mql-flat-probe"))
        assert jobs <= 6, f"flat template ran {jobs} jobs"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)


# ------------------------------------------------------------- ml wrappers
def test_ml_minhash_agrees_with_expression_impl(spark):
    from degdb_spark.operators.dedup import minhash_lsh_candidates, ngram_jaccard_pairs
    from degdb_spark.operators.ml_lsh import ml_minhash_neardups

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    expr_pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, candidates=minhash_lsh_candidates(docs), threshold=0.4
        ).collect()
    }
    ml_pairs = {
        (r.id_a, r.id_b)
        for r in ml_minhash_neardups(docs, jaccard_distance=0.6).collect()
    }
    # both find the same high-overlap pairs (ml join threshold 0.6 dist
    # == 0.4 jaccard); require substantial agreement
    if expr_pairs or ml_pairs:
        inter = len(expr_pairs & ml_pairs)
        assert inter >= max(1, int(0.7 * max(len(expr_pairs), 1)))


def test_ml_brp_neighbors_shape(spark):
    from degdb_spark.operators.ml_lsh import ml_brp_neighbors

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = ml_brp_neighbors(emb, q, k=4).collect()
    assert len(out) == 12
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        ds = [r.eucl_dist for r in sorted(rows, key=lambda r: r.rank)]
        assert ds == sorted(ds)


def test_max_results_guard(tri):
    """The per-level driver collect fails LOUDLY past max_results —
    never a silent truncation (a truncated MQL answer is wrong) and
    never an unbounded collect (VERDICT r7 watch #3)."""
    with pytest.raises(ValueError, match="max_results"):
        query_mql(tri, {"id": None, "/type/object/name": None}, max_results=2)
    # at the cap exactly: fine (3 subjects, cap 3)
    out = query_mql(tri, {"id": None, "/type/object/name": None}, max_results=3)
    assert len(out) == 3
    # None disables the guard
    out = query_mql(tri, {"id": None, "/type/object/name": None}, max_results=None)
    assert len(out) == 3
