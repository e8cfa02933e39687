"""Motif matcher tests (hand-computed matches)."""

from __future__ import annotations

import pytest

from degdb_spark.graph.motif import find, parse_motif


@pytest.fixture(scope="module")
def tri(spark):
    rows = [
        ("a", "knows", "b"),
        ("b", "knows", "c"),
        ("a", "knows", "c"),
        ("c", "likes", "d"),
        ("b", "likes", "d"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_parse():
    terms = parse_motif("(a)-[knows]->(b); (b)-[]->(c)")
    assert len(terms) == 2
    assert terms[0].pred == "knows" and terms[1].pred is None


def test_two_hop_motif(tri):
    out = {
        (r.x, r.y, r.z)
        for r in find(tri, "(x)-[knows]->(y); (y)-[knows]->(z)").collect()
    }
    assert out == {("a", "b", "c")}


def test_triangle(tri):
    out = {
        (r.x, r.y, r.z)
        for r in find(
            tri, "(x)-[knows]->(y); (y)-[knows]->(z); (x)-[knows]->(z)"
        ).collect()
    }
    assert out == {("a", "b", "c")}


def test_converging_motif(tri):
    # two distinct people who both like d
    out = {
        (r.p, r.q)
        for r in find(tri, "(p)-[likes]->(d0); (q)-[likes]->(d0)").collect()
        if r.p != r.q
    }
    assert out == {("b", "c"), ("c", "b")}


def test_literal_anchor(tri):
    out = {(r.n,) for r in find(tri, "(=a)-[knows]->(n)").collect()}
    assert out == {("b",), ("c",)}


def test_bad_pattern(tri):
    with pytest.raises(ValueError):
        find(tri, "(a)-[x->(b)")


def test_self_loop_term(spark):
    # '(x)-[p]->(x)' must only match actual self-loops (src == dst within
    # the edge), not every edge's src — the GraphFrames semantics for a
    # variable repeated inside one term.
    rows = [("a", "p", "a"), ("a", "p", "b"), ("b", "p", "c")]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = {r.x for r in find(tri, "(x)-[p]->(x)").collect()}
    assert out == {"a"}


def test_self_loop_chained(spark):
    # self-loop constraint composes with a join to a second term
    rows = [("a", "p", "a"), ("a", "q", "b"), ("c", "q", "d"), ("c", "p", "b")]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = {
        (r.x, r.y) for r in find(tri, "(x)-[p]->(x); (x)-[q]->(y)").collect()
    }
    assert out == {("a", "b")}
