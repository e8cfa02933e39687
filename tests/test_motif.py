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
