"""Operator-parity tests for the triple surface, mirroring the reference's
table-driven suite (triplestore/triplestore_test.go)."""

from __future__ import annotations

import pytest

from degdb_spark.operators.triplestore import TripleStore
from degdb_spark.plans.pattern import ArrayOp

from tests.conftest import spo

OBAMA = ("/m/02mjmr", "/type/object/name", "Barack Obama")
OBAMA_TYPE = ("/m/02mjmr", "/type/object/type", "/people/person")
HUME = ("/m/0hume", "/type/object/name", "Hume")
HUME_TYPE = ("/m/0hume", "/type/object/type", "/organization/team")
ALL4 = sorted([OBAMA, OBAMA_TYPE, HUME, HUME_TYPE])


# --- pattern queries (TestTripleStoreQuery, triplestore_test.go:64-141) ---

def test_subject_lookup(obama_store):
    out = obama_store.query({"subj": "/m/02mjmr"})
    assert spo(out) == sorted([OBAMA, OBAMA_TYPE])


def test_predicate_scan(obama_store):
    out = obama_store.query({"pred": "/type/object/type"})
    assert spo(out) == sorted([OBAMA_TYPE, HUME_TYPE])


def test_pred_obj_conjunction(obama_store):
    out = obama_store.query({"pred": "/type/object/name", "obj": "Hume"})
    assert spo(out) == [HUME]


def test_empty_pattern_matches_all(obama_store):
    assert spo(obama_store.query({})) == ALL4


def test_limit(obama_store):
    # limit<=0 → unlimited (triplestore.go:51-53,68-71)
    assert obama_store.query({}, limit=3).count() == 3
    assert obama_store.query({}, limit=-1).count() == 4
    assert obama_store.query({}, limit=0).count() == 4


# --- ArrayOp execution (TestTripleStoreQueryArrayOp, :281-379) ---

def test_or_of_two_subjects(obama_store):
    op = ArrayOp(mode="OR", triples=[{"subj": "/m/02mjmr"}, {"subj": "/m/0hume"}])
    assert spo(obama_store.query_array_op(op)) == ALL4


def test_and_of_two_subjects_is_empty(obama_store):
    # per-row conjunction, NOT result-set intersection
    # (triplestore_test.go:332-345)
    op = ArrayOp(mode="AND", triples=[{"subj": "/m/02mjmr"}, {"subj": "/m/0hume"}])
    assert obama_store.query_array_op(op).count() == 0


def test_and_subject_pred(obama_store):
    op = ArrayOp(
        mode="AND",
        triples=[{"subj": "/m/02mjmr"}, {"pred": "/type/object/name"}],
    )
    assert spo(obama_store.query_array_op(op)) == [OBAMA]


def test_not_subject(obama_store):
    op = ArrayOp(mode="NOT", triples=[{"subj": "/m/02mjmr"}])
    assert spo(obama_store.query_array_op(op)) == sorted([HUME, HUME_TYPE])


def test_not_requires_single_argument(obama_store):
    op = ArrayOp(mode="NOT", triples=[{"subj": "a"}, {"subj": "b"}])
    with pytest.raises(ValueError):
        obama_store.query_array_op(op)


def test_nested_arguments(obama_store):
    # AND(OR(subj=a, subj=b), pred=/type/object/type) → both type rows
    op = ArrayOp(
        mode="AND",
        triples=[{"pred": "/type/object/type"}],
        arguments=[
            ArrayOp(mode="OR", triples=[{"subj": "/m/02mjmr"}, {"subj": "/m/0hume"}])
        ],
    )
    assert spo(obama_store.query_array_op(op)) == sorted([OBAMA_TYPE, HUME_TYPE])


# --- insert semantics (TestTripleDuplicates, :38-62) ---

def test_insert_idempotent(spark):
    rows = [
        {"subj": "a", "pred": "p", "obj": "1"},
        {"subj": "a", "pred": "p", "obj": "1"},  # in-batch dup
        {"subj": "b", "pred": "p", "obj": "2"},
    ]
    store = TripleStore.from_rows(spark, rows)
    assert store.size()["triples"] == 2
    # re-insert the same batch: count unchanged, 0 added
    df = spark.createDataFrame(
        [("a", "p", "1", None, None, None, None), ("b", "p", "2", None, None, None, None)],
        schema=store.df.schema,
    )
    assert store.insert(df) == 0
    assert store.size()["triples"] == 2


def test_batch_scan(obama_store):
    batches = list(obama_store.each_triple_batch(batch_size=3))
    assert [len(b) for b in batches] == [3, 1]


def test_bloom_semi_join(spark, obama_store):
    other = spark.createDataFrame(
        [("/m/02mjmr", "/type/object/name", "Barack Obama")],
        ["subj", "pred", "obj"],
    )
    assert spo(obama_store.matching_bloom(other)) == [OBAMA]


# --- signing (crypto/crypto.go:62-91) ---

def test_signing_roundtrip(spark, obama_store):
    from degdb_spark.functions.signing import sign_triples, verify_triples

    key = b"test-key"
    signed = sign_triples(obama_store.df, key)
    rows = signed.collect()
    assert all(r["author"].startswith("degdb:author_") for r in rows)
    assert all(r["sig"] for r in rows)
    ok = verify_triples(signed, key).select("sig_ok").collect()
    assert all(r["sig_ok"] for r in ok)
    bad = verify_triples(signed, b"other-key").select("sig_ok").collect()
    assert not any(r["sig_ok"] for r in bad)
