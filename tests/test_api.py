"""End-to-end API tests mirroring the reference's HTTP round-trips
(core/http_test.go:44-201): insert JSON → query JSON → compare after
stripping volatile fields."""

from __future__ import annotations

import json

import pytest

from degdb_spark.api import DegDB

OBAMA_JSON = json.dumps(
    [
        {"subj": "/m/02mjmr", "pred": "/type/object/name", "obj": "Barack Obama"},
        {"subj": "/m/02mjmr", "pred": "/type/object/type", "obj": "/people/person"},
        {"subj": "/m/0hume", "pred": "/type/object/name", "obj": "Hume"},
        {"subj": "/m/0hume", "pred": "/type/object/type", "obj": "/organization/team"},
    ]
)


def _spo(rows):
    return sorted((r["subj"], r["pred"], r["obj"]) for r in rows)


@pytest.fixture()
def db(spark):
    db = DegDB(spark, signing_key=b"node-key")
    assert db.insert_json(OBAMA_JSON) == 4
    return db


def test_insert_query_roundtrip(db):
    rows = db.query_json('[{"subj": "/m/02mjmr"}]')
    assert _spo(rows) == [
        ("/m/02mjmr", "/type/object/name", "Barack Obama"),
        ("/m/02mjmr", "/type/object/type", "/people/person"),
    ]
    # signing stamped author+sig on every row (stripped for comparison,
    # exactly as core/query_test.go:64-72 does)
    assert all(r["author"].startswith("degdb:author_") for r in rows)
    assert all("sig" in r and "created" in r for r in rows)


def test_insert_idempotent_via_api(db):
    assert db.insert_json(OBAMA_JSON) == 0  # re-insert → all dups skipped
    assert db.info()["triples"] == 4


def test_triples_dump_canonical_order(db):
    dump = db.triples()
    spos = [(r["subj"], r["pred"], r["obj"]) for r in dump]
    assert spos == sorted(spos)


def test_query_json_single_object(db):
    # HTTP layer accepts a bare object as a 1-element query
    rows = db.query_json('{"pred": "/type/object/type"}')
    assert len(rows) == 2


def test_query_steps(db):
    db.insert_json(json.dumps([
        {"subj": "/people/person", "pred": "/type/kind", "obj": "entity"},
    ]))
    rows = db.query_steps([{"subj": "/m/02mjmr", "pred": "/type/object/type"}, {}])
    assert _spo(rows) == [("/people/person", "/type/kind", "entity")]


def test_limit(db):
    assert len(db.query_json("[{}]", limit=2)) == 2


def test_bad_payload_rejected(db):
    with pytest.raises(ValueError):
        db.insert_json('[{"subject": "typo"}]')


def test_query_array_op_json(db):
    rows = db.query_array_op_json(
        '{"mode": "AND", "triples": [{"pred": "/type/object/type"}],'
        ' "arguments": [{"mode": "NOT", "triples": [{"subj": "/m/0hume"}]}]}'
    )
    assert _spo(rows) == [("/m/02mjmr", "/type/object/type", "/people/person")]
