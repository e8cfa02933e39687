"""Keyspace algebra — full port of the reference's vector table
(/root/reference/protocol/keyspace_test.go:10-318) plus the Spark
predicate and shard-pruning integrations."""

from __future__ import annotations

import pytest

from degdb_spark.plans.keyspace import (
    Keyspace,
    complement,
    includes_column,
    intersection,
    keyspace_shards,
    union,
)

MAX = (1 << 64) - 1


# keyspace_test.go:10-77
@pytest.mark.parametrize(
    "ks,hash_,want",
    [
        (Keyspace(1, 100), 50, True),
        (Keyspace(1, 100), 150, False),
        (Keyspace(100, 1), 150, True),
        (Keyspace(100, 1), 50, False),
        (Keyspace(100, 50), 25, True),
        (Keyspace(100, 50), 75, False),
        (None, 0, False),
    ],
)
def test_includes(ks, hash_, want):
    got = ks.includes(hash_) if ks is not None else False
    assert got == want


# keyspace_test.go:79-154
@pytest.mark.parametrize(
    "a,b,want",
    [
        (Keyspace(1, 10), Keyspace(20, 30), None),
        (Keyspace(1, 10), Keyspace(10, 20), Keyspace(1, 20)),
        (Keyspace(10, 20), Keyspace(1, 10), Keyspace(1, 20)),
        (Keyspace(1, 20), Keyspace(5, 10), Keyspace(1, 20)),
        (Keyspace(5, 10), Keyspace(1, 20), Keyspace(1, 20)),
        (Keyspace(MAX - 5, MAX - 1), Keyspace(MAX - 1, 20), Keyspace(MAX - 5, 20)),
        (Keyspace(MAX - 1, 20), Keyspace(MAX - 5, MAX - 1), Keyspace(MAX - 5, 20)),
        (Keyspace(MAX - 5, 1), Keyspace(1, 20), Keyspace(MAX - 5, 20)),
        (Keyspace(1, 20), Keyspace(MAX - 5, 1), Keyspace(MAX - 5, 20)),
        (Keyspace(1, 20), Keyspace(20, 1), Keyspace(1, 0)),
        (None, None, None),
        (Keyspace(1, 2), None, Keyspace(1, 2)),
        (None, Keyspace(1, 2), Keyspace(1, 2)),
    ],
)
def test_union(a, b, want):
    assert union(a, b) == want


# keyspace_test.go:156-236
@pytest.mark.parametrize(
    "a,b,want",
    [
        (Keyspace(1, 10), Keyspace(20, 30), None),
        (Keyspace(1, 10), Keyspace(10, 20), Keyspace(10, 10)),
        (Keyspace(10, 20), Keyspace(1, 10), Keyspace(10, 10)),
        (Keyspace(1, 15), Keyspace(10, 20), Keyspace(10, 15)),
        (Keyspace(10, 20), Keyspace(1, 15), Keyspace(10, 15)),
        (Keyspace(1, 20), Keyspace(5, 10), Keyspace(5, 10)),
        (Keyspace(5, 10), Keyspace(1, 20), Keyspace(5, 10)),
        (Keyspace(MAX - 5, MAX - 1), Keyspace(MAX - 1, 20), Keyspace(MAX - 1, MAX - 1)),
        (Keyspace(MAX - 1, 20), Keyspace(MAX - 5, MAX - 1), Keyspace(MAX - 1, MAX - 1)),
        (Keyspace(MAX - 5, 1), Keyspace(1, 20), Keyspace(1, 1)),
        (Keyspace(1, 20), Keyspace(MAX - 5, 1), Keyspace(1, 1)),
        (Keyspace(1, 20), Keyspace(20, 1), Keyspace(1, 1)),
        (None, None, None),
        (Keyspace(1, 2), None, None),
        (None, Keyspace(1, 2), None),
    ],
)
def test_intersection(a, b, want):
    assert intersection(a, b) == want


# keyspace_test.go:238-259
def test_mag():
    assert Keyspace(1, 10).mag() == 9
    assert Keyspace(MAX - 5, 1).mag() == 7


# keyspace_test.go:261-287
def test_maxed():
    assert not Keyspace(1, 10).maxed()
    assert Keyspace(2, 1).maxed()
    assert union(Keyspace(1, 20), Keyspace(20, 1)).maxed()


# keyspace_test.go:289-318
def test_complement():
    assert complement(Keyspace(1, 10)) == Keyspace(10, 1)
    assert complement(None) == Keyspace(1, 0)
    assert complement(Keyspace(1, 0)) is None


# ---------------------------------------------------------------- Spark side
def test_includes_column_matches_python(spark):
    from pyspark.sql import functions as F

    # keyspaces exercising plain / wrapped / near-boundary arcs
    spaces = [
        Keyspace(1, 100),
        Keyspace(100, 1),  # wraps
        Keyspace(MAX - 5, 20),  # wraps across 0
        Keyspace(5, 4),  # maxed
    ]
    df = (
        spark.range(500)
        .select(F.concat(F.lit("s"), F.col("id")).alias("subj"))
        .select("subj", F.xxhash64("subj").alias("h"))
    )
    rows = df.collect()
    for ks in spaces:
        got = {
            r.subj
            for r in df.filter(includes_column(F.col("h"), ks)).collect()
        }
        want = {r.subj for r in rows if ks.includes(r.h & ((1 << 64) - 1))}
        assert got == want, ks


def test_keyspace_shards_pruning_math():
    # arc of magnitude 3 starting at 30, 16 shards → residues 14,15,0
    assert keyspace_shards(Keyspace(30, 33), 16) == [0, 14, 15]
    # arc >= n_shards → all shards (None)
    assert keyspace_shards(Keyspace(0, 16), 16) is None
    assert keyspace_shards(Keyspace(5, 4), 16) is None  # maxed
    assert keyspace_shards(Keyspace(7, 7), 16) == []  # empty
    assert keyspace_shards(None, 16) == []
    # exhaustive cross-check against brute-force residues for small arcs
    for start in (0, 7, 100, MAX - 3):
        ks = Keyspace(start, (start + 5) & MAX)
        want = sorted({(start + i) % 16 for i in range(5)})
        assert keyspace_shards(ks, 16) == want


def test_keyspace_shards_range_math():
    from degdb_spark.plans.keyspace import keyspace_shards_range

    # 16 shards → each owns a 2^60-wide arc; half the ring → shards 0-7
    half = Keyspace(0, 1 << 63)
    assert keyspace_shards_range(half, 16) == list(range(0, 8))
    # wrap through zero: top quarter (12-15) + bottom quarter (0-3)
    wrap = Keyspace(3 << 62, 1 << 62)
    assert keyspace_shards_range(wrap, 16) == [0, 1, 2, 3, 12, 13, 14, 15]
    assert keyspace_shards_range(Keyspace(5, 4), 16) is None  # maxed
    assert keyspace_shards_range(None, 16) == []
    with pytest.raises(ValueError):
        keyspace_shards_range(Keyspace(0, 10), 12)


def test_keyspace_query_range_scheme(spark, tmp_path):
    from pyspark.sql import functions as F

    from degdb_spark.operators.sharded import keyspace_query, write_sharded

    df = spark.createDataFrame(
        [(f"s{i}", "p", str(i), None, None, None, None) for i in range(400)],
        schema="subj string, pred string, obj string, lang string, author string, sig string, created timestamp",
    )
    path = str(tmp_path / "range_sharded")
    write_sharded(df, path, n_shards=16, algo="xxhash64", scheme="range")

    # expected membership computed independently with the Python algebra
    hashes = {
        r.subj: r.h & ((1 << 64) - 1)
        for r in df.select("subj", F.xxhash64("subj").alias("h")).collect()
    }
    for ks in (Keyspace(0, 1 << 63), Keyspace(3 << 62, 1 << 62)):
        got = {r.subj for r in keyspace_query(spark, path, ks).collect()}
        want = {s for s, h in hashes.items() if ks.includes(h)}
        assert got == want and want, ks

    # nil keyspace includes nothing (keyspace.go:5-7)
    assert keyspace_query(spark, path, None).count() == 0

    # pruning: the half-ring scan must carry a shard partition filter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        keyspace_query(spark, path, Keyspace(0, 1 << 63)).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters:" in plan and "shard" in plan


def test_keyspace_query_murmur3_mod(spark, tmp_path):
    from degdb_spark.functions.murmur3 import murmur3_64
    from degdb_spark.operators.sharded import keyspace_query, write_sharded

    df = spark.createDataFrame(
        [(f"d{i}", "p", str(i), None, None, None, None) for i in range(100)],
        schema="subj string, pred string, obj string, lang string, author string, sig string, created timestamp",
    )
    path = str(tmp_path / "mm3_mod")
    write_sharded(df, path, n_shards=8, algo="murmur3_64", scheme="mod")
    ks = Keyspace(1 << 62, 3 << 63)
    got = {r.subj for r in keyspace_query(spark, path, ks).collect()}
    want = {
        f"d{i}" for i in range(100) if ks.includes(murmur3_64(f"d{i}".encode()))
    }
    assert got == want and want
