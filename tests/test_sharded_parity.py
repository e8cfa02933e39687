"""Murmur3-64 placement parity: the pure-Python hash matches the
canonical x64_128 known answers (the reference rings route by
murmur3.Sum64 = h1 of x64_128, core/http.go:70), and the sharded layout
round-trips under the murmur3 algo switch with partition pruning
intact."""

from __future__ import annotations

from degdb_spark.functions.murmur3 import murmur3_64, murmur3_x64_128


def test_known_answers():
    # canonical x64_128 seed-0 vectors (mmh3 README / smhasher)
    h1, h2 = murmur3_x64_128(b"foo")
    assert (h2 << 64) | h1 == 168394135621993849475852668931176482145
    assert h1 - (1 << 64) == -2129773440516405919  # signed h1
    assert h2 == 9128664383759220103
    assert murmur3_x64_128(b"") == (0, 0)
    # block-boundary lengths: 16 and 17 bytes exercise body + tail paths
    assert murmur3_64(b"0123456789abcdef") != murmur3_64(b"0123456789abcdeg")
    assert murmur3_64(b"0123456789abcdefX") != murmur3_64(b"0123456789abcdef")


def test_seed_changes_hash():
    assert murmur3_64(b"foo", seed=1) != murmur3_64(b"foo", seed=0)


def test_murmur3_sharded_roundtrip(spark, tmp_path):
    from degdb_spark.operators.sharded import layout_meta, rooted_query, write_sharded

    df = spark.createDataFrame(
        [(f"s{i}", "p", str(i), None, None, None, None) for i in range(200)],
        schema="subj string, pred string, obj string, lang string, author string, sig string, created timestamp",
    )
    path = str(tmp_path / "mm3_sharded")
    write_sharded(df, path, n_shards=8, algo="murmur3_64")
    assert layout_meta(path) == (8, "murmur3_64", "mod")
    # rooted_query picks the algo up from layout metadata — no caller hint
    q = rooted_query(spark, path, ["s7", "s99"])
    assert {(r.subj, r.obj) for r in q.collect()} == {("s7", "7"), ("s99", "99")}


def test_spark_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from degdb_spark.functions.murmur3 import murmur3_shard_udf

    subjects = [f"/m/{i:05x}" for i in range(64)]
    rows = (
        spark.createDataFrame([(s,) for s in subjects], ["subj"])
        .select("subj", murmur3_shard_udf(32)(F.col("subj")).alias("shard"))
        .collect()
    )
    for r in rows:
        assert r.shard == murmur3_64(r.subj.encode()) % 32
