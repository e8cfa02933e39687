"""q-gram blocking + edit-distance matching (operators/fuzzy.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from degdb_spark.operators.fuzzy import blocked_pairs, fuzzy_match, qgrams


def test_qgrams_basic_and_short(spark):
    df = spark.createDataFrame([Row(s="abcd"), Row(s="ab"), Row(s="")])
    out = {r.s: r.g for r in df.select("s", qgrams("s", 3).alias("g")).collect()}
    assert out["abcd"] == ["abc", "bcd"]
    assert out["ab"] == []
    assert out[""] == []


def test_fuzzy_match_finds_close_pair_only(spark):
    rows = [
        Row(id=1, name="blue bolt"),
        Row(id=2, name="blue boltz"),  # dist 1
        Row(id=3, name="red widget"),  # far from both
    ]
    out = fuzzy_match(spark.createDataFrame(rows), "id", "name", max_dist=2).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in out] == [(1, 2, 1)]


def test_block_cap_prunes_frequent_gram(spark):
    # every name shares 'aaa'; with the cap below the block size no
    # candidates survive, without it they all pair up
    rows = [Row(id=i, name=f"aaa{i}") for i in range(10)]
    df = spark.createDataFrame(rows)
    assert blocked_pairs(df, "id", "name", block_cap=5).count() == 0
    assert blocked_pairs(df, "id", "name").count() == 45


def test_blocked_pairs_deduped(spark):
    # two shared grams must still yield ONE candidate row
    rows = [Row(id=1, name="abcd"), Row(id=2, name="abcd")]
    out = blocked_pairs(spark.createDataFrame(rows), "id", "name").collect()
    assert len(out) == 1


def test_linkage_scores_weights(spark):
    """Full agreement gets the max weight; full disagreement the min;
    weights are the pinned log2(m/u) sums."""
    import math

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from degdb_spark.operators.fuzzy import FS_FIELDS, linkage_scores

    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2, all_agree=True), Row(id_a=3, id_b=4, all_agree=False)]
    )
    out = linkage_scores(
        pairs,
        {n: F.col("all_agree") for n, _, _ in FS_FIELDS},
    ).collect()
    w = {r.id_a: r.match_weight for r in out}
    hi = sum(math.log2(m / u) for _, m, u in FS_FIELDS)
    lo = sum(math.log2((1 - m) / (1 - u)) for _, m, u in FS_FIELDS)
    assert abs(w[1] - hi) < 1e-3
    assert abs(w[3] - lo) < 1e-3
