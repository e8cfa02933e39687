"""Randomized (seeded) parity tests: new operators vs pure-Python
reference implementations — the property-test tier for this round's
additions, one Spark job per property (not per example)."""

from __future__ import annotations

import itertools
import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F


def _py_bpe(word: str, merges) -> list[str]:
    """Reference BPE: rank-ordered global pair merges."""
    toks = list(word.lower())
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_encode_matches_python_reference(spark):
    from degdb_spark.operators.text import BPE_MERGES, bpe_encode

    rng = random.Random(1234)
    alphabet = "tablehashjoinowerspark"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([Row(i=i, w=w) for i, w in enumerate(words)])
    got = {
        r.i: r.t for r in df.select("i", bpe_encode("w").alias("t")).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _py_bpe(w, BPE_MERGES), w


def test_setsim_matches_bruteforce_random_corpora(spark):
    from degdb_spark.operators.setsim import setsim_join

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(12)]
    for trial, t in [(0, 0.5), (1, 0.7), (2, 0.9)]:
        corpus = {
            i: set(rng.sample(vocab, rng.randint(2, 8))) for i in range(25)
        }
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=" ".join(sorted(s))) for i, s in corpus.items()]
        )
        got = {
            (r.id_a, r.id_b)
            for r in setsim_join(docs, threshold=t).collect()
        }
        want = set()
        for i, j in itertools.combinations(sorted(corpus), 2):
            jac = len(corpus[i] & corpus[j]) / len(corpus[i] | corpus[j])
            # mirror the operator's 4dp floor-round before thresholding
            if math.floor(jac * 10000 + 0.5) / 10000 >= t:
                want.add((i, j))
        assert got == want, f"trial {trial} t={t}"


def test_weighted_sample_rank_monotone_in_weight(spark):
    """Raising one row's weight can only improve (or keep) its rank —
    the A-ES priority ln(u)/w is monotone in w for fixed u."""
    from degdb_spark.operators.sampling import weighted_sample_topk

    base = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("w")
    )
    def rank_of(df, doc):
        rows = weighted_sample_topk(df, "w", k=100).collect()
        return {r.doc_id: r.sample_rank for r in rows}[doc]

    r1 = rank_of(base, 42)
    boosted = base.withColumn(
        "w", F.when(F.col("doc_id") == 42, 50.0).otherwise(F.col("w"))
    )
    r2 = rank_of(boosted, 42)
    assert r2 <= r1


def test_hll_error_bound_over_cardinalities(spark):
    """|est - n| / n stays within ~3x the theoretical RSE (1.04/sqrt(m))
    across two orders of magnitude of cardinality."""
    from degdb_spark.operators.sketch import hll_estimate, hll_registers

    rse = 1.04 / math.sqrt(256)
    for n in (100, 1000, 20000):
        df = spark.range(0, n).select(F.lit("g").alias("g"), F.col("id").alias("k"))
        est = hll_estimate(hll_registers(df, "k", ["g"]), ["g"]).collect()[0].est_distinct
        assert abs(est - n) / n < 3 * rse + 0.02, (n, est)
