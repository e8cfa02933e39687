"""Data-contract operator tests with planted violations."""

from __future__ import annotations

from pyspark.sql import functions as F

from degdb_spark.operators.quality import check_contract


def test_check_contract_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "B"),      # price violation + flag violation
            (3, None, "A"),      # NULL condition counts as violation
            (9, 1.0, "A"),       # orphan fk
        ],
        ["k", "price", "flag"],
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    out = {
        r.rule: (r.n_rows, r.n_violations)
        for r in check_contract(
            df,
            [
                ("price_positive", F.col("price") > 0),
                ("flag_domain", F.col("flag").isin("A")),
            ],
            fk_checks=[("k_fk", "k", parent, "pk")],
        ).collect()
    }
    assert out == {
        "price_positive": (4, 2),  # -5.0 and NULL
        "flag_domain": (4, 1),
        "k_fk": (4, 1),
    }


def test_check_contract_clean_table(spark):
    df = spark.createDataFrame([(1, 2.0)], ["k", "v"])
    out = check_contract(df, [("v_pos", F.col("v") > 0)]).collect()
    assert out[0].n_violations == 0


def test_k_anonymity_report_flags_small_classes(spark):
    from pyspark.sql import Row

    from degdb_spark.operators.quality import k_anonymity_report

    rows = [Row(qi="a", s=i % 3) for i in range(10)] + [Row(qi="b", s=0)]
    out = {
        r.violates_k: (r.n_classes, r.n_rows, r.min_l_diversity)
        for r in k_anonymity_report(
            spark.createDataFrame(rows), ["qi"], "s", k=5
        ).collect()
    }
    assert out[0] == (1, 10, 3)  # class 'a': 10 rows, 3 sensitive values
    assert out[1] == (1, 1, 1)   # class 'b': singleton -> violation


def test_psi_zero_for_identical_distributions(spark):
    from pyspark.sql import functions as F

    from degdb_spark.operators.drift import psi_bins

    df = spark.range(0, 2000).select((F.col("id") % 97 / 3.0).alias("x"))
    out = psi_bins(df, df, "x").collect()
    assert sum(abs(r.psi_term) for r in out) < 1e-9
    assert len(out) == 10


def test_psi_detects_shift(spark):
    from pyspark.sql import functions as F

    from degdb_spark.operators.drift import psi_bins

    ref = spark.range(0, 2000).select((F.col("id") % 97 / 3.0).alias("x"))
    cur = ref.select((F.col("x") + 20.0).alias("x"))  # hard shift
    psi = sum(r.psi_term for r in psi_bins(ref, cur, "x").collect())
    assert psi > 0.2  # conventional 'investigate' threshold


def test_vocab_kl_drift_flags_new_token(spark):
    from pyspark.sql import Row

    from degdb_spark.operators.drift import vocab_kl_drift

    ref = spark.createDataFrame([Row(text="a b c")] * 50)
    cur = spark.createDataFrame([Row(text="a b zz")] * 50)
    top = vocab_kl_drift(ref, cur, top_n=2).collect()
    assert top[0].token in ("zz", "c")
    zz = [r for r in top if r.token == "zz"]
    assert zz and zz[0].kl_term > 0  # new token contributes positively


def test_dsir_selection_prefers_target_like_docs(spark, tmp_path):
    """DSIR semantics, falsifiably: with target domain src0 speaking
    only 'alpha beta', a src1 doc written in target words must outrank
    a src1 doc of out-of-domain words, and the target's own docs must
    never appear in the selection (they're the reference, not
    candidates)."""
    from degdb_spark.queries.text_queries import dsir_selection

    rows = [
        (0, "alpha beta alpha beta", "en", "src0", 21),
        (1, "alpha beta beta alpha", "en", "src0", 21),
        (2, "alpha beta alpha", "en", "src1", 16),      # target-like
        (3, "zeta eta theta iota", "en", "src1", 19),   # out-of-domain
        (4, "alpha zeta", "en", "src2", 10),            # mixed
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = dsir_selection(spark, str(tmp_path)).collect()
    ids = [r.doc_id for r in got]
    assert 0 not in ids and 1 not in ids, "target docs are not candidates"
    scores = {r.doc_id: r.dsir_score for r in got}
    assert scores[2] > scores[4] > scores[3], "ranking must follow domain fit"


# ---- property tier: DSIR vs a pure-Python bucket-LLR oracle ------------------

import hashlib as _hashlib
import math as _math
import re as _re
from fractions import Fraction as _Fr

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_bucket(w: str, buckets: int) -> int:
    return int(_hashlib.md5(w.encode()).hexdigest()[:8], 16) % buckets


def _py_dround(x: float, n: int) -> float:
    return _math.floor(x * 10**n + 0.5) / 10**n


def _py_dsir(texts, sources, target, buckets):
    """Reference DSIR scoring, straight from the operator spec: hashed
    bucket counts, add-one-smoothed LLR rounded at 6 dp, exact-decimal
    per-doc mean rounded at 6 dp (Fraction replicates decimal sums)."""
    occ = []  # (doc, source, bucket)
    for i, t in enumerate(texts):
        toks = _re.split(r"\s+", t.strip().lower()) if t.strip() else []
        for w in toks:
            occ.append((i, sources[i], _py_bucket(w, buckets)))
    cb, ct = {}, {}
    for _, s, b in occ:
        cb[b] = cb.get(b, 0) + 1
        if s == target:
            ct[b] = ct.get(b, 0) + 1
    tb, tt, v = sum(cb.values()), sum(ct.values()), len(cb)
    llr = {
        b: _py_dround(
            _math.log((ct.get(b, 0) + 1) / (tt + v)) - _math.log((cb[b] + 1) / (tb + v)),
            6,
        )
        for b in cb
    }
    per_doc = {}
    for i, s, b in occ:
        per_doc.setdefault((i, s), []).append(llr[b])
    out = {}
    for (i, s), ls in per_doc.items():
        total = sum((_Fr(round(x * 10**6), 10**6) for x in ls), _Fr(0))
        out[i] = _py_dround(float(total) / len(ls), 6)
    return out


@st.composite
def _dsir_corpora(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts, sources = [], []
    for i in range(n):
        toks = draw(st.lists(st.sampled_from(words), min_size=1, max_size=8))
        texts.append(" ".join(toks))
        sources.append(draw(st.sampled_from(["src0", "src1"])))
    # guarantee at least one target-domain doc so tt > 0 is exercised
    sources[0] = "src0"
    return texts, sources


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_dsir_corpora())
def test_dsir_scores_match_python_oracle(spark, corpus):
    from degdb_spark.operators.text import (
        DSIR_BUCKETS,
        dsir_occurrences,
        dsir_scores,
        dsir_word_counts,
    )

    texts, sources = corpus
    docs = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(zip(texts, sources))],
        "doc_id long, text string, source string",
    )
    occ = dsir_occurrences(docs)
    got = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(occ, dsir_word_counts(occ, "src0")).collect()
    }
    assert got == _py_dsir(texts, sources, "src0", DSIR_BUCKETS)
