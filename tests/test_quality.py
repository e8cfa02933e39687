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


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=10),
        min_size=1,
        max_size=12,
    )
)
def test_lm_perplexity_matches_python_oracle(spark, token_lists):
    """train_score_bigram_lm equals a straightforward Python replica —
    same md5 split, same pair eligibility (right token in vocab, left
    token has a context count), same micronat quantization, same
    (avg_nll, doc_id) ranking — on dense-collision random corpora
    including empty docs and all-OOV test docs."""
    from degdb_spark.operators.lm import train_score_bigram_lm

    texts = [" ".join(t) for t in token_lists]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.doc_id, r.n_scored, r.nll_micro, r.avg_nll)
        for r in train_score_bigram_lm(docs).collect()
    ]

    def bucket(i):
        return int(_hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100

    def toks(t):
        return _re.split(r"\s+", t.strip().lower())

    def pairs(t):
        tk = toks(t)
        out = []
        for i, b in enumerate(tk):
            a = "<s>" if i == 0 else tk[i - 1]
            if a != "" and b != "":
                out.append((a, b))
        return out

    train = [t for i, t in enumerate(texts) if bucket(i) >= 20]
    test = [(i, t) for i, t in enumerate(texts) if bucket(i) < 20]
    tr = [p for t in train for p in pairs(t)]
    big, ctx, vocab = {}, {}, set()
    for a, b in tr:
        big[(a, b)] = big.get((a, b), 0) + 1
        ctx[a] = ctx.get(a, 0) + 1
        vocab.add(b)
    V = len(vocab)
    want = []
    for i, t in test:
        nll = n = 0
        for a, b in pairs(t):
            if b not in vocab or a not in ctx:
                continue
            n += 1
            nll -= _math.floor(
                _math.log((big.get((a, b), 0) + 1) / (ctx[a] + V)) * 1e6 + 0.5
            )
        if n:
            want.append(
                (i, n, nll, _math.floor((nll / n / 1e6) * 1e6 + 0.5) / 1e6)
            )
    want = sorted(want, key=lambda r: (r[3], r[0]))[:20]
    assert got == want


def _unigram_replica(hist, n_pieces, rounds, maxp, top):
    """Pure-Python unigram-LM hard-EM — the reference semantics of
    operators/unigram.py: substring seed, Viterbi with smallest-j
    tie-break, single-char-preserving prune, micronat costs."""
    import math as _math
    from collections import Counter

    from degdb_spark.operators.nb import LOG_SCALE
    from degdb_spark.operators.unigram import INF_COST

    subs = Counter()
    for w, n in hist.items():
        for i in range(len(w)):
            for j in range(1, min(maxp, len(w) - i) + 1):
                subs[w[i : i + j]] += n
    sel = dict(sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:n_pieces])
    for p, c in subs.items():
        if len(p) == 1:
            sel[p] = c

    def mstep(counted, selected):
        surv = {
            p: counted.get(p, 0)
            for p in selected
            if counted.get(p, 0) > 0 or len(p) == 1
        }
        for p in list(surv):
            if len(p) == 1 and surv[p] == 0:
                surv[p] = 1
        total = float(sum(surv.values()))
        return surv, {
            p: -_math.floor(_math.log(c / total) * LOG_SCALE + 0.5)
            for p, c in surv.items()
        }

    surv, costs = mstep(sel, sel)
    for _ in range(rounds):
        counted = Counter()
        for w, n in hist.items():
            L = len(w)
            dp = [0] + [None] * L
            for i in range(1, L + 1):
                dp[i] = min(
                    dp[i - j] + costs.get(w[i - j : i], INF_COST)
                    for j in range(1, min(maxp, i) + 1)
                )
            pos = L
            while pos > 0:
                for j in range(1, maxp + 1):
                    if (
                        pos >= j
                        and dp[pos - j] + costs.get(w[pos - j : pos], INF_COST)
                        == dp[pos]
                    ):
                        counted[w[pos - j : pos]] += n
                        pos -= j
                        break
        surv, costs = mstep(counted, surv)
    out = sorted(surv.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return [(i + 1, p, c, costs[p]) for i, (p, c) in enumerate(out)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=9),
        st.integers(min_value=1, max_value=40),
        min_size=1,
        max_size=25,
    )
)
def test_unigram_train_matches_python_em(spark, hist):
    """unigram_train_from_hist (operators/unigram.py) equals the
    pure-Python hard-EM reference on arbitrary word histograms — seed
    selection, every Viterbi dp cell and backtrace tie-break, the
    prune, and the micronat cost table all agree for the full
    trajectory."""
    from degdb_spark.operators.unigram import unigram_train_from_hist

    df = spark.createDataFrame(list(hist.items()), "w string, n long")
    got = [
        tuple(r)
        for r in unigram_train_from_hist(
            df, n_pieces=12, rounds=2, max_piece=4, top=10
        ).collect()
    ]
    assert got == _unigram_replica(hist, 12, 2, 4, 10)


def test_unigram_train_edge_cases(spark):
    import pytest as _pytest

    from degdb_spark.operators.unigram import unigram_train, unigram_train_from_hist

    empty = spark.createDataFrame([], "w string, n long")
    with _pytest.raises(ValueError, match="non-empty"):
        unigram_train_from_hist(empty)
    with _pytest.raises(ValueError, match="rounds"):
        unigram_train_from_hist(empty, rounds=0)
    # one word: segments into itself if within max_piece
    one = spark.createDataFrame([("abcd", 3)], "w string, n long")
    rows = [tuple(r) for r in unigram_train_from_hist(one, n_pieces=20, top=5).collect()]
    assert rows[0][1] == "abcd" or rows[0][3] == min(r[3] for r in rows)
