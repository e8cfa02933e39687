"""Skewed-corpus property tier for the text/dedup family (VERDICT r5
ask #6 — the text twin of tests/test_graph_skew.py).

Real web corpora are Zipfian: a celebrity token lands in ~90% of
documents, and one crawl source can own ~90% of the corpus. The sf
testdata is too uniform to exercise the per-key work bounds SCALE.md
claims for the candidate generators, so this tier synthesizes the skew
and asserts, quantitatively:

1. PPJoin prefix filtering keeps the celebrity token OUT of the
   blocking keys: its document frequency is ~90% of the corpus, yet the
   largest prefix block stays O(1) and the candidate volume is a tiny
   fraction of what naive token blocking (Σ df² wedges, dominated by
   the celebrity's) would shuffle — while results remain EXACT vs brute
   force, because prefix filtering is lossless by construction.
2. The MinHash band index keeps per-bucket work bounded when one
   source dominates: 90% of docs from one source with distinct content
   spread across band buckets (max bucket O(1)), so candidates track
   the planted near-dup pairs, never |source|².
3. BM25 with a celebrity query term ranks through per-task top-k heaps
   (TakeOrderedAndProject), never an unpartitioned window over the
   corpus-sized candidate set — and the scores are exact on the skewed
   corpus.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Row
from pyspark.sql import functions as F

N_DOCS = 400
CELEB = "celeb"


def _celebrity_corpus():
    """90% of docs contain the celebrity token; every doc carries 5
    unique rare tokens, so no pair is actually similar."""
    rows = []
    for i in range(N_DOCS):
        uniq = " ".join(f"t{i}x{j}" for j in range(5))
        text = f"{CELEB} {uniq}" if i % 10 else uniq
        rows.append(Row(doc_id=i, text=text))
    return rows


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_prefix_filtering_excludes_celebrity_token(spark):
    from degdb_spark.operators.setsim import _prefix_tokens, _rarest_first_sets

    docs = spark.createDataFrame(_celebrity_corpus())
    sets = _rarest_first_sets(docs)
    pref = _prefix_tokens(sets, threshold=0.8)
    # the skew is real: celebrity df is ~90% of the corpus
    n_celeb_docs = docs.filter(F.col("text").contains(CELEB)).count()
    assert n_celeb_docs == 360
    # ...yet rarest-first prefixes never admit it: its block is empty
    celeb_block = pref.filter(F.col("ptok") == CELEB).count()
    assert celeb_block == 0
    # every blocking key stays O(1) — unique rare tokens
    max_block = (
        pref.groupBy("ptok").agg(F.count(F.lit(1)).alias("n")).agg(F.max("n")).first()[0]
    )
    assert max_block <= 2, max_block
    # quantitative work bound: candidate volume (Σ block²) vs the Σ df²
    # wedge volume naive token blocking would pay (celebrity alone
    # contributes 360² = 129,600)
    blocks = pref.groupBy("ptok").agg(F.count(F.lit(1)).alias("n"))
    cand_volume = blocks.agg(F.sum(F.col("n") * F.col("n"))).first()[0]
    tok = (
        docs.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    naive_volume = tok.agg(F.sum(F.col("df") * F.col("df"))).first()[0]
    assert cand_volume < 0.05 * naive_volume, (cand_volume, naive_volume)


def test_setsim_exact_on_celebrity_corpus(spark):
    """Lossless despite the aggressive pruning: planted near-dup pairs
    (one-token edits of each other) all survive on the skewed corpus,
    and nothing else appears."""
    from degdb_spark.operators.setsim import setsim_join

    rows = _celebrity_corpus()
    # plant 3 near-dup pairs: ids 1000-1005, 9 shared + 1 unique token
    # per doc, with a DISTINCT base per pair so only the planted pairs
    # can reach the threshold
    for p in range(3):
        base = " ".join(f"d{p}b{j}" for j in range(9))
        rows.append(Row(doc_id=1000 + 2 * p, text=f"{base} only{2 * p}"))
        rows.append(Row(doc_id=1001 + 2 * p, text=f"{base} only{2 * p + 1}"))
    docs = spark.createDataFrame(rows)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in setsim_join(docs, threshold=0.8).collect()
    }
    want_pairs = {(1000, 1001), (1002, 1003), (1004, 1005)}
    assert set(got) == want_pairs
    assert all(abs(j - 0.8182) < 1e-9 for j in got.values())  # 9/11


def test_band_index_buckets_bounded_when_one_source_dominates(spark):
    """One source owning 90% of the corpus (distinct content) must not
    concentrate band buckets: max bucket size stays O(1) and LSH
    candidates track the planted duplicates, never |source|²."""
    from degdb_spark.operators.dedup import (
        minhash_band_hashes,
        minhash_lsh_candidates,
    )

    rows = []
    for i in range(300):
        src = "megacrawl" if i % 10 else f"site{i}"
        uniq = " ".join(f"w{i}p{j}" for j in range(12))
        rows.append(Row(doc_id=i, source=src, text=uniq))
    # planted exact dup pair inside the dominating source
    rows.append(Row(doc_id=9000, source="megacrawl", text=rows[0].text))
    docs = spark.createDataFrame(rows)

    banded = docs.select(
        "doc_id", F.posexplode(minhash_band_hashes("text")).alias("band", "band_hash")
    )
    max_bucket = (
        banded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert max_bucket <= 3, max_bucket  # never ~270 (the source size)

    cand = minhash_lsh_candidates(docs).collect()
    pairs = {(r.id_a, r.id_b) for r in cand}
    assert (0, 9000) in pairs
    # candidate volume is planted-dup-sized, nowhere near 270²/2 = 36k
    assert len(pairs) <= 10, len(pairs)


def test_bm25_celebrity_term_topk_without_global_window(spark):
    """A query containing the celebrity term makes the scored set
    corpus-sized; ranking must plan as per-task top-k heaps
    (TakeOrderedAndProject), never a data-sized unpartitioned window —
    and scores stay exact (brute-force cross-check on the top doc)."""
    import math

    from degdb_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(_celebrity_corpus())
    out = bm25_topk(docs, [CELEB, "t7x0"], k=5)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan
    # rank is attached to the <=k survivors via sorted-array posexplode,
    # so the plan needs no WindowExec at all
    assert "Window" not in plan
    rows = out.collect()
    assert rows[0].doc_id == 7 and rows[0].n_terms_hit == 2
    # brute-force the winner's score: idf floor-rounded at 6dp per term,
    # per-term contribution floor-rounded, decimal-summed
    n, avgdl = N_DOCS, sum(6 if i % 10 else 5 for i in range(N_DOCS)) / N_DOCS

    def idf(df_):
        return math.floor(math.log(1 + (n - df_ + 0.5) / (df_ + 0.5)) * 1e6 + 0.5) / 1e6

    def w(idf_, tf, dl):
        return (
            math.floor(
                idf_ * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) * 1e6 + 0.5
            )
            / 1e6
        )

    want = round(w(idf(360), 1, 6) + w(idf(1), 1, 6), 6)
    assert abs(rows[0].score - want) < 1e-9, (rows[0].score, want)


def test_span_dedup_celebrity_span_no_window(spark):
    """A boilerplate 10-token span shared by 90% of docs is exactly the
    key a per-key occurrence window would blow up on. The min-struct
    hash agg reduces it map-side: the plan carries ZERO WindowExec, and
    the output keeps the boilerplate only at its first (doc, idx)
    occurrence while every doc's unique tail survives."""
    from degdb_spark.operators.dedup import span_dedup

    boiler = " ".join(f"b{j}" for j in range(10))
    rows = []
    for i in range(300):
        uniq = " ".join(f"t{i}u{j}" for j in range(10))
        text = f"{boiler} {uniq}" if i % 10 else uniq
        rows.append(Row(doc_id=i, text=text))
    docs = spark.createDataFrame(rows)
    out = span_dedup(docs, span_tokens=10)
    assert "Window" not in _plan(out)
    got = {r["doc_id"]: (r["n_kept"], r["text_clean"]) for r in out.collect()}
    # doc 0 has no boilerplate; doc 1 is the first carrier and keeps it
    assert got[0] == (1, " ".join(f"t0u{j}" for j in range(10)))
    assert got[1][0] == 2 and got[1][1].startswith(boiler)
    # every later carrier loses the boilerplate span, keeps its tail
    for i in range(2, 300):
        if i % 10:
            assert got[i] == (1, " ".join(f"t{i}u{j}" for j in range(10)))


def test_trained_langid_beats_stopword_heuristic_on_orthography(spark):
    """Trained language-ID (operators/linear.char_ngram_features →
    the integer perceptron; fastText's recipe) must WIN where the
    stopword heuristic is structurally blind: two languages with
    disjoint orthography (digraph inventories) and ZERO stopwords
    from any marker list. predict_lang votes 'und' everywhere
    (accuracy 0); the char-3gram model separates the scripts on the
    held-out split. Also pins the trainer: the confusion matrix of
    the planted corpus is deterministic."""
    from degdb_spark.operators.linear import (
        char_ngram_features,
        train_predict_from_features,
    )
    from degdb_spark.operators.text import predict_lang

    tha_words = ["thacha", "chatha", "thathra", "chracha", "thrachra"]
    kak_words = ["kakoka", "kokaka", "kakkok", "kokkak", "kakkoko"]
    rows = []
    for i in range(60):
        words = tha_words if i % 2 == 0 else kak_words
        lang = "tha" if i % 2 == 0 else "kak"
        text = " ".join(words[(i + j) % len(words)] for j in range(12))
        rows.append((i, text, lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # heuristic: no marker stopwords anywhere -> 'und', accuracy 0
    heur = predict_lang(docs).select("lang", "pred_lang").collect()
    heur_acc = sum(r.lang == r.pred_lang for r in heur) / len(heur)
    assert heur_acc == 0.0

    conf = train_predict_from_features(
        char_ngram_features(docs, label_col="lang", test_pct=20)
    ).collect()
    n_test = sum(r.n_docs for r in conf)
    trained_acc = sum(r.n_docs for r in conf if r.actual == r.predicted) / n_test
    assert n_test > 0 and trained_acc >= 0.9 > heur_acc


def test_char_ngram_features_match_python_replica(spark):
    """char_ngram_features == a literal Python featurizer: lowercase,
    256-char cap, positions 1..len-2, md5-bucket counts, bias row —
    including the short-doc (gramless) and empty-doc edges."""
    import hashlib

    from degdb_spark.operators.linear import char_ngram_features

    rows = [
        (0, "Abc defG", "x"),
        (1, "ab", "y"),          # too short: bias row only
        (2, "", "y"),            # empty: bias row only
        (3, "ééé øøø", "x"),     # non-ASCII lowercasing parity
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r.doc_id, r.f): r.x
        for r in char_ngram_features(docs, test_pct=0, n_features=64).collect()
    }

    want = {}
    for i, text, _lang in rows:
        t = text.strip()[:256].lower()
        for p in range(len(t) - 2):
            g = t[p : p + 3]
            f = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 64
            want[(i, f)] = want.get((i, f), 0) + 1
        want[(i, 64)] = 1  # bias
    assert got == want
