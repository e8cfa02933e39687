"""In-plan averaged-perceptron linear classifier (train + score).

The fifth trained-model family member (IVF: unrolled Lloyd, BPE:
unrolled argmax merges, tree: exact integer split search, NB:
micronat-exact likelihoods): train a multi-class linear text
classifier — the fastText-style quality/label filter that is the most
common trained gate in real pretraining pipelines — and score a
held-out split, with every corpus-sized step a DataFrame operation.

Model: batch multi-class perceptron over hashed bag-of-words features
(md5-bucketed tokens + a bias feature), run for a FIXED number of
iterations; scoring uses the summed per-iteration weights (the
averaged-perceptron estimator — the positive 1/T scale cannot change
an argmax, so the sum IS the average for prediction purposes).

Cross-engine exactness: the entire model is INTEGER — feature values
are token counts, updates are ±count sums, weights and scores are
exact BIGINTs. No logs, no ratios, no quantization step at all: the
per-doc argmax (score desc, label asc) is bit-stable between Spark
and the DuckDB oracle by construction, and the oracle unrolls the
fixed iterations as MATERIALIZED CTEs (w0 → s1/p1/u1/w1 → … → wavg),
the same shape as _bpe_train_sql.

Scale shape (the k-center/BPE scalar-collect discipline): the hashed
feature frame is aggregated once into per-doc sparse arrays and
pinned (one exploded-corpus groupBy + one doc-keyed groupBy,
map-side combined; one row per doc, ≤(n_features+1) struct entries).
Each iteration is one fully-parallel PROJECTION pass over that frame
— the integer model is |labels|·(n_features+1) literals baked into
the argmax expression (it lives on the driver between iterations
anyway), so scoring needs no join and no shuffle at all — plus one
misclassification-delta groupBy, ending in a collect of at most
|labels|·(n_features+1) rows (the model grid, never the corpus).
The weight vector is the tiny per-round state; at 100 TB nothing
about this loop changes but the scan time.

Reference provenance: degdb has no ML surface; this implements the
in-plan model-training leg of the training-pipeline extension
(SURVEY.md §2.6), companion to operators/nb.py and operators/tree.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.operators.balance import rebalance_for_compute
from degdb_spark.operators.sampling import md5_bucket
from degdb_spark.operators.text import tokens
from degdb_spark.persistence import pin

#: hashed feature buckets (tokens hash into 0..N_FEATURES-1; the bias
#: feature is index N_FEATURES, value 1 for every doc)
N_FEATURES = 64
#: fixed perceptron iterations — part of the model definition (the
#: oracle unrolls exactly this many)
N_ITERS = 4


def hashed_features(
    docs: DataFrame, label_col: str, test_pct: int, n_features: int
) -> DataFrame:
    """(doc_id, actual, split, f, x): md5-bucketed token counts plus
    the always-present bias row (f = n_features, x = 1) so every doc —
    even a token-less one — has a scorable feature vector."""
    # a small parquet input arrives as ONE scan partition; the explode
    # + per-token md5 below is a compute-bound projection that would
    # serialize onto that single task (measured: the whole feature
    # build on 1 of 32 cores) — round-robin the raw docs first
    # (guide §2.5 input skew; the simhash/SRP discipline)
    docs = rebalance_for_compute(docs)
    split = F.when(md5_bucket("doc_id", 100) < test_pct, "test").otherwise("train")
    base = docs.select(
        "doc_id", F.col(label_col).alias("actual"), split.alias("split")
    )
    # split/label ride INLINE with the explode (the nb.py trade-off:
    # re-evaluating the md5 bucket per token occurrence is codegen CPU,
    # cheaper than shuffling the token frame for a doc-level join back)
    tokf = (
        docs.select(
            "doc_id",
            F.col(label_col).alias("actual"),
            split.alias("split"),
            F.explode(tokens("text")).alias("token"),
        )
        .filter(F.col("token") != "")
        .withColumn("f", md5_bucket("token", n_features).cast("int"))
        .groupBy("doc_id", "actual", "split", "f")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bias = base.select(
        "doc_id", "actual", "split",
        F.lit(n_features).cast("int").alias("f"),
        F.lit(1).cast("long").alias("x"),
    )
    return tokf.unionByName(bias)


def _pred_expr(labels: list[str], weights, n_features: int):
    """Per-doc argmax label as a pure PROJECTION over the per-doc
    sparse feature array ``fs`` (array<struct<f int, x long>>): the
    model is |labels|·(n_features+1) INTEGER literals baked into the
    plan (it lives on the driver between iterations anyway), so
    score(doc, cand) = Σ x·w is one bounded fold per label — no join,
    no aggregation, no shuffle. The argmax keeps the exact
    (score desc, cand asc) tie-break via array_sort over
    (−score, cand) structs; everything is BIGINT, so the ordering is
    bit-stable (the old broadcast-grid join + two-groupBy plan
    computed the identical sums — this is the same integer math with
    the corpus-sized shuffles deleted)."""
    cand_structs = []
    for lab in labels:
        # a TRUE array Literal (F.lit of the list), not CreateArray of
        # 65 scalar literals: CreateArray inside a lambda body is
        # re-evaluated per array element, turning the fold into
        # O(|fs|·n_features) literal constructions per label per row
        warr = F.lit(
            [int(weights[(lab, f)]) for f in range(n_features + 1)]
        ).cast("array<bigint>")
        s = F.aggregate(
            F.col("fs"),
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + e["x"] * F.element_at(warr, e["f"] + F.lit(1)),
        )
        cand_structs.append(
            F.struct((-s).alias("ns"), F.lit(lab).alias("cand"))
        )
    return F.array_sort(F.array(*cand_structs))[0]["cand"]


def train_predict_linear(
    docs: DataFrame,
    label_col: str = "lang",
    test_pct: int = 20,
    n_features: int = N_FEATURES,
    n_iters: int = N_ITERS,
) -> DataFrame:
    """Train the averaged perceptron on the deterministic md5 train
    split and score the held-out docs; returns the confusion matrix
    (actual, predicted, n_docs) ordered by both labels."""
    return train_predict_from_features(
        hashed_features(docs, label_col, test_pct, n_features),
        n_features=n_features,
        n_iters=n_iters,
    )


def train_predict_from_features(
    feat: DataFrame, n_features: int = N_FEATURES, n_iters: int = N_ITERS
) -> DataFrame:
    """The training loop over a (doc_id, actual, split, f, x) hashed
    feature frame. The frame is a per-doc PROJECTION of the corpus
    (≤(n_features+1) small integers per doc vs kilobytes of text), so
    it can equally come from hashed_features over the live corpus OR
    from the streamed feature index (streaming/linfeat.py) — training
    from the index alone never re-reads a historical document."""
    # Per-doc sparse feature ARRAY, built and pinned once: the rest of
    # training touches only (doc_id, actual, split, fs) rows — one per
    # doc, ≤ n_features+1 struct entries each. Each iteration is then a
    # single projection pass (argmax via _pred_expr's baked-in integer
    # model) + one small groupBy over the misclassified docs' exploded
    # features — the old per-iteration broadcast-grid join and its two
    # corpus-keyed exchanges are gone. Array order is irrelevant:
    # every consumer is a commutative exact-integer fold.
    docfeat = pin(
        feat.groupBy("doc_id", "actual", "split").agg(
            F.collect_list(F.struct(F.col("f"), F.col("x"))).alias("fs")
        ),
        eager=True,
    )
    train_feat = docfeat.filter(F.col("split") == "train")
    test_feat = docfeat.filter(F.col("split") == "test")

    labels = sorted(
        r.actual
        for r in train_feat.select("actual").distinct().collect()
    )
    if not labels:
        raise ValueError("train_predict_linear: no training documents")
    grid = [(l, f) for l in labels for f in range(n_features + 1)]
    w: dict[tuple[str, int], int] = {lf: 0 for lf in grid}
    w_sum: dict[tuple[str, int], int] = {lf: 0 for lf in grid}

    for _ in range(n_iters):
        pred = _pred_expr(labels, w, n_features)
        miscl = train_feat.select(
            "fs", "actual", pred.alias("pred")
        ).filter(F.col("pred") != F.col("actual"))
        deltas = (
            miscl.select(
                "fs",
                F.explode(
                    F.array(
                        F.struct(
                            F.col("actual").alias("cand"),
                            F.lit(1).cast("long").alias("sgn"),
                        ),
                        F.struct(
                            F.col("pred").alias("cand"),
                            F.lit(-1).cast("long").alias("sgn"),
                        ),
                    )
                ).alias("u"),
            )
            .select("u.cand", "u.sgn", F.explode("fs").alias("e"))
            .groupBy("cand", F.col("e.f").alias("f"))
            .agg(F.sum(F.col("sgn") * F.col("e.x")).alias("dw"))
            .collect()  # ≤ |labels|·(n_features+1) rows — the model grid
        )
        for r in deltas:
            w[(r.cand, r.f)] += int(r.dw)
        for lf in grid:
            w_sum[lf] += w[lf]

    return (
        test_feat.select(
            "actual", _pred_expr(labels, w_sum, n_features).alias("predicted")
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual", "predicted")
    )


#: chars of text the language-ID featurizer reads per doc — language
#: identity is decidable from a short prefix (fastText's own demo
#: truncates), and the cap bounds the char-ngram explode at any scale
LANGID_MAX_CHARS = 256


def char_ngram_features(
    docs: DataFrame,
    label_col: str = "lang",
    test_pct: int = 20,
    n_features: int = N_FEATURES,
    n: int = 3,
    max_chars: int = LANGID_MAX_CHARS,
) -> DataFrame:
    """(doc_id, actual, split, f, x): md5-bucketed CHARACTER n-gram
    counts — the fastText language-ID feature family (Joulin et al.
    2016, "Bag of Tricks for Efficient Text Classification": hashed
    char n-grams capture orthography — accents, digraphs, script —
    that word-level stopword lists miss entirely). Feeding these to
    train_predict_from_features yields trained-model family member #9
    (VERDICT r12 "What's missing" #2), the production replacement for
    the stopword-voting heuristic (operators/text.predict_lang).

    Same frame contract as hashed_features, so trainer, oracle CTE
    chain, and streamed-feature twin all apply unchanged. The text is
    lowercased and capped at ``max_chars`` chars, so the explode is
    <= max_chars rows per doc — a constant, not a document-length,
    bound. The bias row keeps gramless (too-short) docs scorable."""
    # single-file inputs otherwise serialize the char-gram explode +
    # 1M-row md5 chain onto one scan task (guide §2.5; measured 6.6 s
    # → sub-second once spread) — same rebalance as hashed_features
    docs = rebalance_for_compute(docs)
    split = F.when(md5_bucket("doc_id", 100) < test_pct, "test").otherwise(
        "train"
    )
    base = docs.select(
        "doc_id", F.col(label_col).alias("actual"), split.alias("split")
    )
    t = F.lower(F.substring(F.trim(F.col("text")), 1, max_chars))
    # the gram array is built INSIDE the generator argument (evaluated
    # once per row — the safe side of the explode-projection trap) and
    # only the cheap md5 bucket rides per exploded element
    grams = F.when(
        F.length("_t") >= n,
        F.transform(
            F.sequence(F.lit(1), F.length("_t") - (n - 1)),
            lambda i: F.substr(F.col("_t"), i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gramf = (
        docs.select(
            "doc_id",
            F.col(label_col).alias("actual"),
            split.alias("split"),
            t.alias("_t"),
        )
        .select(
            "doc_id", "actual", "split", F.explode(grams).alias("gram")
        )
        .withColumn("f", md5_bucket("gram", n_features).cast("int"))
        .groupBy("doc_id", "actual", "split", "f")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bias = base.select(
        "doc_id", "actual", "split",
        F.lit(n_features).cast("int").alias("f"),
        F.lit(1).cast("long").alias("x"),
    )
    return gramf.unionByName(bias)
