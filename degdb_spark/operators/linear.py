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
feature frame is built once and pinned (one exploded-corpus groupBy,
map-side combined; ≤(n_features+1) rows per doc). Each iteration is
one fully-parallel pass over that frame — an equi-join against the
BROADCAST (|labels|·(n_features+1))-row weight frame, a per-doc
struct-min argmax (a map-side-combinable aggregation, no window
sort), and a misclassification-delta groupBy — ending in a collect
of at most |labels|·(n_features+1) rows (the model grid, never the
corpus). The weight vector is the tiny per-round state;
at 100 TB nothing about this loop changes but the scan time.

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


def _predictions(feat: DataFrame, wdf: DataFrame) -> DataFrame:
    """Per-doc argmax label under a weight frame: score(doc, cand) =
    Σ_f x·w via one equi-join on f against the broadcast model grid
    (every doc matches every label through the grid, so zero-score
    labels are present), tie-break (score desc, cand asc). The argmax
    is a lexicographic struct-MIN over (−score, cand) — the exact same
    ordering a row_number window would use, but as a map-side-
    combinable aggregation with no per-partition sort (scores are
    integers, so −s is exact)."""
    scores = (
        feat.join(F.broadcast(wdf), "f")
        .groupBy("doc_id", "actual", "cand")
        .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
    )
    return (
        scores.groupBy("doc_id", "actual")
        .agg(
            F.min(
                F.struct((-F.col("s")).alias("ns"), F.col("cand").alias("cand"))
            ).alias("b")
        )
        .select("doc_id", "actual", F.col("b.cand").alias("pred"))
    )


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
    spark = feat.sparkSession
    from degdb_spark.operators.balance import compact_pinned

    # the featurizers rebalance their explode to full parallelism —
    # right for the build, wrong for the 4-iteration loop below, which
    # would then schedule a near-empty task per partition per pass
    # (the graph-algorithms lesson): fold the materialized frame back
    # to its size-appropriate partition count (no-op at scale)
    feat = compact_pinned(pin(feat, eager=True))
    train_feat = feat.filter(F.col("split") == "train")
    test_feat = feat.filter(F.col("split") == "test")

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
        wdf = spark.createDataFrame(
            [(l, f, w[(l, f)]) for l, f in grid], "cand string, f int, w long"
        )
        miscl = _predictions(train_feat, wdf).filter(F.col("pred") != F.col("actual"))
        deltas = (
            miscl.select("doc_id", F.col("actual").alias("cand"), F.lit(1).alias("sgn"))
            .unionByName(
                miscl.select("doc_id", F.col("pred").alias("cand"), F.lit(-1).alias("sgn"))
            )
            .join(train_feat.select("doc_id", "f", "x"), "doc_id")
            .groupBy("cand", "f")
            .agg(F.sum(F.col("sgn") * F.col("x")).alias("dw"))
            .collect()  # ≤ |labels|·(n_features+1) rows — the model grid
        )
        for r in deltas:
            w[(r.cand, r.f)] += int(r.dw)
        for lf in grid:
            w_sum[lf] += w[lf]

    wavg = spark.createDataFrame(
        [(l, f, w_sum[(l, f)]) for l, f in grid], "cand string, f int, w long"
    )
    return (
        _predictions(test_feat, wavg)
        .groupBy("actual", F.col("pred").alias("predicted"))
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
