"""Deterministic sampling / split contract queries (oracle-checked via
the portable md5 bucket — the split assignment is auditable in DuckDB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.operators.sampling import md5_bucket
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dround, dsum, sql_dround, sql_dsum

_BUCKET_SQL = "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR(64))), 1, 8)) AS BIGINT) % 100"


def docs_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified split QA: per (lang, split) counts with a 10% hash
    test split on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(md5_bucket("doc_id", 100) < 10, "test").otherwise("train")
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "split")
    )


SPLIT_SQL = f"""
SELECT lang,
       CASE WHEN {_BUCKET_SQL.format(key='doc_id')} < 10 THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n
FROM documents
GROUP BY lang, split
ORDER BY lang, split
"""


def lineitem_sample_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample of lineitem (by orderkey-linenumber key),
    revenue per returnflag — the stable-sample aggregation pattern for
    quick estimates over a 100 TB fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.filter(md5_bucket(key, 100) < 5)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
                "sample_revenue"
            ),
        )
        .orderBy("l_returnflag")
    )


SAMPLE_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_sampled,
       CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS sample_revenue
FROM lineitem
WHERE {_BUCKET_SQL.format(key="CONCAT(l_orderkey, '-', l_linenumber)")} < 5
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


#: Per-source keep rates (percent) for the mixture sampler; sources not
#: listed fall back to the default. One dict drives BOTH the Spark CASE
#: and the oracle CASE, so the mixture definition can't diverge.
_MIX_RATES = {"src0": 90, "src1": 25, "src2": 70, "src3": 40, "src4": 100}
_MIX_DEFAULT = 50


def docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing: per-source keep rates applied through
    the portable md5 bucket — the mixture-weighting primitive of
    training-data assembly (upsample books, downsample web). Because
    membership is a pure hash of doc_id, the mixture is reproducible in
    any engine, stable under corpus growth, and rerunning with a higher
    rate strictly grows the kept set (bucket < rate is monotone).
    Reports total/kept docs and kept char mass per source."""
    docs = load_table(spark, sf_dir, "documents")
    rate = None
    for s, r in _MIX_RATES.items():
        cond = F.col("source") == s
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(_MIX_DEFAULT))
    kept = md5_bucket("doc_id", 100) < rate
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0))).alias(
                "kept_chars"
            ),
        )
        .orderBy("source")
    )


_MIX_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {r}" for s, r in _MIX_RATES.items())
    + f" ELSE {_MIX_DEFAULT} END"
)

MIXTURE_SQL = f"""
WITH d AS (
  SELECT source, n_chars,
         {_MIX_CASE} AS rate,
         {_BUCKET_SQL.format(key='doc_id')} AS b
  FROM documents
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN b < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN b < rate THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM d GROUP BY source ORDER BY source
"""


_TEMP_FRACTION = 0.5  # target sample = half the corpus
_TEMP_BUCKETS = 1_000_000


def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (T = 2): per-source keep
    probability ∝ (n_s)^(1/T) — the standard multilingual/rare-source
    upweighting rule (sampling shares flatten toward uniform as T
    grows). With T = 2 the weight is sqrt(n_s), an IEEE-exact function
    of the exact integer counts; the weight is then FLOOR-rounded at
    6 dp and w_sum accumulates in DECIMAL (rounding.py discipline) so
    the shared normaliser is order-independent — a raw SUM(double)
    here flipped a FLOOR boundary run-to-run and, because the
    comparator sorts rows by value, cascaded one ±1 threshold into a
    20/20 row mismatch. Membership stays the portable md5 bucket of
    doc_id (deterministic, monotone under rate changes). Shares and
    thresholds ride as a broadcast per-source aggregate — one scan for
    counts, one for the gated aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = counts.withColumn(
        "w", dround(F.sqrt(F.col("n_s").cast("double")), 6)
    )
    sums = w.agg(
        F.sum("n_s").alias("n_total_all"),
        dsum(F.col("w"), 6).alias("w_sum"),
    )
    rates = (
        w.crossJoin(F.broadcast(sums))
        .withColumn(
            # The testdata's equal source counts put the true threshold
            # EXACTLY on an integer (x = 500000), so a one-ulp
            # difference flips FLOOR. The shared +1e-6 epsilon (far
            # above accumulated FP error ~1e-9, far below the 0.5-ish
            # distance of any non-degenerate boundary) makes both
            # engines take the ceiling there deterministically.
            "thr",
            F.least(
                F.floor(
                    F.lit(float(_TEMP_FRACTION))
                    * F.col("n_total_all")
                    * F.col("w")
                    / (F.col("w_sum") * F.col("n_s"))
                    * F.lit(float(_TEMP_BUCKETS))
                    + F.lit(1e-6)
                ),
                F.lit(_TEMP_BUCKETS),
            ).cast("long"),
        )
        .select("source", "thr")
    )
    kept = md5_bucket("doc_id", _TEMP_BUCKETS).cast("long") < F.col("thr")
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.max("thr").alias("keep_threshold"),
        )
        .orderBy("source")
    )


TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), w AS (
  SELECT source, n_s, {sql_dround('SQRT(CAST(n_s AS DOUBLE))', 6)} AS w FROM counts
), sums AS (
  SELECT SUM(n_s) AS n_total_all, {sql_dsum('w', 6)} AS w_sum FROM w
), rates AS (
  SELECT source,
         CAST(LEAST(FLOOR({_TEMP_FRACTION} * n_total_all * w / (w_sum * n_s)
                          * {float(_TEMP_BUCKETS)} + 0.000001), {_TEMP_BUCKETS}) AS BIGINT)
           AS thr
  FROM w CROSS JOIN sums
)
SELECT d.source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR(64))), 1, 8)) AS BIGINT)
                     % {_TEMP_BUCKETS} < r.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       MAX(r.thr) AS keep_threshold
FROM documents d JOIN rates r ON d.source = r.source
GROUP BY d.source ORDER BY d.source
"""




def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sample (without replacement,
    exact k=100) with weight = document length — deterministic content-
    hash priorities, so the sample is reproducible and auditable."""
    from degdb_spark.operators.sampling import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample_topk(docs, F.col("n_chars").cast("double"), k=100)
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        "priority_key",
        "sample_rank",
    ).orderBy("sample_rank")


WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         FLOOR((ln(GREATEST(
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR(64))), 1, 12)) AS BIGINT)::DOUBLE
               / 281474976710656.0, 1e-15)) / CAST(n_chars AS DOUBLE)) * 1000000000 + 0.5)
           / 1000000000 AS priority_key
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT doc_id, n_chars, priority_key,
         ROW_NUMBER() OVER (ORDER BY priority_key DESC, doc_id) AS sample_rank
  FROM keyed
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, priority_key, sample_rank
FROM ranked WHERE sample_rank <= 100 ORDER BY sample_rank
"""


def docs_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered data selection under a global token budget — the
    curation primitive behind 'take the best 25% of the corpus by
    tokens': rank documents by composite quality score (operators/
    text.quality_features), take the maximal quality-first prefix whose
    cumulative token count fits budget = total_tokens div 4.

    The cumulative sum runs through operators/ranking.
    global_running_sum (two-phase scan) — NO corpus-sized
    unpartitioned window — and the budget rides as a broadcast 1-row
    aggregate, never a driver round-trip. Reports the selected set per
    source: how the budget redistributes the mixture is exactly what a
    curation run needs to audit."""
    from degdb_spark.operators.ranking import global_running_sum
    from degdb_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality_score",
    )
    cum = global_running_sum(
        feats,
        [F.col("quality_score").desc(), F.col("doc_id")],
        "n_tokens",
        sum_name="cum_tokens",
    )
    total = feats.agg(F.sum("n_tokens").alias("_total"))
    sel = cum.crossJoin(F.broadcast(total)).filter(
        F.col("cum_tokens") <= F.expr("_total DIV 4")
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("quality_score").alias("min_quality"),
        )
        .orderBy("source")
    )


_TOKS_ALL = r"regexp_split_to_array(lower(trim(text)), '\s+')"
_EN_ALL = "['the','and','of','to','a','in','is','that']"
TOKEN_BUDGET_SQL = f"""
WITH feats0 AS (
  SELECT doc_id, source,
    CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_ALL}) END AS n_tokens,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS alpha_ratio,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS digit_ratio,
    len(list_filter({_TOKS_ALL}, t -> list_contains({_EN_ALL}, t))) AS en_hits
  FROM documents
), feats AS (
  SELECT doc_id, source, n_tokens,
    FLOOR((
      LEAST(n_tokens / 50.0, 1.0) * 0.3
      + alpha_ratio * 0.3
      + (1 - digit_ratio) * 0.2
      + LEAST((CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((en_hits::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 END) * 5.0, 1.0) * 0.2
    ) * 10000 + 0.5) / 10000 AS quality_score
  FROM feats0
), tot AS (SELECT SUM(n_tokens) AS total FROM feats),
cum AS (
  SELECT source, n_tokens, quality_score,
         SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM feats
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(quality_score) AS min_quality
FROM cum CROSS JOIN tot
WHERE cum_tokens <= total // 4
GROUP BY source ORDER BY source
"""


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-source weighted sample (A-ES priorities, weight =
    n_chars) — the balanced-mixture sampler. The rank window is
    partitioned by source, so no single-task funnel."""
    from degdb_spark.operators.sampling import stratified_weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_weighted_sample(
        docs, F.col("n_chars").cast("double"), k=20, stratum_col="source"
    )
    return out.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        "priority_key",
        "sample_rank",
    ).orderBy("source", "sample_rank")


STRATIFIED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         FLOOR((ln(GREATEST(
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR(64))), 1, 12)) AS BIGINT)::DOUBLE
               / 281474976710656.0, 1e-15)) / CAST(n_chars AS DOUBLE)) * 1000000000 + 0.5)
           / 1000000000 AS priority_key
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT source, doc_id, n_chars, priority_key,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY priority_key DESC, doc_id) AS sample_rank
  FROM keyed
)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight, priority_key, sample_rank
FROM ranked WHERE sample_rank <= 20 ORDER BY source, sample_rank
"""


def docs_source_quota_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-quota mixture rebalancing: every source gets the SAME
    token quota Q = (total_tokens DIV 4) DIV n_sources and fills it
    with its best documents (quality-ordered prefix per source) — the
    deterministic counterpart of temperature sampling when the mixture
    must hit exact per-source token targets. The cumulative sum is a
    window PARTITIONED by source (bounded source cardinality — no
    global two-phase machinery needed), quotas ride as one broadcast
    row. Reports the selected set per source."""
    from degdb_spark.operators.text import quality_features
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality_score",
    )
    totals = feats.agg(
        F.sum("n_tokens").alias("_total"),
        F.countDistinct("source").alias("_ns"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality_score").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = feats.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    sel = cum.crossJoin(F.broadcast(totals)).filter(
        F.col("cum_tokens") <= F.expr("(_total DIV 4) DIV _ns")
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("quality_score").alias("min_quality"),
        )
        .orderBy("source")
    )


SOURCE_QUOTA_SQL = f"""
WITH feats0 AS (
  SELECT doc_id, source,
    CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_ALL}) END AS n_tokens,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS alpha_ratio,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS digit_ratio,
    len(list_filter({_TOKS_ALL}, t -> list_contains({_EN_ALL}, t))) AS en_hits
  FROM documents
), feats AS (
  SELECT doc_id, source, n_tokens,
    FLOOR((
      LEAST(n_tokens / 50.0, 1.0) * 0.3
      + alpha_ratio * 0.3
      + (1 - digit_ratio) * 0.2
      + LEAST((CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((en_hits::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 END) * 5.0, 1.0) * 0.2
    ) * 10000 + 0.5) / 10000 AS quality_score
  FROM feats0
), tot AS (
  SELECT SUM(n_tokens) AS total, COUNT(DISTINCT source) AS ns FROM feats
), cum AS (
  SELECT source, n_tokens, quality_score,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality_score DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM feats
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(quality_score) AS min_quality
FROM cum CROSS JOIN tot
WHERE cum_tokens <= (total // 4) // ns
GROUP BY source ORDER BY source
"""


def docs_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-1 training-order shuffle
    (operators/sampling.epoch_shuffle): shard and within-shard
    position both derive from the portable md5('<epoch>:<id>') hash,
    so the full permutation — every shard assignment, every rank —
    replays in DuckDB and across restarts; a different epoch salts
    the hash into a decorrelated order (pytest-pinned). The window is
    PARTITIONED by shard (the per-shard sort real pipelines
    materialize), never global."""
    from degdb_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, epoch=1, n_shards=8).orderBy("shard", "pos")


EPOCH_SHUFFLE_SQL = """
WITH h AS (
  SELECT doc_id, md5('1:' || CAST(doc_id AS VARCHAR)) AS hh FROM documents
), s AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(hh, 1, 8)) AS BIGINT) % 8 AS BIGINT) AS shard,
         hh
  FROM h
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS BIGINT)
         AS pos
FROM s ORDER BY shard, pos
"""


QUERIES: dict[str, Query] = {
    "docs_epoch_shuffle": Query(docs_epoch_shuffle, EPOCH_SHUFFLE_SQL),
    "docs_weighted_sample": Query(docs_weighted_sample, WEIGHTED_SAMPLE_SQL),
    "docs_source_quota_selection": Query(
        docs_source_quota_selection, SOURCE_QUOTA_SQL
    ),
    "docs_token_budget_selection": Query(
        docs_token_budget_selection, TOKEN_BUDGET_SQL
    ),
    "docs_stratified_sample": Query(docs_stratified_sample, STRATIFIED_SAMPLE_SQL),
    "docs_train_test_split": Query(docs_train_test_split, SPLIT_SQL),
    "lineitem_sample_revenue": Query(lineitem_sample_revenue, SAMPLE_SQL),
    "docs_mixture_sample": Query(docs_mixture_sample, MIXTURE_SQL),
    "docs_temperature_mixture": Query(docs_temperature_mixture, TEMPERATURE_SQL),
}
