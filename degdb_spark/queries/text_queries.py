"""Text-analysis + dedup queries over `documents` — every query here is
oracle-checked, including the MinHash-LSH and SimHash banding pipelines:
their hashing is md5-derived (operators/dedup.py), so DuckDB replays the
exact signatures, band buckets, and Hamming balls, not just the Jaccard
verifier behind them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.operators import dedup as D
from degdb_spark.operators import text as X
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dround, dsum, sql_davg, sql_dsum
from degdb_spark.persistence import pin

# DuckDB-side token expression mirroring operators/text.tokens
_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            X.token_count("text").cast("long").alias("n_tokens"),
            X.bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
            F.length("text").cast("long").alias("n_chars_computed"),
        )
        .filter(F.col("doc_id") < 200)
        .orderBy("doc_id")
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       LENGTH(text) AS n_chars_computed
FROM documents WHERE doc_id < 200 ORDER BY doc_id
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        X.quality_features(docs)
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "alpha_ratio",
            "digit_ratio",
            "punct_ratio",
            "avg_token_len",
            "stopword_ratio",
            "quality_score",
        )
        .filter(F.col("doc_id") < 200)
        .orderBy("doc_id")
    )


_EN = "['the','and','of','to','a','in','is','that']"
QUALITY_SQL = f"""
WITH feats AS (
  SELECT doc_id,
    CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS alpha_ratio,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS digit_ratio,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS punct_ratio,
    len(list_filter({_TOKS}, t -> list_contains({_EN}, t))) AS en_hits,
    LENGTH(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_nonspace
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, n_tokens, alpha_ratio, digit_ratio, punct_ratio,
  CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((n_nonspace::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 END AS avg_token_len,
  CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((en_hits::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 END AS stopword_ratio,
  FLOOR((
    LEAST(n_tokens / 50.0, 1.0) * 0.3
    + alpha_ratio * 0.3
    + (1 - digit_ratio) * 0.2
    + LEAST((CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((en_hits::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 END) * 5.0, 1.0) * 0.2
  ) * 10000 + 0.5) / 10000 AS quality_score
FROM feats ORDER BY doc_id
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = X.predict_lang(docs)
    return (
        out.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def _lang_hits_sql() -> str:
    cols = []
    for lang, markers in X.LANG_MARKERS.items():
        lit = "[" + ",".join(f"'{m}'" for m in markers) + "]"
        cols.append(
            f"len(list_filter({_TOKS}, t -> list_contains({lit}, t))) AS hits_{lang}"
        )
    return ", ".join(cols)


LANG_ID_SQL = f"""
WITH hits AS (
  SELECT doc_id, lang, {_lang_hits_sql()} FROM documents
), best AS (
  SELECT doc_id, lang,
         GREATEST(hits_en, hits_de, hits_fr, hits_es, hits_zh) AS best,
         hits_en, hits_de, hits_fr, hits_es, hits_zh
  FROM hits
), pred AS (
  SELECT doc_id, lang,
    CASE WHEN best = 0 THEN 'und'
         WHEN hits_en = best THEN 'en'
         WHEN hits_de = best THEN 'de'
         WHEN hits_fr = best THEN 'fr'
         WHEN hits_es = best THEN 'es'
         WHEN hits_zh = best THEN 'zh'
         ELSE 'und' END AS pred_lang
  FROM best
)
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary: distinct fingerprints + kept representatives.
    (Data is dup-free, so this doubles as the fingerprint operator
    check — md5-of-normalized-text must agree byte-for-byte.)"""
    docs = load_table(spark, sf_dir, "documents")
    groups = D.exact_duplicates(docs)
    return (
        groups.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("group_size").alias("n_docs"),
            F.sum(F.when(F.col("group_size") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        )
    )


EXACT_DEDUP_SQL = """
WITH groups AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         COUNT(*) AS group_size
  FROM documents GROUP BY 1
)
SELECT COUNT(*) AS n_groups, CAST(SUM(group_size) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
FROM groups
"""


def substring_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact VARIABLE-LENGTH substring dedup (ExactSubstr, Lee et al.
    2022, arXiv:2107.06499 — operators/dedup.substring_dedup): every
    >= 20-token substring repeated anywhere in the corpus, at ANY
    offset/length (span_dedup only removes aligned fixed spans), is
    kept at its first (doc, position) occurrence and removed from
    every later one; documents are reassembled from surviving tokens.
    The report returns each document's token count, removed-token
    count, and the reassembled text, so the hash check pins the
    sliding-window fingerprinting, the global first-occurrence argmin,
    the interval-merge removal, AND positional reassembly. The oracle
    replays the same rule grouping windows by their TEXT — Spark's
    128-bit fingerprints stand in for the string only as shuffle keys
    (collision expectation ~1e-17 at 1e11 distinct windows)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.substring_dedup(docs, min_tokens=20).orderBy("doc_id")


SUBSTR_DEDUP_SQL = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), warr AS (
  SELECT doc_id,
         [array_to_string(toks[i+1:i+20], ' ')
          for i in range(0, len(toks) - 19)] AS wins
  FROM base WHERE len(toks) >= 20
), occ AS (
  SELECT doc_id, generate_subscripts(wins, 1) - 1 AS pos, unnest(wins) AS win
  FROM warr
), fr AS (
  SELECT win, MIN(ROW(doc_id, pos)) AS f FROM occ GROUP BY win
), nonwin AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN fr ON o.win = fr.win
  WHERE ROW(o.doc_id, o.pos) <> fr.f
), removed AS (
  SELECT DISTINCT n.doc_id, n.pos + g.x AS p
  FROM nonwin n, generate_series(0, 19) g(x)
), tokpos AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p, unnest(toks) AS tok
  FROM base
), surv AS (
  SELECT t.doc_id, t.p, t.tok
  FROM tokpos t LEFT JOIN removed r ON t.doc_id = r.doc_id AND t.p = r.p
  WHERE r.doc_id IS NULL
), agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS text_clean
  FROM surv GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.toks) AS BIGINT) AS n_tokens,
       CAST(len(b.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.text_clean, '') AS text_clean
FROM base b LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def substring_dup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplication PROFILE at the substring level: per source,
    how many tokens sit inside non-first occurrences of >= 20-token
    repeats (operators/dedup.substring_dedup) — the report a data team
    reads before deciding how hard to dedup each provider, the
    substring-granular sibling of docs_dup_rate_by_source. dup_ratio
    is removed/total as one identical double expression, 6-dp."""
    docs = load_table(spark, sf_dir, "documents")
    rep = D.substring_dedup(docs, min_tokens=20)
    return (
        rep.join(docs.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_removed").cast("long").alias("removed_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "removed_tokens",
            dround(
                F.col("removed_tokens") / F.col("total_tokens"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("source")
    )


SUBSTR_DUP_BY_SOURCE_SQL = r"""
WITH base AS (
  SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), warr AS (
  SELECT doc_id,
         [array_to_string(toks[i+1:i+20], ' ')
          for i in range(0, len(toks) - 19)] AS wins
  FROM base WHERE len(toks) >= 20
), occ AS (
  SELECT doc_id, generate_subscripts(wins, 1) - 1 AS pos, unnest(wins) AS win
  FROM warr
), fr AS (
  SELECT win, MIN(ROW(doc_id, pos)) AS f FROM occ GROUP BY win
), nonwin AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN fr ON o.win = fr.win
  WHERE ROW(o.doc_id, o.pos) <> fr.f
), removed AS (
  SELECT n.doc_id, COUNT(*) AS n_removed FROM (
    SELECT DISTINCT n.doc_id, n.pos + g.x AS p
    FROM nonwin n, generate_series(0, 19) g(x)
  ) n GROUP BY n.doc_id
), agg AS (
  SELECT b.source, b.doc_id, len(b.toks) AS n_tokens,
         COALESCE(r.n_removed, 0) AS n_removed
  FROM base b LEFT JOIN removed r USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_removed) AS BIGINT) AS removed_tokens,
       FLOOR((SUM(n_removed) / SUM(n_tokens)) * 1000000 + 0.5) / 1000000 AS dup_ratio
FROM agg GROUP BY source ORDER BY source
"""


def span_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span dedup (operators/dedup.span_dedup): every
    10-token span that repeats anywhere in the corpus survives only at
    its first (doc, position) occurrence, and documents are reassembled
    from their surviving spans — the rewrite-the-corpus dedup that
    strips cross-page boilerplate without dropping pages. The report
    returns each document's span count, surviving-span count, and the
    reassembled text itself, so the hash check pins slicing, the global
    argmin, AND order-preserving reassembly."""
    docs = load_table(spark, sf_dir, "documents")
    return D.span_dedup(docs, span_tokens=10).orderBy("doc_id")


SPAN_DEDUP_SQL = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), sarr AS (
  SELECT doc_id,
         [array_to_string(toks[(i-1)*10+1:i*10], ' ')
          for i in range(1, CAST(CEIL(len(toks) / 10.0) AS BIGINT) + 1)] AS spans
  FROM base
), occ AS (
  SELECT doc_id,
         generate_subscripts(spans, 1) - 1 AS span_idx,
         unnest(spans) AS span
  FROM sarr
), first AS (
  SELECT span, MIN(ROW(doc_id, span_idx)) AS f FROM occ GROUP BY span
), kept AS (
  SELECT o.doc_id, COUNT(*) AS n_kept,
         string_agg(o.span, ' ' ORDER BY o.span_idx) AS text_clean
  FROM occ o JOIN first fr ON o.span = fr.span
  WHERE ROW(o.doc_id, o.span_idx) = fr.f
  GROUP BY o.doc_id
)
SELECT b.doc_id,
       CAST(len(b.spans) AS BIGINT) AS n_spans,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(k.text_clean, '') AS text_clean
FROM sarr b LEFT JOIN kept k USING (doc_id)
ORDER BY doc_id
"""


def _two_para_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus has no newlines, so paragraph-granularity
    queries derive a two-paragraph view both engines construct
    identically: doc d's text becomes its own text + its DECADE
    LEADER's ((d DIV 10)*10) text, newline-joined — every decade
    leader's paragraph then repeats across its 10 docs (the planted
    boilerplate paragraph), and paragraph dedup must keep exactly the
    (leader, 0)-or-earlier first occurrence. Deterministic from the
    real table — the contract-query analogue of the media fixtures'
    closed-form answers."""
    docs = load_table(spark, sf_dir, "documents")
    leader = docs.select(
        F.col("doc_id").alias("_lid"), F.col("text").alias("_ltext")
    )
    return (
        docs.withColumn("_lid", F.expr("(doc_id DIV 10) * 10"))
        .join(leader, on="_lid")
        .select(
            "doc_id",
            "source",
            F.concat_ws("\n", "text", "_ltext").alias("text"),
        )
    )


_PARA_DERIVED_SQL = r"""derived AS (
  SELECT a.doc_id, a.source, a.text || chr(10) || b.text AS text
  FROM documents a JOIN documents b ON b.doc_id = (a.doc_id // 10) * 10
), sarr AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(text, '\n+'), p -> trim(p) <> '') AS paras
  FROM derived
), occ0 AS (
  SELECT doc_id, generate_subscripts(paras, 1) - 1 AS idx, unnest(paras) AS para
  FROM sarr
), occ AS (
  SELECT doc_id, idx, para,
         trim(regexp_replace(regexp_replace(regexp_replace(
           lower(para), '\d', '0', 'g'), '[^\w\s]', ' ', 'g'), '\s+', ' ', 'g'))
           AS norm
  FROM occ0
), fr AS (
  SELECT norm, MIN(ROW(doc_id, idx)) AS f FROM occ GROUP BY norm
), kept AS (
  SELECT o.doc_id, COUNT(*) AS n_kept,
         string_agg(o.para, chr(10) ORDER BY o.idx) AS text_clean
  FROM occ o JOIN fr ON o.norm = fr.norm
  WHERE ROW(o.doc_id, o.idx) = fr.f
  GROUP BY o.doc_id
)"""


def paragraph_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup (operators/dedup.paragraph_dedup —
    Wenzek et al. §3.1) over the derived two-paragraph corpus
    (_two_para_corpus): every normalized paragraph survives only at
    its first (doc, position) occurrence and documents are reassembled
    from their surviving raw paragraphs. The hash check pins the
    structural split, the CCNet normalization equivalence, the global
    min-struct argmin, AND the newline-joined reassembly."""
    derived = _two_para_corpus(spark, sf_dir)
    return D.paragraph_dedup(derived).orderBy("doc_id")


PARAGRAPH_DEDUP_SQL = (
    "WITH " + _PARA_DERIVED_SQL + r"""
SELECT s.doc_id,
       CAST(len(s.paras) AS BIGINT) AS n_paras,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(k.text_clean, '') AS text_clean
FROM sarr s LEFT JOIN kept k USING (doc_id)
ORDER BY doc_id
"""
)


def paragraph_dup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source paragraph-duplication profile — the curation
    dashboard's paragraph-granularity rollup (the docs_substring
    _dup_by_source twin): which sources carry the boilerplate. Ratio
    is the one-division FLOOR discipline (queries/rounding.py)."""
    derived = _two_para_corpus(spark, sf_dir)
    rep = D.paragraph_dedup(derived).join(
        derived.select("doc_id", "source"), on="doc_id"
    )
    return (
        rep.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_paras").cast("long").alias("total_paras"),
            F.sum(F.col("n_paras") - F.col("n_kept")).cast("long").alias(
                "removed_paras"
            ),
        )
        .select(
            "source",
            "n_docs",
            "total_paras",
            "removed_paras",
            dround(F.col("removed_paras") / F.col("total_paras"), 6).alias(
                "dup_ratio"
            ),
        )
        .orderBy("source")
    )


PARAGRAPH_DUP_BY_SOURCE_SQL = (
    "WITH " + _PARA_DERIVED_SQL + r""", agg AS (
  SELECT s.doc_id, s.source, len(s.paras) AS n_paras,
         COALESCE(k.n_kept, 0) AS n_kept
  FROM sarr s LEFT JOIN kept k USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_paras) AS BIGINT) AS total_paras,
       CAST(SUM(n_paras - n_kept) AS BIGINT) AS removed_paras,
       FLOOR((SUM(n_paras - n_kept) / SUM(n_paras)) * 1000000 + 0.5) / 1000000
         AS dup_ratio
FROM agg GROUP BY source ORDER BY source
"""
)


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", X.fingerprint("text").alias("fp"))
        .filter(F.col("doc_id") < 100)
        .orderBy("doc_id")
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents WHERE doc_id < 100 ORDER BY doc_id
"""


def ngram_jaccard_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over a bounded pair set (doc_id < 80) —
    the oracle-checkable verifier behind the LSH stages."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    return D.ngram_jaccard_pairs(docs, threshold=0.4).orderBy("id_a", "id_b")


JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_distinct({_TOKS}) AS tokset
  FROM documents WHERE doc_id < 80
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.tokset, b.tokset)) AS n_inter,
         len(list_distinct(list_concat(a.tokset, b.tokset))) AS n_union
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       FLOOR((CASE WHEN n_union = 0 THEN 0.0 ELSE n_inter::DOUBLE / n_union END) * 10000 + 0.5) / 10000 AS jaccard
FROM pairs
WHERE FLOOR((CASE WHEN n_union = 0 THEN 0.0 ELSE n_inter::DOUBLE / n_union END) * 10000 + 0.5) / 10000 >= 0.4
ORDER BY id_a, id_b
"""


def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering on a bounded slice: exact-Jaccard
    pairs (≥0.4) → transitive components (HashMin) → min-id keep policy.
    Fully oracle-checked — the DuckDB side replays the fixpoint with a
    recursive CTE (min label over reachability)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.4)
    return D.dedup_clusters(docs, pairs).orderBy("doc_id")


# Shared CTE prefix: the same bounded pair set as JACCARD_SQL, then the
# undirected edge list and the min-label closure. UNION (not UNION ALL)
# dedups the recursive frontier so the CTE terminates.
_CLUSTER_CTE = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_distinct({_TOKS}) AS tokset
  FROM documents WHERE doc_id < 80
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
  WHERE FLOOR((CASE WHEN len(list_distinct(list_concat(a.tokset, b.tokset))) = 0 THEN 0.0
               ELSE len(list_intersect(a.tokset, b.tokset))::DOUBLE
                    / len(list_distinct(list_concat(a.tokset, b.tokset))) END) * 10000 + 0.5) / 10000 >= 0.4
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 80
), reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id
), clusters AS (
  SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
)
"""

DEDUP_CLUSTERS_SQL = (
    _CLUSTER_CTE
    + """
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS kept
FROM clusters ORDER BY doc_id
"""
)


def neardup_kept_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level outcome of the near-dedup pass: how many docs
    survive the keep-one-per-cluster policy."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.4)
    kept = D.near_dedup(docs, pairs)
    clusters = D.dedup_clusters(docs, pairs)
    n_multi = (
        clusters.filter(F.col("cluster_size") > 1)
        .select("cluster_id")
        .distinct()
        .count()
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.lit(n_multi).cast("long").alias("n_multi_clusters"),
    )


NEARDUP_KEPT_SQL = (
    _CLUSTER_CTE
    + """
, sized AS (
  SELECT doc_id, cluster_id,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM clusters
)
SELECT CAST(SUM(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COUNT(DISTINCT CASE WHEN cluster_size > 1 THEN cluster_id END) AS BIGINT) AS n_multi_clusters
FROM sized
"""
)


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality score: per-doc mean unigram log-prob
    under the corpus's own unigram distribution — the deterministic
    stand-in for LM-perplexity filtering (CCNet ranks docs by LM score;
    a unigram model is the order-0 version and needs no external
    artifact, so it stays engine-replayable). Low avg_lp ≈ rare-token
    soup (gibberish/boilerplate id strings), high ≈ stopword-heavy.

    Shape at 100 TB: one token-count aggregation (map-side combined),
    one token-keyed join of the exploded corpus against the count table
    (AQE broadcasts it when the vocab is small), one per-doc
    aggregation. Per-token log-probs are FLOOR-rounded to 6 dp before
    the order-independent decimal sum (rounding.py discipline), so the
    oracle matches bit-for-bit despite float summation order."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_t"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    lp = (
        tok.join(counts, on="token")
        .crossJoin(F.broadcast(total))
        .withColumn("lp", dround(F.log(F.col("n_t") / F.col("n_total")), 6))
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            dsum(F.col("lp"), 6, out_dp=6).alias("sum_lp"),
        )
        .withColumn("avg_lp", dround(F.col("sum_lp") / F.col("n_tokens"), 6))
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), counts AS (
  SELECT token, COUNT(*) AS n_t FROM tok GROUP BY token
), total AS (
  SELECT COUNT(*) AS n_total FROM tok
), lp AS (
  SELECT doc_id,
         FLOOR(ln(n_t::DOUBLE / n_total) * 1000000 + 0.5) / 1000000 AS lp
  FROM tok JOIN counts USING (token) CROSS JOIN total
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         {sql_dsum('lp', 6, out_dp=6)} AS sum_lp
  FROM lp GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_lp,
       FLOOR((sum_lp / n_tokens) * 1000000 + 0.5) / 1000000 AS avg_lp
FROM agg ORDER BY doc_id
"""


_LAMBDA = 0.7


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-1 LM quality score: per-doc mean interpolated bigram
    log-prob, lp(i) = ln(λ·c₂(w₋₁,w)/c₁(w₋₁) + (1−λ)·c₁(w)/N) with
    λ=0.7 — the next rung above docs_unigram_logprob on the CCNet-style
    perplexity-filter ladder, still entirely corpus-derived (no
    external model artifact, so the oracle replays it).

    Shape at 100 TB: positions via posexplode; bigrams form by joining
    the token stream to itself on (doc_id, pos−1) — co-partitioned
    after one doc_id-keyed exchange; count tables are token-keyed
    aggregations AQE broadcasts when the vocab is small. The token
    stream is CHECKPOINTED: five consumers (c1 twice, c2, total, both
    bigram sides) otherwise each replan the scan+tokenize — 7 corpus
    passes measured via tools/scan_audit.py; one materialization buys
    them all. Per-position log-probs FLOOR-round to 6 dp before the
    order-independent decimal sum (rounding.py)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(X.tokens("text")).alias("pos", "token")
    ).transform(pin)
    c1 = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    prev = tok.select(
        "doc_id", (F.col("pos") + 1).alias("pos"), F.col("token").alias("prev")
    )
    big = tok.join(prev, on=["doc_id", "pos"])
    c2 = big.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        big.join(c2, on=["prev", "token"])
        .join(c1.withColumnRenamed("token", "prev").withColumnRenamed("c1", "c_prev"), on="prev")
        .join(c1, on="token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lp",
            dround(
                F.log(
                    F.lit(_LAMBDA) * (F.col("c2") / F.col("c_prev"))
                    + F.lit(1.0 - _LAMBDA) * (F.col("c1") / F.col("n_total"))
                ),
                6,
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            dsum(F.col("lp"), 6, out_dp=6).alias("sum_lp"),
        )
        .withColumn("avg_lp", dround(F.col("sum_lp") / F.col("n_bigrams"), 6))
        .orderBy("doc_id")
    )


BIGRAM_LOGPROB_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({_TOKS}) AS token,
         generate_subscripts({_TOKS}, 1) - 1 AS pos
  FROM documents
), c1 AS (
  SELECT token, COUNT(*) AS c1 FROM tok GROUP BY token
), total AS (
  SELECT COUNT(*) AS n_total FROM tok
), big AS (
  SELECT t.doc_id, t.pos, p.token AS prev, t.token
  FROM tok t JOIN tok p ON t.doc_id = p.doc_id AND t.pos = p.pos + 1
), c2 AS (
  SELECT prev, token, COUNT(*) AS c2 FROM big GROUP BY prev, token
), scored AS (
  SELECT big.doc_id,
         FLOOR(ln({_LAMBDA} * (c2.c2::DOUBLE / cp.c1)
                  + {1.0 - _LAMBDA} * (c1.c1::DOUBLE / total.n_total))
               * 1000000 + 0.5) / 1000000 AS lp
  FROM big
  JOIN c2 ON big.prev = c2.prev AND big.token = c2.token
  JOIN c1 cp ON big.prev = cp.token
  JOIN c1 ON big.token = c1.token
  CROSS JOIN total
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         {sql_dsum('lp', 6, out_dp=6)} AS sum_lp
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, sum_lp,
       FLOOR((sum_lp / n_bigrams) * 1000000 + 0.5) / 1000000 AS avg_lp
FROM agg ORDER BY doc_id
"""


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/test split: the split key is the near-dup
    CLUSTER id, not the doc id, so near-duplicates can never straddle
    train and test — the leakage mode a doc-keyed split has (a test doc
    whose near-copy sits in train). Composes the transitive-cluster
    pass with the portable md5-bucket split (operators/sampling.py);
    straddle-freedom holds by construction because every member of a
    cluster hashes the same key. At 100 TB the split is one expression
    over the cluster assignment — no extra shuffle beyond the
    clustering itself. Reports per-split doc/cluster counts and how
    many docs sit in multi-doc (near-dup) clusters."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.4)
    clusters = D.dedup_clusters(docs, pairs)
    from degdb_spark.operators.sampling import md5_bucket

    split = F.when(md5_bucket("cluster_id", 100) < 20, "test").otherwise("train")
    return (
        clusters.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum((F.col("cluster_size") > 1).cast("long")).alias("n_neardup_docs"),
        )
        .orderBy("split")
    )


LEAKAGE_SPLIT_SQL = (
    _CLUSTER_CTE
    + """
, sized AS (
  SELECT doc_id, cluster_id,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM clusters
)
SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR(64))), 1, 8)) AS BIGINT) % 100 < 20
            THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_docs
FROM sized GROUP BY split ORDER BY split
"""
)


def minhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard. Fully
    oracle-checked: the md5 double-hash slots, band buckets, and verifier
    all replay in DuckDB (MINHASH_SQL)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_lsh_candidates(docs)
    return D.ngram_jaccard_pairs(docs, candidates=cands, threshold=0.4).orderBy(
        "id_a", "id_b"
    )


# Exact DuckDB replay of the banded-LSH pipeline: same shingles, same
# md5 halves (h1: hex 1-15, h2: hex 17-30), same slot family
# h1 + i*h2, same maxlong default for shingle-less docs, same
# md5-of-joined-minima band key, same Jaccard verification.
#: Shared CTE chain for the banded-LSH pipeline (toks -> shingles ->
#: md5 double-hash slots -> band buckets -> candidate pairs -> exact
#: Jaccard) — consumed by MINHASH_SQL and DUP_RATE_SQL.
_MINHASH_CTES = f"""toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5
              THEN list_transform(range(1, len(t) - 5 + 2),
                                  i -> array_to_string(t[i:i+4], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), hp AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(s), 17, 14)) AS BIGINT) AS h2
  FROM ex
), slotmin AS (
  SELECT doc_id, r.i AS i, MIN(h1 + r.i * h2) AS mh
  FROM hp CROSS JOIN range(32) AS r(i)
  GROUP BY doc_id, r.i
), sig AS (
  SELECT d.doc_id, r.i AS i, COALESCE(sm.mh, 9223372036854775807) AS mh
  FROM (SELECT doc_id FROM toks) d
  CROSS JOIN range(32) AS r(i)
  LEFT JOIN slotmin sm ON sm.doc_id = d.doc_id AND sm.i = r.i
), bands AS (
  SELECT doc_id, i // 4 AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS band_hash
  FROM sig GROUP BY doc_id, i // 4
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), tsets AS (
  SELECT doc_id, list_distinct(t) AS tokset FROM toks
), pairs AS (
  SELECT id_a, id_b,
         len(list_intersect(x.tokset, y.tokset)) AS n_inter,
         len(list_distinct(list_concat(x.tokset, y.tokset))) AS n_union
  FROM cand
  JOIN tsets x ON x.doc_id = cand.id_a
  JOIN tsets y ON y.doc_id = cand.id_b
), verified AS (
  SELECT id_a, id_b,
         FLOOR((CASE WHEN n_union = 0 THEN 0.0 ELSE n_inter::DOUBLE / n_union END) * 10000 + 0.5) / 10000 AS jaccard
  FROM pairs
  WHERE FLOOR((CASE WHEN n_union = 0 THEN 0.0 ELSE n_inter::DOUBLE / n_union END) * 10000 + 0.5) / 10000 >= 0.4
)"""

MINHASH_SQL = f"""
WITH {_MINHASH_CTES}
SELECT id_a, id_b, jaccard FROM verified ORDER BY id_a, id_b
"""


def quality_vs_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup rate per quality-score QUARTILE — the cross of the two
    core curation signals (low-quality text is usually the most
    duplicated; this query is how you verify that on YOUR corpus
    before ordering the pipeline's stages). Quartile boundaries are
    exact percentiles riding as one broadcast row; the dup flag comes
    from the verified MinHash pipeline."""
    from degdb_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs).select("doc_id", "quality_score")
    bounds = feats.agg(
        *[
            dround(
                F.element_at(
                    F.expr("percentile(quality_score, array(0.25, 0.5, 0.75))"),
                    i + 1,
                ),
                6,
            ).alias(f"_q{i}")
            for i in range(3)
        ]
    )
    cands = D.minhash_lsh_candidates(docs)
    # ONE pass over the verified pairs via endpoint explode (see
    # dup_rate_by_source) — no checkpoint, pipeline plans once
    pairs = D.ngram_jaccard_pairs(docs, candidates=cands, threshold=0.4)
    dup_ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    quart = (
        sum((F.col("quality_score") > F.col(f"_q{i}")).cast("int") for i in range(3))
        + 1
    )
    return (
        feats.crossJoin(F.broadcast(bounds))
        .join(dup_ids, on="doc_id", how="left")
        .select(quart.alias("quality_quartile"), F.coalesce("_dup", F.lit(0)).alias("d"))
        .groupBy("quality_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("d").cast("long").alias("n_neardup_docs"),
            dround(F.sum("d") / F.count(F.lit(1)), 4).alias("dup_rate"),
        )
        .orderBy("quality_quartile")
    )


_QUALITY_SCORE_EXPR = """
  FLOOR((
    LEAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END) / 50.0, 1.0) * 0.3
    + (CASE WHEN LENGTH(text) = 0 THEN 0.0
            ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END) * 0.3
    + (1 - (CASE WHEN LENGTH(text) = 0 THEN 0.0
                 ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END)) * 0.2
    + LEAST((CASE WHEN (CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END) = 0 THEN 0.0
                  ELSE FLOOR((len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> list_contains(['the','and','of','to','a','in','is','that'], t)))::DOUBLE
                             / (CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END)) * 10000 + 0.5) / 10000 END) * 5.0, 1.0) * 0.2
  ) * 10000 + 0.5) / 10000
""".strip()

QUALITY_VS_DUP_SQL = f"""
WITH {_MINHASH_CTES},
dup_ids AS (
  SELECT id_a AS doc_id FROM verified UNION SELECT id_b FROM verified
), feats AS (
  SELECT doc_id, {_QUALITY_SCORE_EXPR} AS quality_score FROM documents
), bounds AS (
  SELECT FLOOR(quantile_cont(quality_score, 0.25) * 1000000 + 0.5) / 1000000 AS q0,
         FLOOR(quantile_cont(quality_score, 0.5)  * 1000000 + 0.5) / 1000000 AS q1,
         FLOOR(quantile_cont(quality_score, 0.75) * 1000000 + 0.5) / 1000000 AS q2
  FROM feats
)
SELECT (CASE WHEN quality_score > q0 THEN 1 ELSE 0 END
        + CASE WHEN quality_score > q1 THEN 1 ELSE 0 END
        + CASE WHEN quality_score > q2 THEN 1 ELSE 0 END + 1) AS quality_quartile,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN di.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_docs,
       FLOOR((SUM(CASE WHEN di.doc_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)) * 10000 + 0.5) / 10000 AS dup_rate
FROM feats f CROSS JOIN bounds LEFT JOIN dup_ids di ON f.doc_id = di.doc_id
GROUP BY 1 ORDER BY quality_quartile
"""


def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate rate per source — the curation dashboard number
    that decides which crawl gets re-filtered first. Runs the full
    verified MinHash pipeline, flags every doc touching a >=0.4 pair,
    and rolls the flag up by source (one broadcast-sized dup-id set
    joined back to the corpus attributes)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_lsh_candidates(docs)
    # ONE pass over the verified pairs: exploding both endpoints reads
    # the minhash+verify pipeline once (a union of two selects plans it
    # twice; an eager checkpoint bills a serial materialization job —
    # both measured slower at sf0.1)
    pairs = D.ngram_jaccard_pairs(docs, candidates=cands, threshold=0.4)
    dup_ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    flagged = docs.select("doc_id", "source").join(dup_ids, on="doc_id", how="left")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("_dup", F.lit(0))).cast("long").alias("n_neardup_docs"),
        )
        .withColumn(
            "dup_rate",
            dround(F.col("n_neardup_docs") / F.col("n_docs"), 4),
        )
        .orderBy("source")
    )


DUP_RATE_SQL = f"""
WITH {_MINHASH_CTES},
dup_ids AS (
  SELECT id_a AS doc_id FROM verified UNION SELECT id_b FROM verified
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN di.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_docs,
       FLOOR((SUM(CASE WHEN di.doc_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)) * 10000 + 0.5) / 10000 AS dup_rate
FROM documents d LEFT JOIN dup_ids di ON d.doc_id = di.doc_id
GROUP BY d.source ORDER BY d.source
"""


def lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality monitoring: confusion counts of the banded
    MinHash candidate generator against exact token-set Jaccard ≥ 0.4
    ground truth (bounded doc_id < 80 slice) — tp/fp/fn plus
    precision/recall. This is the recurring health check a production
    dedup pipeline runs after any shingle/band parameter change: recall
    must hold (banding theory gives the s-curve) while fp stays
    join-affordable. One full-outer join of two already-bounded pair
    sets; both inputs replay in SQL, so the whole calibration does."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    cands = D.minhash_lsh_candidates(docs).withColumn("c", F.lit(1))
    truth = (
        D.ngram_jaccard_pairs(docs, threshold=0.4)
        .select("id_a", "id_b")
        .withColumn("t", F.lit(1))
    )
    j = cands.join(truth, ["id_a", "id_b"], how="full_outer")
    agg = j.agg(
        F.count("c").alias("n_candidates"),
        F.count("t").alias("n_truth"),
        F.count(F.when(F.col("c").isNotNull() & F.col("t").isNotNull(), 1)).alias("tp"),
    )
    return agg.select(
        "n_candidates",
        "n_truth",
        "tp",
        (F.col("n_candidates") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        dround(
            F.col("tp") / F.when(F.col("n_candidates") > 0, F.col("n_candidates")), 4
        ).alias("precision"),
        dround(F.col("tp") / F.when(F.col("n_truth") > 0, F.col("n_truth")), 4).alias(
            "recall"
        ),
    )


LSH_CALIBRATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 80
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5
              THEN list_transform(range(1, len(t) - 5 + 2),
                                  i -> array_to_string(t[i:i+4], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), hp AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(s), 17, 14)) AS BIGINT) AS h2
  FROM ex
), slotmin AS (
  SELECT doc_id, r.i AS i, MIN(h1 + r.i * h2) AS mh
  FROM hp CROSS JOIN range(32) AS r(i)
  GROUP BY doc_id, r.i
), sig AS (
  SELECT d.doc_id, r.i AS i, COALESCE(sm.mh, 9223372036854775807) AS mh
  FROM (SELECT doc_id FROM toks) d
  CROSS JOIN range(32) AS r(i)
  LEFT JOIN slotmin sm ON sm.doc_id = d.doc_id AND sm.i = r.i
), bands AS (
  SELECT doc_id, i // 4 AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS band_hash
  FROM sig GROUP BY doc_id, i // 4
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), tsets AS (
  SELECT doc_id, list_distinct(t) AS tokset FROM toks
), truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM tsets a JOIN tsets b ON a.doc_id < b.doc_id
  WHERE FLOOR((CASE WHEN len(list_distinct(list_concat(a.tokset, b.tokset))) = 0
                    THEN 0.0
                    ELSE len(list_intersect(a.tokset, b.tokset))::DOUBLE
                         / len(list_distinct(list_concat(a.tokset, b.tokset))) END)
              * 10000 + 0.5) / 10000 >= 0.4
), j AS (
  SELECT COALESCE(c.id_a, t.id_a) AS id_a,
         CASE WHEN c.id_a IS NOT NULL THEN 1 END AS c,
         CASE WHEN t.id_a IS NOT NULL THEN 1 END AS t
  FROM cand c FULL OUTER JOIN truth t
    ON c.id_a = t.id_a AND c.id_b = t.id_b
), agg AS (
  SELECT COUNT(c) AS n_candidates, COUNT(t) AS n_truth,
         COUNT(CASE WHEN c IS NOT NULL AND t IS NOT NULL THEN 1 END) AS tp
  FROM j
)
SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(tp AS BIGINT) AS tp,
       CAST(n_candidates - tp AS BIGINT) AS fp,
       CAST(n_truth - tp AS BIGINT) AS fn,
       CASE WHEN n_candidates = 0 THEN NULL
            ELSE FLOOR((CAST(tp AS DOUBLE) / n_candidates) * 10000 + 0.5) / 10000
       END AS precision,
       CASE WHEN n_truth = 0 THEN NULL
            ELSE FLOOR((CAST(tp AS DOUBLE) / n_truth) * 10000 + 0.5) / 10000
       END AS recall
FROM agg
"""


def simhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 near-dup pairs. Fully oracle-checked: the
    60-bit md5 token hashes, bit votes, 4×15-bit block banding, and
    Hamming filter all replay in DuckDB (SIMHASH_SQL)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs).orderBy("id_a", "id_b")


# Exact DuckDB replay of the SimHash pipeline: same 60-bit token hash,
# same ±1 bit votes (ties → 0 bit), same block banding, same Hamming
# verification via bit_count(xor).
SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), ex AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), th AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM ex
), votes AS (
  SELECT doc_id, r.j AS j,
         SUM(CASE WHEN (h >> r.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN range(60) AS r(j)
  GROUP BY doc_id, r.j
), fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
), blocks AS (
  SELECT doc_id, simhash, r.b AS b, (simhash >> (r.b * 15)) & 32767 AS bv
  FROM fp CROSS JOIN range(4) AS r(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         a.simhash AS sa, c.simhash AS sc
  FROM blocks a JOIN blocks c
    ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sc)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sc)) <= 3
ORDER BY id_a, id_b
"""


def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        X.repetition_features(docs)
        .select("doc_id", "dup_2gram_ratio", "dup_3gram_ratio", "top_2gram_share")
        .orderBy("doc_id")
    )


REPETITION_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 200
), g AS (
  SELECT doc_id,
    list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1]) AS g2,
    list_transform(generate_series(1, len(toks) - 2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
  FROM t
)
SELECT doc_id,
  CASE WHEN len(g2) <= 0 THEN 0.0
       ELSE FLOOR((1 - len(list_distinct(g2))::DOUBLE / len(g2)) * 10000 + 0.5) / 10000 END AS dup_2gram_ratio,
  CASE WHEN len(g3) <= 0 THEN 0.0
       ELSE FLOOR((1 - len(list_distinct(g3))::DOUBLE / len(g3)) * 10000 + 0.5) / 10000 END AS dup_3gram_ratio,
  CASE WHEN len(g2) <= 0 THEN 0.0
       ELSE FLOOR((list_max(list_transform(list_distinct(g2), d -> len(list_filter(g2, x -> x = d))))::DOUBLE / len(g2)) * 10000 + 0.5) / 10000 END AS top_2gram_share
FROM g ORDER BY doc_id
"""


def filter_rules_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher rule-gate flags per document (operators/text.py
    FILTER_RULES thresholds)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        X.filter_rules(docs)
        .select(
            "doc_id",
            "rule_word_count",
            "rule_mean_word_len",
            "rule_symbol_ratio",
            "rule_dup_2gram",
            "rule_stopwords",
            "passes_all",
        )
        .orderBy("doc_id")
    )


FILTER_RULES_SQL = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents WHERE doc_id < 200
), feats AS (
  SELECT doc_id,
    CASE WHEN trim(text) = '' THEN 0 ELSE len(toks) END AS n_tokens,
    CASE WHEN LENGTH(text) = 0 THEN 0.0
         ELSE FLOOR(((LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / LENGTH(text)) * 10000 + 0.5) / 10000 END AS punct_ratio,
    len(list_filter(toks, t -> list_contains({_EN}, t))) AS en_hits,
    LENGTH(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_nonspace,
    list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1]) AS g2
  FROM t
), derived AS (
  SELECT doc_id, n_tokens, punct_ratio,
    CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((n_nonspace::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 END AS avg_token_len,
    CASE WHEN n_tokens = 0 THEN 0.0 ELSE FLOOR((en_hits::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 END AS stopword_ratio,
    CASE WHEN len(g2) <= 0 THEN 0.0
         ELSE FLOOR((1 - len(list_distinct(g2))::DOUBLE / len(g2)) * 10000 + 0.5) / 10000 END AS dup_2gram_ratio
  FROM feats
)
SELECT doc_id,
  n_tokens BETWEEN 10 AND 10000 AS rule_word_count,
  avg_token_len >= 2.0 AND avg_token_len <= 12.0 AS rule_mean_word_len,
  punct_ratio <= 0.3 AS rule_symbol_ratio,
  dup_2gram_ratio <= 0.5 AS rule_dup_2gram,
  stopword_ratio >= 0.01 AS rule_stopwords,
  (n_tokens BETWEEN 10 AND 10000) AND (avg_token_len >= 2.0 AND avg_token_len <= 12.0)
    AND punct_ratio <= 0.3 AND dup_2gram_ratio <= 0.5 AND stopword_ratio >= 0.01 AS passes_all
FROM derived ORDER BY doc_id
"""


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-100 tokens by document frequency with
    IDF weights (ties break on token)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        X.doc_frequency(docs)
        .orderBy(F.col("df_count").desc(), "token")
        .limit(100)
    )


VOCAB_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents
), df AS (
  SELECT token, COUNT(*) AS df_count FROM toks GROUP BY token
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
)
SELECT token, df_count,
       FLOOR(ln(n_docs::DOUBLE / df_count) * 1000000 + 0.5) / 1000000 AS idf
FROM df, n
ORDER BY df_count DESC, token LIMIT 100
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms over the doc_id<50 slice: term
    frequency × ln(N/df), ranked on the rounded score (cross-engine
    stable ordering), ties on token."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    doc_tot = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_total"))
    dfreq = (
        tok.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_count"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        tf.join(doc_tot, on="doc_id")
        .join(dfreq, on="token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            dround(
                (F.col("cnt") / F.col("doc_total"))
                * F.log(F.col("_n_docs") / F.col("df_count")),
                6,
            ),
        )
        .withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "token", "tfidf", "term_rank")
        .orderBy("doc_id", "term_rank")
    )


TFIDF_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 50
), tok AS (
  SELECT doc_id, unnest(toks) AS token FROM base
), tf AS (
  SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY doc_id, token
), tot AS (
  SELECT doc_id, COUNT(*) AS doc_total FROM tok GROUP BY doc_id
), dfreq AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df_count FROM tok GROUP BY token
), n AS (
  SELECT COUNT(*) AS n_docs FROM base
), scored AS (
  SELECT tf.doc_id, tf.token,
         FLOOR(((tf.cnt::DOUBLE / tot.doc_total) * ln(n.n_docs::DOUBLE / dfreq.df_count)) * 1000000 + 0.5) / 1000000 AS tfidf
  FROM tf JOIN tot ON tf.doc_id = tot.doc_id
          JOIN dfreq ON tf.token = dfreq.token
          CROSS JOIN n
), ranked AS (
  SELECT doc_id, token, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS term_rank
  FROM scored
)
SELECT doc_id, token, tfidf, term_rank FROM ranked
WHERE term_rank <= 3 ORDER BY doc_id, term_rank
"""


def packing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing placements (operators/
    packing.py two-phase scan), 256-token windows."""
    from degdb_spark.operators.packing import pack_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return pack_documents(docs, budget=256).orderBy("doc_id")


PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id < 300
), c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // 256 AS pack_id,
       n_tokens > 0 AND (start_offset // 256) <> ((start_offset + GREATEST(n_tokens - 1, 0)) // 256) AS crosses_boundary
FROM c ORDER BY doc_id
"""


def bestfit_packing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-preserving best-fit packing placements (operators/
    packing.pack_bestfit — harmonic length classes, VERDICT r12
    "What's missing" #1): every 256-token-or-smaller document keeps
    one (pack_id, pack_slot) bin placement, never split; oversize
    docs are flagged. The oracle replays the class assignment, the
    hash-ordered within-class decreasing rank, the per-class bin
    counts, and the ascending-class pack_id layout."""
    from degdb_spark.operators.packing import pack_bestfit

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return pack_bestfit(docs, budget=256).orderBy("doc_id")


BESTFIT_PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id < 300
), p AS (
  SELECT doc_id, n_tokens, CAST(256 // n_tokens AS BIGINT) AS len_class,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM t WHERE n_tokens > 0
), rk AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY len_class ORDER BY n_tokens DESC, h, doc_id) AS rank
  FROM p
), cb AS (
  SELECT len_class,
         (COUNT(*) + GREATEST(len_class, 1) - 1) // GREATEST(len_class, 1) AS nbins
  FROM p GROUP BY len_class
), os AS (
  SELECT len_class,
         COALESCE(SUM(nbins) OVER (ORDER BY len_class
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM cb
)
SELECT r.doc_id, r.n_tokens, r.len_class,
       CAST(o.off + (r.rank - 1) // GREATEST(r.len_class, 1) AS BIGINT) AS pack_id,
       CAST((r.rank - 1) % GREATEST(r.len_class, 1) AS BIGINT) AS pack_slot,
       r.len_class = 0 AS oversize
FROM rk r JOIN os o USING (len_class)
ORDER BY doc_id
"""


def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report, BOTH strategies side by side
    (extended r13 per Ding et al. 2024): the 256-token concat-and-
    chunk run (window count, fill, boundary-crossing docs — its
    truncation workload) against document-preserving best-fit
    (bin count, fill over regular bins, oversize docs — ITS entire
    truncation workload, zero split docs by construction). The
    number a data-engineering team watches when picking a packer:
    concat fills ~100% but truncates every straddling doc; best-fit
    truncates nothing that fits a window, at a bounded fill cost."""
    from degdb_spark.operators.packing import pack_bestfit, pack_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    packed = pack_documents(docs, budget=256)
    agg = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.col("crosses_boundary").cast("int"))
        .cast("long")
        .alias("n_crossing_docs"),
    )
    bf = pack_bestfit(docs, budget=256)
    # bins are contiguous 0..max — counts are closed-form aggregates
    bfa = bf.agg(
        (F.max("pack_id") + 1).cast("long").alias("bestfit_bins"),
        F.sum(F.col("oversize").cast("int")).cast("long").alias(
            "bestfit_oversize_docs"
        ),
        F.sum(F.when(~F.col("oversize"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("_reg_tokens"),
    )
    return (
        agg.withColumn("n_windows", F.expr("(total_tokens + 255) DIV 256"))
        .crossJoin(F.broadcast(bfa))
        .select(
            "n_docs",
            "total_tokens",
            "n_windows",
            "n_crossing_docs",
            dround(
                F.col("total_tokens") / (F.col("n_windows") * F.lit(256.0)), 6
            ).alias("fill_ratio"),
            "bestfit_bins",
            "bestfit_oversize_docs",
            dround(
                F.col("_reg_tokens")
                / (
                    (F.col("bestfit_bins") - F.col("bestfit_oversize_docs"))
                    * F.lit(256.0)
                ),
                6,
            ).alias("bestfit_fill"),
        )
    )


PACKING_EFF_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id < 300
), c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM t
), s AS (
  SELECT COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens,
         SUM(CASE WHEN n_tokens > 0 AND (start_offset // 256) <> ((start_offset + GREATEST(n_tokens - 1, 0)) // 256)
                  THEN 1 ELSE 0 END) AS n_crossing_docs
  FROM c
), p AS (
  SELECT doc_id, n_tokens, CAST(256 // n_tokens AS BIGINT) AS len_class
  FROM t WHERE n_tokens > 0
), cb AS (
  SELECT len_class,
         (COUNT(*) + GREATEST(len_class, 1) - 1) // GREATEST(len_class, 1) AS nbins
  FROM p GROUP BY len_class
), b AS (
  SELECT CAST(SUM(nbins) AS BIGINT) AS bestfit_bins,
         CAST(COALESCE(SUM(nbins) FILTER (len_class = 0), 0) AS BIGINT)
           AS bestfit_oversize_docs,
         (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
          FROM p WHERE len_class > 0) AS reg_tokens
  FROM cb
)
SELECT n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST((total_tokens + 255) // 256 AS BIGINT) AS n_windows,
       CAST(n_crossing_docs AS BIGINT) AS n_crossing_docs,
       FLOOR((total_tokens::DOUBLE / (((total_tokens + 255) // 256) * 256)) * 1000000 + 0.5) / 1000000 AS fill_ratio,
       bestfit_bins, bestfit_oversize_docs,
       FLOOR((reg_tokens::DOUBLE / ((bestfit_bins - bestfit_oversize_docs) * 256.0)) * 1000000 + 0.5) / 1000000 AS bestfit_fill
FROM s, b
"""


def collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise mutual
    information, PMI = ln((c_ab/N2) / ((c_a/N1)(c_b/N1))), minimum
    count 5 — the phrase-detection pass (word2vec-style preprocessing)
    that decides which token pairs merge before tokenizer training.
    Two linear aggregations (unigram + bigram counts), totals ride as
    broadcast 1-row aggregates, top-k via orderBy().limit()."""
    docs = load_table(spark, sf_dir, "documents")
    # both count tables are vocabulary-sized and read by multiple
    # consumers (uni by n1/ua/ub, the bigram counts by the filter AND
    # the n2 total) — checkpointed so each corpus tokenization runs
    # once, not three times
    uni = (
        docs.select(F.explode(X.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(pin)
    )
    bi_all = (
        docs.select(F.explode(X.ngrams("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .transform(pin)
    )
    bi = bi_all.filter(F.col("c_ab") >= 5)
    n1 = uni.agg(F.sum("c").alias("n1"))
    # total bigram occurrences == sum of the per-bigram counts: no
    # second tokenization pass
    n2 = bi_all.agg(F.sum("c_ab").alias("n2"))
    parts = bi.withColumn("tok_a", F.split("bigram", " ")[0]).withColumn(
        "tok_b", F.split("bigram", " ")[1]
    )
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    joined = (
        parts.join(F.broadcast(ua), on="tok_a")
        .join(F.broadcast(ub), on="tok_b")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    pmi = dround(
        F.log(
            (F.col("c_ab").cast("double") / F.col("n2"))
            / (
                (F.col("c_a").cast("double") / F.col("n1"))
                * (F.col("c_b").cast("double") / F.col("n1"))
            )
        ),
        6,
    )
    return (
        joined.select(
            "bigram",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(20)
    )


COLLOCATIONS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), uni AS (
  SELECT unnest(t) AS tok FROM toks
), uc AS (
  SELECT tok, COUNT(*) AS c FROM uni WHERE tok <> '' GROUP BY tok
), bis AS (
  SELECT unnest(CASE WHEN len(t) >= 2
                     THEN list_transform(range(1, len(t)),
                                         i -> array_to_string(t[i:i+1], ' '))
                     ELSE CAST([] AS VARCHAR[]) END) AS bigram
  FROM toks
), bc AS (
  SELECT bigram, COUNT(*) AS c_ab FROM bis GROUP BY bigram HAVING COUNT(*) >= 5
), n1 AS (SELECT SUM(c) AS n1 FROM uc),
n2 AS (SELECT COUNT(*) AS n2 FROM bis),
joined AS (
  SELECT b.bigram, b.c_ab, a.c AS c_a, bb.c AS c_b, n1.n1, n2.n2
  FROM bc b
  JOIN uc a ON string_split(b.bigram, ' ')[1] = a.tok
  JOIN uc bb ON string_split(b.bigram, ' ')[2] = bb.tok
  CROSS JOIN n1 CROSS JOIN n2
)
SELECT bigram, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
       FLOOR(ln((c_ab::DOUBLE / n2) / ((c_a::DOUBLE / n1) * (c_b::DOUBLE / n1))) * 1000000 + 0.5) / 1000000 AS pmi
FROM joined
ORDER BY pmi DESC, bigram LIMIT 20
"""


def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 25th doc is the held-out 'eval
    set'; report 3-gram overlap for the rest of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    corpus = docs.filter(F.col("doc_id") % 25 != 0)
    return D.contamination_report(corpus, bench, n=3).orderBy("doc_id")


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 3 + 2),
                                  i -> array_to_string(t[i:i+2], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 25 = 0
), doc_grams AS (
  SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM grams WHERE doc_id % 25 <> 0
), hits AS (
  SELECT doc_id, COUNT(*) AS n_hit
  FROM doc_grams JOIN bench USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_hit, 0) AS n_hit,
       COALESCE(h.n_hit, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 25 <> 0) d
LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


def contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination rate per source — the per-source
    curation dashboard's third column next to dup_rate and quality
    (which crawl leaks the most eval data). Same broadcast-bench
    3-gram overlap as docs_decontaminate, rolled up by source."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    corpus = docs.filter(F.col("doc_id") % 25 != 0)
    rep = D.contamination_report(corpus, bench)
    return (
        corpus.select("doc_id", "source")
        .join(rep.select("doc_id", "contaminated"), on="doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("contaminated").cast("int")).cast("long").alias(
                "n_contaminated"
            ),
            dround(
                F.sum(F.col("contaminated").cast("int")) / F.count(F.lit(1)), 4
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


CONTAM_BY_SOURCE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 3 + 2),
                                  i -> array_to_string(t[i:i+2], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 25 = 0
), doc_grams AS (
  SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM grams WHERE doc_id % 25 <> 0
), hits AS (
  SELECT doc_id, COUNT(*) AS n_hit
  FROM doc_grams JOIN bench USING (gram) GROUP BY doc_id
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(h.n_hit, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       FLOOR((SUM(CASE WHEN COALESCE(h.n_hit, 0) > 0 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)) * 10000 + 0.5) / 10000 AS contamination_rate
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 25 <> 0
GROUP BY d.source ORDER BY d.source
"""


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the stopword-voting
    classifier (operators/text.predict_lang) against the corpus's
    labeled ``lang`` column, plus per-cell share — the accuracy audit
    that belongs next to any heuristic classifier. One scan + one
    (label, prediction) aggregation."""
    from degdb_spark.operators.text import predict_lang

    docs = load_table(spark, sf_dir, "documents")
    pred = predict_lang(docs).select("lang", "pred_lang")
    total = pred.agg(F.count(F.lit(1)).alias("_n"))
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "pred_lang",
            "n",
            dround(F.col("n") / F.col("_n"), 4).alias("share"),
        )
        .orderBy("lang", "pred_lang")
    )


def _langid_confusion_sql() -> str:
    from degdb_spark.operators.text import LANG_MARKERS

    # replicate predict_lang: per-language marker hits, argmax with
    # first-language-wins tie-break in LANG_MARKERS iteration order
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = "[" + ",".join(f"'{m}'" for m in markers) + "]"
        hit_cols.append(
            f"len(list_filter({_TOKS}, t -> list_contains({arr}, t))) AS h_{lang}"
        )
    langs = list(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"h_{l}" for l in langs) + ")"
    pred = "'und'"
    for lang in reversed(langs):
        pred = f"CASE WHEN h_{lang} = best AND best > 0 THEN '{lang}' ELSE {pred} END"
    return f"""
WITH hits AS (
  SELECT lang, {", ".join(hit_cols)} FROM documents
), scored AS (
  SELECT lang, {best} AS best, * FROM hits
), preds AS (
  SELECT lang, {pred} AS pred_lang FROM scored
), total AS (SELECT COUNT(*) AS n_all FROM preds)
SELECT lang, pred_lang, COUNT(*) AS n,
       FLOOR((COUNT(*)::DOUBLE / n_all) * 10000 + 0.5) / 10000 AS share
FROM preds CROSS JOIN total
GROUP BY lang, pred_lang, n_all ORDER BY lang, pred_lang
"""


def novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content novelty per source: the fraction of a source's 3-gram
    occurrences that are corpus-UNIQUE (appear exactly once anywhere).
    High share = original long-tail content; low share = boilerplate /
    templated text — the inverse signal of the dup-rate column on the
    per-source dashboard. One gram-keyed aggregation + one linear
    join-back; nothing vocabulary-wide funnels into one task."""
    from degdb_spark.operators.balance import rebalance_for_compute

    # the single-file documents scan arrives as ONE partition and the
    # 3-gram explode is evaluated TWICE (occurrence side + probe side
    # of the join) — both serialized onto one task without a spread
    # (measured: 2 × ~0.6 s single-task stages). Counts only, so the
    # round-robin is a result identity (guide §2.5).
    docs = rebalance_for_compute(load_table(spark, sf_dir, "documents"))
    grams = docs.select("source", F.explode(X.ngrams("text", 3)).alias("g"))
    occ = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        grams.join(occ, on="g")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("n_occ") == 1).cast("long")).alias("n_unique"),
        )
        .withColumn(
            "novelty", dround(F.col("n_unique") / F.col("n_grams"), 4)
        )
        .orderBy("source")
    )


NOVELTY_SQL = f"""
WITH toks AS (
  SELECT source, {_TOKS} AS t FROM documents
), grams AS (
  SELECT source,
         unnest(CASE WHEN len(t) >= 3
                     THEN list_transform(range(1, len(t) - 3 + 2),
                                         i -> array_to_string(t[i:i+2], ' '))
                     ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM toks
), occ AS (
  SELECT g, COUNT(*) AS n_occ FROM grams GROUP BY g
)
SELECT grams.source, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN occ.n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       FLOOR((SUM(CASE WHEN occ.n_occ = 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)) * 10000 + 0.5) / 10000 AS novelty
FROM grams JOIN occ USING (g)
GROUP BY grams.source ORDER BY grams.source
"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction parity check: deterministic PII (email / IP / phone
    derived from doc_id) is appended to each document, then redacted;
    the oracle builds the identical string and applies the identical
    rules, so the md5 of the redacted text must match exactly."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    withpii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 or +1 555 000 1"),
            F.col("doc_id").cast("string"),
        ).alias("pii_text"),
    )
    return withpii.select(
        "doc_id",
        F.md5(X.redact_pii("pii_text")).alias("redacted_fp"),
        *X.pii_counts("pii_text"),
    ).orderBy("doc_id")


PII_SQL = r"""
WITH withpii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 or +1 555 000 1' || CAST(doc_id AS VARCHAR) AS pii_text
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       md5(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(pii_text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
           '\+?\d[\d()\- ]{6,}\d', '<PHONE>', 'g')
       ) AS redacted_fp,
       len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS pii_email,
       len(regexp_extract_all(pii_text, '\b\d{3}-\d{2}-\d{4}\b')) AS pii_ssn,
       len(regexp_extract_all(pii_text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS pii_ipv4,
       len(regexp_extract_all(pii_text, '\+?\d[\d()\- ]{6,}\d')) AS pii_phone
FROM withpii
ORDER BY doc_id
"""


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first merge round of BPE tokenizer training: corpus-wide
    adjacent character-pair frequencies over lowercased [a-z] words,
    top 30. (Real BPE iterates merge→recount; each round is exactly
    this aggregation over the re-segmented corpus, so the round IS the
    distributed primitive.) All codegen built-ins — split/sequence/
    transform/explode — one shuffle on the 26²-key pair groupBy,
    map-side combined to a few hundred rows regardless of corpus size."""
    from degdb_spark.operators.balance import rebalance_for_compute

    # spread the single-file scan before the two-level explode
    # (guide §2.5); counts only → identity
    docs = rebalance_for_compute(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


BPE_PAIRS_SQL = """
WITH words AS (
  SELECT UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS w FROM documents
), pairs AS (
  SELECT UNNEST(list_transform(range(1, LENGTH(w)), i -> substr(w, i, 2))) AS pair
  FROM words WHERE LENGTH(w) >= 2
)
SELECT pair, COUNT(*) AS n FROM pairs
GROUP BY pair ORDER BY n DESC, pair LIMIT 30
"""




def bpe_encode_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE inference over the corpus with the pinned merge table
    (operators/text.bpe_encode — chained codegen replaces, no UDF):
    top-30 subword tokens by frequency. The round-trip complement of
    docs_bpe_pair_counts (training side)."""
    from degdb_spark.operators.balance import rebalance_for_compute

    # the chained-replace BPE encode is pure codegen CPU per word —
    # spread the single-file scan first (guide §2.5); counts → identity
    docs = rebalance_for_compute(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
    ).filter(F.length("w") >= 1)
    toks = words.select(F.explode(X.bpe_encode("w")).alias("subword"))
    return (
        toks.groupBy("subword")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "subword")
        .limit(30)
    )


def _bpe_encode_sql() -> str:
    expr = "rtrim(regexp_replace(w, '(.)', '\\1\u00b7', 'g'), '\u00b7')"
    for a, b in X.BPE_MERGES:
        expr = f"replace({expr}, '{a}\u00b7{b}', '{a}{b}')"
    return f"""
WITH words AS (
  SELECT UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS w FROM documents
), enc AS (
  SELECT UNNEST(string_split({expr}, '\u00b7')) AS subword
  FROM words WHERE LENGTH(w) >= 1
)
SELECT subword, COUNT(*) AS n FROM enc
GROUP BY subword ORDER BY n DESC, subword LIMIT 30
"""


BPE_ENCODE_SQL = _bpe_encode_sql()




def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan BPE tokenizer training (operators/text.bpe_train): learn
    the top-8 merges from the corpus word histogram — the trained-model
    complement of docs_bpe_pair_counts (statistics) and docs_bpe_encode
    (inference with a pinned table). The oracle unrolls all 8 rounds as
    CTEs, each re-deriving the pair histogram over the boundary-anchored
    string form and picking the argmax with scalar subqueries — so a
    hash match certifies the full data-dependent training loop, like
    the unrolled-Lloyd oracle does for IVF."""
    from degdb_spark.operators.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=8)


def _bpe_train_sql(n_merges: int = 8) -> str:
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and e{k}
    # referencing e{k-1} (plus two scalar subqueries on m{k}) would
    # re-evaluate the whole chain exponentially — measured 300 s
    # inlined vs 0.06 s materialized for the same 8-round unroll
    parts = ["""words AS MATERIALIZED (
  SELECT w, COUNT(*) AS n FROM (
    SELECT UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS w FROM documents
  ) WHERE LENGTH(w) >= 1 GROUP BY w
),
e0 AS MATERIALIZED (SELECT regexp_replace(w, '(.)', '|\\1·', 'g') AS s, n FROM words)"""]
    for k in range(1, n_merges + 1):
        parts.append(f"""p{k} AS MATERIALIZED (
  SELECT p, CAST(SUM(n) AS BIGINT) AS n FROM (
    SELECT UNNEST(list_transform(range(1, len(string_split(s, '·')) - 1),
           i -> string_split(s, '·')[i] || '·' || string_split(s, '·')[i + 1] || '·')) AS p,
           n
    FROM e{k - 1}
  ) GROUP BY p
),
m{k} AS MATERIALIZED (SELECT p, n FROM p{k} ORDER BY n DESC, p LIMIT 1),
e{k} AS MATERIALIZED (
  SELECT replace(s, (SELECT p FROM m{k}), (SELECT replace(p, '·|', '') FROM m{k})) AS s, n
  FROM e{k - 1}
)""")
        # the last eK is unused but keeps the generator uniform
    selects = [
        f"SELECT {k} AS merge_rank,"
        f" ltrim(string_split(p, '·')[1], '|') AS lhs,"
        f" ltrim(string_split(p, '·')[2], '|') AS rhs, n FROM m{k}"
        for k in range(1, n_merges + 1)
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY merge_rank"
    )


BPE_TRAIN_SQL = _bpe_train_sql()


_UNI_PIECES, _UNI_ROUNDS, _UNI_MAXP, _UNI_TOP, _UNI_MAXW = 100, 2, 4, 30, 16


def unigram_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan unigram-LM (SentencePiece-style) tokenizer training
    (operators/unigram.py — Kudo 2018): substring-seeded candidate
    vocabulary, 2 hard-EM rounds (codegen Viterbi fold over the word
    histogram, micronat M-step, single-char-preserving prune), top-30
    trained pieces. The oracle unrolls the ENTIRE trajectory — seed
    counts, every dp position of every round's Viterbi, the backtrace
    tie-breaks, the prune, the micronat costs — so a hash match
    certifies the full training loop, the docs_bpe_train discipline
    applied to the EM family. Words are bounded at 16 chars on both
    sides (the oracle's unroll depth; the operator itself folds any
    length)."""
    from degdb_spark.operators.text import word_histogram
    from degdb_spark.operators.unigram import unigram_train_from_hist

    docs = load_table(spark, sf_dir, "documents")
    hist = word_histogram(docs).filter(F.length("w") <= _UNI_MAXW)
    return unigram_train_from_hist(
        hist,
        n_pieces=_UNI_PIECES,
        rounds=_UNI_ROUNDS,
        max_piece=_UNI_MAXP,
        top=_UNI_TOP,
    )


def _unigram_ctes(
    n_pieces: int = _UNI_PIECES,
    rounds: int = _UNI_ROUNDS,
    maxp: int = _UNI_MAXP,
    maxw: int = _UNI_MAXW,
    encode_pass: bool = False,
) -> list[str]:
    # MATERIALIZED everywhere for the same reason as _bpe_train_sql:
    # the CTE chain is deep (16 dp + 16 backtrace steps per round) and
    # plain CTEs re-inline exponentially. With ``encode_pass`` one
    # extra dp+backtrace round (no M-step) runs under the FINAL costs
    # — the inference pass b{rounds+1}_{maxw} the fertility report
    # reads.
    from degdb_spark.operators.unigram import INF_COST

    def lut(r: int, piece_expr: str) -> str:
        return (
            f"COALESCE((SELECT cost FROM costs{r} c WHERE c.piece = "
            f"{piece_expr}), {INF_COST})"
        )

    parts = [
        f"""words AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS w FROM documents
  ) WHERE LENGTH(w) >= 1 AND LENGTH(w) <= {maxw} GROUP BY w
)""",
        f"""subs AS MATERIALIZED (
  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt FROM (
    SELECT UNNEST(flatten(list_transform(range(1, LENGTH(w) + 1), i ->
      list_transform(range(1, LEAST({maxp}, LENGTH(w) - i + 1) + 1),
                     j -> substring(w, i, j))))) AS piece, n
    FROM words) GROUP BY piece
)""",
        f"""sel0 AS MATERIALIZED (
  SELECT piece, cnt FROM
    (SELECT piece, cnt FROM subs ORDER BY cnt DESC, piece LIMIT {n_pieces})
  UNION
  SELECT piece, cnt FROM subs WHERE LENGTH(piece) = 1
)""",
        "tot0 AS MATERIALIZED (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM sel0)",
        "costs0 AS MATERIALIZED (SELECT piece, CAST(-FLOOR(LN(cnt / "
        "(SELECT t FROM tot0)) * 1000000 + 0.5) AS BIGINT) AS cost FROM sel0)",
    ]
    for r in range(1, rounds + 1 + (1 if encode_pass else 0)):
        parts.append(
            f"d{r}_0 AS MATERIALIZED (SELECT w, n, [CAST(0 AS BIGINT)] AS dp"
            " FROM words)"
        )
        for i in range(1, maxw + 1):
            opts = []
            for j in range(1, min(maxp, i) + 1):
                c = lut(r - 1, f"substring(w, {i - j + 1}, {j})")
                opts.append(f"dp[{i - j + 1}] + {c}")
            parts.append(
                f"""d{r}_{i} AS MATERIALIZED (
  SELECT w, n, CASE WHEN LENGTH(w) >= {i}
    THEN list_append(dp, LEAST({', '.join(opts)})) ELSE dp END AS dp
  FROM d{r}_{i - 1})"""
            )
        parts.append(
            f"b{r}_0 AS MATERIALIZED (SELECT w, n, LENGTH(w) AS pos,"
            f" CAST([] AS VARCHAR[]) AS ps, dp FROM d{r}_{maxw})"
        )
        conds = []
        for j in range(1, maxp):
            c = lut(r - 1, f"substring(w, pos - {j - 1}, {j})")
            conds.append(
                f"pos >= {j} AND dp[pos - {j - 1}] + {c} = dp[pos + 1]"
            )
        pos_case = "".join(
            f"WHEN {cond} THEN pos - {j + 1} " for j, cond in enumerate(conds)
        )
        ps_case = "".join(
            f"WHEN {cond} THEN list_append(ps, substring(w, pos - {j}, {j + 1})) "
            for j, cond in enumerate(conds)
        )
        for s in range(1, maxw + 1):
            parts.append(
                f"""b{r}_{s} AS MATERIALIZED (
  SELECT w, n,
    CASE WHEN pos <= 0 THEN pos {pos_case}ELSE pos - {maxp} END AS pos,
    CASE WHEN pos <= 0 THEN ps {ps_case}ELSE list_append(ps,
      substring(w, pos - {maxp - 1}, {maxp})) END AS ps,
    dp
  FROM b{r}_{s - 1})"""
            )
        if r > rounds:
            break  # the encode pass needs only b{r}_{maxw}, no M-step
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt FROM
    (SELECT UNNEST(ps) AS piece, n FROM b{r}_{maxw}) GROUP BY piece)"""
        )
        parts.append(
            f"""sel{r} AS MATERIALIZED (
  SELECT s.piece,
         CAST(CASE WHEN COALESCE(c.cnt, 0) = 0 AND LENGTH(s.piece) = 1
              THEN 1 ELSE c.cnt END AS BIGINT) AS cnt
  FROM sel{r - 1} s LEFT JOIN c{r} c USING (piece)
  WHERE COALESCE(c.cnt, 0) > 0 OR LENGTH(s.piece) = 1)"""
        )
        parts.append(
            f"tot{r} AS MATERIALIZED (SELECT CAST(SUM(cnt) AS DOUBLE) AS t"
            f" FROM sel{r})"
        )
        parts.append(
            f"costs{r} AS MATERIALIZED (SELECT piece, CAST(-FLOOR(LN(cnt / "
            f"(SELECT t FROM tot{r})) * 1000000 + 0.5) AS BIGINT) AS cost"
            f" FROM sel{r})"
        )
    return parts


def _unigram_sql(
    n_pieces: int = _UNI_PIECES,
    rounds: int = _UNI_ROUNDS,
    maxp: int = _UNI_MAXP,
    top: int = _UNI_TOP,
    maxw: int = _UNI_MAXW,
) -> str:
    parts = _unigram_ctes(n_pieces, rounds, maxp, maxw)
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY s.cnt DESC, s.piece) AS BIGINT) AS rank,
       s.piece, s.cnt AS n, co.cost AS cost_micro
FROM sel{rounds} s JOIN costs{rounds} co USING (piece)
ORDER BY rank LIMIT {top}
"""
    )


UNIGRAM_SQL = _unigram_sql()


def unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer EVALUATION — per-source fertility (pieces per word)
    of the trained unigram-LM vocabulary: train in-plan
    (operators/unigram.train_unigram, the docs_unigram_tokenizer
    model), then ENCODE every histogram word under the final costs
    (segmented_words — the inference surface, bpe_encode's twin) and
    roll pieces-per-token up by source. Fertility is THE metric
    tokenizer work reports (how many pieces an average word costs);
    per-source it feeds the curation dashboard (a source whose
    fertility spikes is out-of-domain for the tokenizer). The oracle
    re-runs training AND the encode pass (one extra unrolled Viterbi
    round under the final cost table), so the hash certifies
    inference consistency with training."""
    from degdb_spark.operators.text import word_histogram
    from degdb_spark.operators.unigram import segmented_words, train_unigram

    docs = load_table(spark, sf_dir, "documents")
    hist = word_histogram(docs).filter(F.length("w") <= _UNI_MAXW)
    _, costs = train_unigram(
        hist, n_pieces=_UNI_PIECES, rounds=_UNI_ROUNDS, max_piece=_UNI_MAXP
    )
    seg = segmented_words(hist, costs, _UNI_MAXP).select(
        "w", F.size("ps").cast("long").alias("n_pieces")
    )
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"),
        )
        .filter((F.length("w") >= 1) & (F.length("w") <= _UNI_MAXW))
    )
    return (
        toks.join(seg, on="w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
        )
        .select(
            "source",
            "n_words",
            "n_pieces",
            dround(F.col("n_pieces") / F.col("n_words"), 6).alias("fertility"),
        )
        .orderBy("source")
    )


def _unigram_fertility_sql(
    n_pieces: int = _UNI_PIECES,
    rounds: int = _UNI_ROUNDS,
    maxp: int = _UNI_MAXP,
    maxw: int = _UNI_MAXW,
) -> str:
    parts = _unigram_ctes(n_pieces, rounds, maxp, maxw, encode_pass=True)
    parts.append(
        f"seg AS MATERIALIZED (SELECT w, CAST(len(ps) AS BIGINT) AS n_pieces"
        f" FROM b{rounds + 1}_{maxw})"
    )
    parts.append(
        """tok2 AS MATERIALIZED (
  SELECT source, w FROM (
    SELECT source, UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE LENGTH(w) >= 1 AND LENGTH(w) <= 16)"""
    )
    return (
        "WITH " + ",\n".join(parts) + """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       FLOOR((SUM(n_pieces) / COUNT(*)) * 1000000 + 0.5) / 1000000 AS fertility
FROM tok2 JOIN seg USING (w)
GROUP BY source ORDER BY source
"""
    )


UNIGRAM_FERTILITY_SQL = _unigram_fertility_sql()


#: decision-tree feature grids — ascending literals, the histogram
#: device of distributed GBDT: split search is counting per
#: (candidate, side), never a feature sort
_TREE_GRIDS = {
    "n_chars": [100 * k for k in range(1, 17)],
    "n_spaces": [20 * k for k in range(1, 17)],
    "stop_the": list(range(16)),
}


def docs_decision_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan decision-tree TRAINING (operators/tree.py): recover a
    PLANTED depth-2 quality concept — label = (n_spaces > 60 AND
    stop_the >= 1), a conjunction no single split can express — from
    three integer text features over fixed candidate grids (the grids
    contain the planted thresholds, so a correct trainer reaches pure
    leaves). The third trained-model family member (IVF: unrolled
    Lloyd; BPE: unrolled argmax merges); the oracle unrolls all three
    data-dependent split searches as MATERIALIZED CTEs with
    scalar-subquery argmaxes, so a hash match certifies the full
    training loop: exact integer split objective (floor-scaled
    sum-of-squares), tie-breaks, node routing, and leaf majorities."""
    from degdb_spark.operators.tree import train_depth2_tree

    docs = load_table(spark, sf_dir, "documents")
    stop_the = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" the ")))) / 5
    ).cast("long")
    n_spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
    feats = docs.select(
        stop_the.alias("stop_the"),
        F.col("n_chars").cast("long").alias("n_chars"),
        n_spaces.alias("n_spaces"),
        F.when((n_spaces > 60) & (stop_the >= 1), 1).otherwise(0).alias("label"),
    )
    return train_depth2_tree(feats, _TREE_GRIDS).orderBy("node")


def _tree_sql() -> str:
    grid_rows = ", ".join(
        f"('{feat}', {t})" for feat in sorted(_TREE_GRIDS) for t in _TREE_GRIDS[feat]
    )
    sc = (
        "CASE WHEN {p} + {n} = 0 THEN 0::HUGEINT "
        "ELSE ({p}::HUGEINT * {p} + {n}::HUGEINT * {n}) * 1000000 // ({p} + {n}) END"
    )
    score = (
        sc.format(p="l_pos", n="l_neg") + " + " + sc.format(p="r_pos", n="r_neg")
    )

    def split_cte2(k: int, src: str) -> str:
        return f"""s{k} AS MATERIALIZED (
  SELECT g.feature, g.threshold,
         COALESCE(SUM(CASE WHEN (CASE g.feature WHEN 'n_chars' THEN d.n_chars WHEN 'n_spaces' THEN d.n_spaces ELSE d.stop_the END) <= g.threshold AND d.label = 1 THEN 1 END), 0) AS l_pos,
         COALESCE(SUM(CASE WHEN (CASE g.feature WHEN 'n_chars' THEN d.n_chars WHEN 'n_spaces' THEN d.n_spaces ELSE d.stop_the END) <= g.threshold AND d.label = 0 THEN 1 END), 0) AS l_neg,
         COALESCE(SUM(CASE WHEN (CASE g.feature WHEN 'n_chars' THEN d.n_chars WHEN 'n_spaces' THEN d.n_spaces ELSE d.stop_the END) > g.threshold AND d.label = 1 THEN 1 END), 0) AS r_pos,
         COALESCE(SUM(CASE WHEN (CASE g.feature WHEN 'n_chars' THEN d.n_chars WHEN 'n_spaces' THEN d.n_spaces ELSE d.stop_the END) > g.threshold AND d.label = 0 THEN 1 END), 0) AS r_neg
  FROM grid g LEFT JOIN {src} d ON TRUE
  GROUP BY g.feature, g.threshold
),
m{k} AS MATERIALIZED (
  SELECT feature, threshold, ({score}) AS score
  FROM s{k} ORDER BY score DESC, feature, threshold LIMIT 1
)"""

    fv_m = lambda k: (
        f"(CASE (SELECT feature FROM m{k}) WHEN 'n_chars' THEN n_chars "
        f"WHEN 'n_spaces' THEN n_spaces ELSE stop_the END)"
    )
    return f"""WITH grid AS MATERIALIZED (
  SELECT * FROM (VALUES {grid_rows}) g(feature, threshold)
),
docs0 AS MATERIALIZED (
  SELECT (LENGTH(text) - LENGTH(replace(text, ' the ', ''))) // 5 AS stop_the,
         n_chars,
         LENGTH(text) - LENGTH(replace(text, ' ', '')) AS n_spaces,
         CASE WHEN LENGTH(text) - LENGTH(replace(text, ' ', '')) > 60
                   AND (LENGTH(text) - LENGTH(replace(text, ' the ', ''))) // 5 >= 1
              THEN 1 ELSE 0 END AS label
  FROM documents
),
{split_cte2(0, "docs0")},
d1 AS MATERIALIZED (SELECT * FROM docs0 WHERE {fv_m(0)} <= (SELECT threshold FROM m0)),
d2 AS MATERIALIZED (SELECT * FROM docs0 WHERE {fv_m(0)} > (SELECT threshold FROM m0)),
{split_cte2(1, "d1")},
{split_cte2(2, "d2")},
leafstats AS MATERIALIZED (
  SELECT
    CASE WHEN in_left THEN (CASE WHEN in_l2 THEN 'LL' ELSE 'LR' END)
         ELSE (CASE WHEN in_r2 THEN 'RL' ELSE 'RR' END) END AS node,
    label
  FROM (
    SELECT label,
           {fv_m(0)} <= (SELECT threshold FROM m0) AS in_left,
           {fv_m(1)} <= (SELECT threshold FROM m1) AS in_l2,
           {fv_m(2)} <= (SELECT threshold FROM m2) AS in_r2
    FROM docs0
  )
)
SELECT * FROM (
  SELECT 'root' AS node, (SELECT feature FROM m0) AS feature,
         CAST((SELECT threshold FROM m0) AS BIGINT) AS threshold,
         CAST((SELECT COUNT(*) FROM docs0) AS BIGINT) AS n,
         CAST((SELECT COALESCE(SUM(label), 0) FROM docs0) AS BIGINT) AS n_pos,
         CAST(NULL AS INT) AS pred
  UNION ALL
  SELECT 'L', (SELECT feature FROM m1), CAST((SELECT threshold FROM m1) AS BIGINT),
         CAST((SELECT COUNT(*) FROM d1) AS BIGINT), CAST((SELECT COALESCE(SUM(label), 0) FROM d1) AS BIGINT),
         CAST(NULL AS INT)
  UNION ALL
  SELECT 'R', (SELECT feature FROM m2), CAST((SELECT threshold FROM m2) AS BIGINT),
         CAST((SELECT COUNT(*) FROM d2) AS BIGINT), CAST((SELECT COALESCE(SUM(label), 0) FROM d2) AS BIGINT),
         CAST(NULL AS INT)
  UNION ALL
  SELECT l.node, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
         CAST(COUNT(ls.label) AS BIGINT), CAST(COALESCE(SUM(ls.label), 0) AS BIGINT),
         CAST(CASE WHEN 2 * COALESCE(SUM(ls.label), 0) > COUNT(ls.label) THEN 1 ELSE 0 END AS INT)
  FROM (VALUES ('LL'), ('LR'), ('RL'), ('RR')) l(node)
  LEFT JOIN leafstats ls ON ls.node = l.node
  GROUP BY l.node
) ORDER BY node
"""


TREE_SQL = _tree_sql()


def docs_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan BOOSTED-STUMP training (operators/boost.py): 3
    weight-doubling boosting rounds of the depth-1 histogram split
    search recover a PLANTED 2-of-3 majority concept — label =
    [(n_spaces > 60) + (stop_the >= 1) + (n_chars > 800) >= 2], which
    no single stump can express — over the decision tree's fixed
    candidate grids crossed with both polarities. The sixth
    trained-model family member; the oracle unrolls all three
    weighted argmins as MATERIALIZED CTEs with scalar-subquery stump
    parameters, so a hash match certifies the full loop: integer
    power-of-two reweighting, the (err, feature, threshold, polarity)
    tie-break, the micronat alpha quantization, and the alpha-weighted
    ensemble vote."""
    from degdb_spark.operators.boost import train_boosted_stumps

    docs = load_table(spark, sf_dir, "documents")
    stop_the = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" the ")))) / 5
    ).cast("long")
    n_spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
    votes = (
        (n_spaces > 60).cast("int")
        + (stop_the >= 1).cast("int")
        + (F.col("n_chars") > 800).cast("int")
    )
    feats = docs.select(
        stop_the.alias("stop_the"),
        F.col("n_chars").cast("long").alias("n_chars"),
        n_spaces.alias("n_spaces"),
        F.when(votes >= 2, 1).otherwise(0).alias("label"),
    )
    return train_boosted_stumps(feats, _TREE_GRIDS, rounds=3).orderBy("round")


def _boost_sql(rounds: int = 3) -> str:
    grid_rows = ", ".join(
        f"('{feat}', {t})" for feat in sorted(_TREE_GRIDS) for t in _TREE_GRIDS[feat]
    )
    fv = (
        "(CASE {src}.feature WHEN 'n_chars' THEN d.n_chars "
        "WHEN 'n_spaces' THEN d.n_spaces ELSE d.stop_the END)"
    )

    def stump_pred(k: int) -> str:
        """1/0 prediction of round-k's chosen stump for row d."""
        f = (
            f"(CASE (SELECT feature FROM m{k}) WHEN 'n_chars' THEN d.n_chars "
            f"WHEN 'n_spaces' THEN d.n_spaces ELSE d.stop_the END)"
        )
        return (
            f"(CASE WHEN (SELECT polarity FROM m{k}) = 1 "
            f"THEN ({f} <= (SELECT threshold FROM m{k}))::INT "
            f"ELSE ({f} > (SELECT threshold FROM m{k}))::INT END)"
        )

    parts = [
        f"grid AS MATERIALIZED (SELECT * FROM (VALUES {grid_rows}) g(feature, threshold))",
        "pol AS MATERIALIZED (SELECT * FROM (VALUES (1), (-1)) p(polarity))",
        """docs0 AS MATERIALIZED (
  SELECT (LENGTH(text) - LENGTH(replace(text, ' the ', ''))) // 5 AS stop_the,
         n_chars,
         LENGTH(text) - LENGTH(replace(text, ' ', '')) AS n_spaces,
         CASE WHEN (LENGTH(text) - LENGTH(replace(text, ' ', '')) > 60)::INT
                 + ((LENGTH(text) - LENGTH(replace(text, ' the ', ''))) // 5 >= 1)::INT
                 + (n_chars > 800)::INT >= 2
              THEN 1 ELSE 0 END AS label
  FROM documents
)""",
    ]
    for k in range(1, rounds + 1):
        w = " * ".join(
            f"(1 + ({stump_pred(j)} <> d.label)::INT)" for j in range(1, k)
        ) or "1"
        cand_pred = (
            f"(CASE WHEN p.polarity = 1 THEN ({fv.format(src='g')} <= g.threshold)::INT "
            f"ELSE ({fv.format(src='g')} > g.threshold)::INT END)"
        )
        parts.append(f"""s{k} AS MATERIALIZED (
  SELECT g.feature, g.threshold, p.polarity,
         CAST(COALESCE(SUM(CASE WHEN {cand_pred} <> d.label THEN {w} END), 0) AS BIGINT) AS err_w,
         CAST(COALESCE(SUM({w}), 0) AS BIGINT) AS total_w
  FROM grid g CROSS JOIN pol p LEFT JOIN docs0 d ON TRUE
  GROUP BY g.feature, g.threshold, p.polarity
)""")
        parts.append(f"""m{k} AS MATERIALIZED (
  SELECT feature, threshold, polarity, err_w, total_w,
         CASE WHEN total_w = 0 THEN 0
              ELSE CAST(FLOOR(LN((total_w - err_w)::DOUBLE / GREATEST(err_w, 1)) * 1000000 + 0.5) AS BIGINT)
         END AS alpha_micro
  FROM s{k} ORDER BY err_w, feature, threshold, polarity LIMIT 1
)""")
    score = " + ".join(
        f"(CASE WHEN {stump_pred(k)} = 1 THEN (SELECT alpha_micro FROM m{k}) "
        f"ELSE -(SELECT alpha_micro FROM m{k}) END)"
        for k in range(1, rounds + 1)
    )
    parts.append(f"""ens AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CASE WHEN ({score} > 0)::INT <> d.label THEN 1 END), 0) AS BIGINT) AS mis
  FROM docs0 d
)""")
    selects = [
        f"SELECT {k} AS round, feature, CAST(threshold AS BIGINT) AS threshold,"
        f" polarity, err_w, total_w, alpha_micro FROM m{k}"
        for k in range(1, rounds + 1)
    ]
    selects.append(
        "SELECT 0, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS INT),"
        " mis, n, CAST(NULL AS BIGINT) FROM ens"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


BOOST_SQL = _boost_sql()


def setsim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.95 self-join via rarest-first prefix
    filtering (operators/setsim.py) — lossless candidate generation,
    the exact complement of the banded MinHash approximation."""
    from degdb_spark.operators.setsim import setsim_join

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    # fixed 1000-doc slice: this synthetic corpus draws from a 31-token
    # vocabulary, so corpus-wide J>=0.95 pairs grow quadratically with
    # sf (190k pairs at sf0.1) — a data pathology, not an operator
    # property; the slice keeps the contract result sf-invariant
    return setsim_join(docs, threshold=0.95).orderBy("id_a", "id_b")


def _setsim_sql() -> str:
    from degdb_spark.operators.setsim import setsim_sql

    return setsim_sql(0.95)


SETSIM_SQL = _setsim_sql()




def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token distribution: OLS of ln(freq)
    on ln(rank) over the vocabulary (operators/profile.ols_fit at
    scale=6 on FLOOR-rounded logs — fully deterministic). Ranks come
    from the two-phase distributed row_number (operators/ranking.py):
    shingled/BPE vocabularies grow with the corpus, so an unpartitioned
    rank window would sort the whole vocabulary on one task."""
    from degdb_spark.operators.profile import ols_fit
    from degdb_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(X.tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    ranked = global_row_number(
        freq, [F.col("n").desc(), F.col("token")], rank_name="rank"
    )
    pts = ranked.select(
        dround(F.log(F.col("rank").cast("double")), 6).alias("lx"),
        dround(F.log(F.col("n").cast("double")), 6).alias("ly"),
    )
    return ols_fit(pts, "lx", "ly", scale=6)


ZIPF_SQL = f"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS token FROM documents
), freq AS (
  SELECT token, COUNT(*) AS n FROM tok WHERE token <> '' GROUP BY token
), ranked AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank FROM freq
), pts AS (
  SELECT CAST(FLOOR((FLOOR(ln(rank::DOUBLE) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR((FLOOR(ln(n::DOUBLE) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) AS BIGINT) AS y
  FROM ranked
), m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pts
), d AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
         CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
         CAST(n * syy - sy * sy AS DOUBLE) AS vary,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m
)
SELECT n,
       FLOOR((cov / varx) * 1000000 + 0.5) / 1000000 AS slope,
       FLOOR(((syd - (cov / varx) * sxd) / n / 1000000) * 1000000 + 0.5) / 1000000 AS intercept,
       FLOOR(((cov * cov) / (varx * vary)) * 1000000 + 0.5) / 1000000 AS r2
FROM d
"""




def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: OLS of ln(types) on
    ln(tokens) over ten corpus prefixes (slope = Heaps β). The "type"
    unit is the word 3-GRAM: this synthetic corpus draws from a
    ~31-word lexicon, so unigram vocabulary saturates in the first
    prefix (zero variance — no fit), while 3-gram types keep growing
    the way a real tokenizer vocabulary does. Prefix type counts
    WITHOUT any prefix distinct-count: bucket docs into deciles of the
    doc_id range, reduce the gram stream once to (bucket, gram)
    counts, then a gram's FIRST bucket marks where it entered the
    vocabulary — cumulative new-type counts over the 10 bucket rows
    ARE the prefix vocabulary sizes. One corpus-sized shuffle;
    everything downstream is vocabulary-sized or 10 rows."""
    from degdb_spark.operators.profile import ols_fit

    docs = load_table(spark, sf_dir, "documents")
    maxid = docs.agg(F.max("doc_id").alias("_max"))
    tb = (
        docs.crossJoin(F.broadcast(maxid))
        .select(
            F.expr("doc_id * 10 DIV (_max + 1)").alias("bucket"),
            F.explode(X.ngrams("text", 3)).alias("token"),
        )
        .groupBy("bucket", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(pin, eager=False)  # vocab x 10 rows, feeds 2 aggs
    )
    occ = tb.groupBy("bucket").agg(F.sum("c").alias("n_occ"))
    nova = (
        tb.groupBy("token")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        occ.join(nova, on="bucket", how="left")
        .withColumn("cum_tokens", F.sum("n_occ").over(w))
        .withColumn("cum_vocab", F.sum(F.coalesce("n_new", F.lit(0))).over(w))
    )
    pts = cum.select(
        dround(F.log(F.col("cum_tokens").cast("double")), 6).alias("lx"),
        dround(F.log(F.col("cum_vocab").cast("double")), 6).alias("ly"),
    )
    return ols_fit(pts, "lx", "ly", scale=6)


HEAPS_SQL = f"""
WITH maxid AS (SELECT MAX(doc_id) AS m FROM documents),
toks0 AS (
  SELECT (doc_id * 10) // (m + 1) AS bucket, {_TOKS} AS t
  FROM documents CROSS JOIN maxid
), tok AS (
  SELECT bucket,
         unnest(CASE WHEN len(t) >= 3
                     THEN list_transform(range(1, len(t) - 3 + 2),
                                         i -> array_to_string(t[i:i+2], ' '))
                     ELSE CAST([] AS VARCHAR[]) END) AS token
  FROM toks0
), tb AS (
  SELECT bucket, token, COUNT(*) AS c FROM tok
  GROUP BY bucket, token
), occ AS (SELECT bucket, SUM(c) AS n_occ FROM tb GROUP BY bucket),
firstb AS (SELECT token, MIN(bucket) AS bucket FROM tb GROUP BY token),
nova AS (SELECT bucket, COUNT(*) AS n_new FROM firstb GROUP BY bucket),
cum AS (
  SELECT o.bucket,
         SUM(o.n_occ) OVER (ORDER BY o.bucket) AS cum_tokens,
         SUM(COALESCE(v.n_new, 0)) OVER (ORDER BY o.bucket) AS cum_vocab
  FROM occ o LEFT JOIN nova v USING (bucket)
), pts AS (
  SELECT CAST(FLOOR((FLOOR(ln(cum_tokens::DOUBLE) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR((FLOOR(ln(cum_vocab::DOUBLE) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) AS BIGINT) AS y
  FROM cum
), m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pts
), d AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
         CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
         CAST(n * syy - sy * sy AS DOUBLE) AS vary,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m
)
SELECT n,
       FLOOR((cov / varx) * 1000000 + 0.5) / 1000000 AS slope,
       FLOOR(((syd - (cov / varx) * sxd) / n / 1000000) * 1000000 + 0.5) / 1000000 AS intercept,
       FLOOR(((cov * cov) / (varx * vary)) * 1000000 + 0.5) / 1000000 AS r2
FROM d
"""


def incremental_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance (operators/dedup.
    incremental_lsh_candidates): docs >= 800 arrive as today's batch;
    candidates come from the increment's band table probed against the
    persisted corpus index (old text never re-read), then exact Jaccard
    verification. Must equal the full recompute restricted to pairs
    touching a new doc — which is exactly what the oracle computes."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 800)
    new = docs.filter(F.col("doc_id") >= 800)
    cands = D.incremental_lsh_candidates(new, D.band_table(old))
    return D.ngram_jaccard_pairs(docs, candidates=cands, threshold=0.4).orderBy(
        "id_a", "id_b"
    )


INCREMENTAL_MINHASH_SQL = (
    "SELECT * FROM (\n" + MINHASH_SQL + "\n) WHERE id_a >= 800 OR id_b >= 800 ORDER BY id_a, id_b"
)




def vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift monitor (operators/drift.vocab_kl_drift):
    which tokens drove KL(current || reference) between the doc_id<800
    reference slice and the >=800 'new batch'."""
    from degdb_spark.operators.drift import vocab_kl_drift

    docs = load_table(spark, sf_dir, "documents")
    return vocab_kl_drift(
        docs.filter(F.col("doc_id") < 800),
        docs.filter(F.col("doc_id") >= 800),
        top_n=20,
    )


VOCAB_DRIFT_SQL = f"""
WITH rtok AS (
  SELECT unnest({_TOKS}) AS token FROM documents WHERE doc_id < 800
), ctok AS (
  SELECT unnest({_TOKS}) AS token FROM documents WHERE doc_id >= 800
), ref AS (SELECT token, COUNT(*) AS n_ref FROM rtok WHERE token <> '' GROUP BY token),
cur AS (SELECT token, COUNT(*) AS n_cur FROM ctok WHERE token <> '' GROUP BY token),
vocab AS (
  SELECT COALESCE(ref.token, cur.token) AS token,
         COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
  FROM ref FULL OUTER JOIN cur ON ref.token = cur.token
), tot AS (
  SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc, COUNT(*) AS v FROM vocab
), terms AS (
  SELECT token,
    FLOOR(((n_ref + 1)::DOUBLE / (tr + v)) * 1000000 + 0.5) / 1000000 AS p_ref,
    FLOOR(((n_cur + 1)::DOUBLE / (tc + v)) * 1000000 + 0.5) / 1000000 AS p_cur,
    FLOOR((
      ((n_cur + 1)::DOUBLE / (tc + v))
      * (FLOOR(ln(((n_cur + 1)::DOUBLE / (tc + v)) / ((n_ref + 1)::DOUBLE / (tr + v))) * 1000000 + 0.5) / 1000000)
    ) * 1000000 + 0.5) / 1000000 AS kl_term
  FROM vocab CROSS JOIN tot
)
SELECT token, p_ref, p_cur, kl_term FROM terms
ORDER BY ABS(kl_term) DESC, token LIMIT 20
"""



def docs_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM-perplexity quality selection (Wenzek et al.
    2019, arXiv:1911.00359 — operators/lm.py): train a bigram
    add-one-smoothed language model on the md5 80% split IN-PLAN,
    score every held-out document's adjacent-pair negative
    log-likelihood in integer micronats, and keep the 20 most fluent
    (lowest average-nll) docs — the model-based quality gate real
    pretraining pipelines run after rule filters. Seventh
    trained-model family member; the oracle replays the exact count
    tables, eligibility rule, micronat quantization, and ranking."""
    from degdb_spark.operators.lm import train_score_bigram_lm

    docs = load_table(spark, sf_dir, "documents")
    return train_score_bigram_lm(docs).orderBy("avg_nll", "doc_id")


LM_PERPLEXITY_SQL = rf"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR(64))), 1, 8)) AS BIGINT) % 100 < 20
              THEN 'test' ELSE 'train' END AS split
  FROM documents
), pairs AS (
  SELECT doc_id, split,
         CASE WHEN i = 1 THEN '<s>' ELSE toks[i - 1] END AS a,
         b
  FROM (
    SELECT doc_id, split, toks,
           generate_subscripts(toks, 1) AS i, unnest(toks) AS b
    FROM base
  )
  WHERE b <> '' AND (i = 1 OR toks[i - 1] <> '')
), tr AS (SELECT a, b FROM pairs WHERE split = 'train'),
big AS (SELECT a, b, COUNT(*) AS c_ab FROM tr GROUP BY a, b),
ctx AS (SELECT a, COUNT(*) AS c_a FROM tr GROUP BY a),
vocab AS (SELECT DISTINCT b AS w FROM tr),
vsz AS (SELECT COUNT(*) AS v FROM vocab),
scored AS (
  SELECT t.doc_id,
         -CAST(FLOOR(LN((COALESCE(g.c_ab, 0) + 1)::DOUBLE / (c.c_a + (SELECT v FROM vsz)))
                     * 1000000 + 0.5) AS BIGINT) AS nll
  FROM pairs t
  JOIN ctx c ON c.a = t.a
  JOIN vocab vo ON vo.w = t.b
  LEFT JOIN big g ON g.a = t.a AND g.b = t.b
  WHERE t.split = 'test'
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
         CAST(SUM(nll) AS BIGINT) AS nll_micro
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_scored, nll_micro,
       FLOOR((nll_micro / n_scored / 1000000) * 1000000 + 0.5) / 1000000 AS avg_nll
FROM agg
ORDER BY avg_nll, doc_id
LIMIT 20
"""

#: DSIR target domain: the distribution the selection should match.
_DSIR_TARGET = "src0"


def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023,
    arXiv:2302.03169): score every document by its mean hashed-bucket
    log-likelihood ratio between a TARGET domain (source 'src0') and
    the full-corpus base distribution (add-one smoothing over the
    occupied buckets), then keep the 20 highest-scoring non-target
    docs — the docs whose token distribution most resembles the
    target. Distribution-matching selection is a distinct surface
    from the budget/quota/temperature selectors (which rank by
    quality or size, not by domain fit).

    Plan shape (100 TB): tokens hash into DSIR_BUCKETS fixed buckets
    (the paper's own device — arXiv:2302.03169 §3 uses 10k hashed
    n-gram buckets), so the count/LLR state is provably bounded no
    matter how Heaps' law grows the vocabulary; base and target counts
    come out of ONE aggregation pass over the bucket explode
    (conditional count — no base-vs-target join), totals are a 1-row
    rollup of that bounded frame, and the ≤10k-row LLR table
    broadcasts onto the scoring join, so the corpus is scanned exactly
    twice (count pass, scoring pass) and the occurrence side is never
    shuffled or materialized. Per-bucket LLR is rounded to 6 dp BEFORE
    the per-doc decimal sum (davg), so the doc score is
    order-independent and replays bit-for-bit in DuckDB (the md5
    bucket hash is engine-portable); top-20 cut is
    TakeOrderedAndProject on (score, doc_id) — no window."""
    from degdb_spark.operators.balance import rebalance_for_compute
    from degdb_spark.queries.rounding import davg

    # the corpus is scanned twice (count pass, scoring pass), both
    # through the tokenize+md5 bucket explode — spread the single-file
    # scan so neither serializes (guide §2.5). Per-bucket LLR is 6-dp
    # rounded BEFORE the decimal per-doc sum (docstring above), so the
    # score is order-independent → partitioning identity.
    docs = rebalance_for_compute(load_table(spark, sf_dir, "documents"))
    occ = X.dsir_occurrences(docs)
    scored = X.dsir_scores(occ, X.dsir_word_counts(occ, _DSIR_TARGET))
    return (
        scored.filter(F.col("source") != _DSIR_TARGET)
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "source", "dsir_score")
    )


DSIR_SQL = f"""
WITH d AS (SELECT doc_id, source, text FROM documents WHERE trim(text) <> ''),
occ AS (SELECT doc_id, source,
               CAST(('0x' || substr(md5(unnest({_TOKS})), 1, 8)) AS BIGINT) % {X.DSIR_BUCKETS} AS b
        FROM d),
cnt AS (SELECT b, COUNT(*) AS cb,
               COUNT(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS ct
        FROM occ GROUP BY b),
tot AS (SELECT SUM(cb) AS tb, SUM(ct) AS tt, COUNT(*) AS v FROM cnt),
llr AS (
  SELECT c.b,
         FLOOR((ln(CAST(c.ct + 1 AS DOUBLE) / CAST(tot.tt + tot.v AS DOUBLE))
              - ln(CAST(c.cb + 1 AS DOUBLE) / CAST(tot.tb + tot.v AS DOUBLE)))
               * 1000000 + 0.5) / 1000000 AS l
  FROM cnt c CROSS JOIN tot
),
scored AS (
  SELECT o.doc_id, o.source,
         {sql_davg("l.l", 6, 6)} AS dsir_score
  FROM occ o JOIN llr l ON l.b = o.b
  GROUP BY o.doc_id, o.source
)
SELECT doc_id, source, dsir_score FROM scored
WHERE source <> '{_DSIR_TARGET}'
ORDER BY dsir_score DESC, doc_id LIMIT 20
"""


def docs_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan multinomial Naive Bayes (operators/nb.py): train a
    lang classifier on the 80% md5 train split, score the held-out
    20%, return the confusion matrix — token counting, Laplace
    smoothing, integer-micronat log accumulation, and the per-doc
    argmax all in ONE Catalyst plan with nothing collected. The
    synthetic corpus's lang signal is deliberately weak (all tokens
    occur in all langs); what the oracle certifies is the TRAINER —
    the exact smoothed counts, quantized log terms, prior handling,
    and tie-breaks — replayed end-to-end in SQL."""
    from degdb_spark.operators.nb import train_predict_nb

    docs = load_table(spark, sf_dir, "documents")
    return train_predict_nb(docs, label_col="lang", test_pct=20)


_NB_BUCKET = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR(64))), 1, 8)) AS BIGINT) % 100"

NB_SQL = f"""
WITH base AS (
  SELECT doc_id, lang AS actual,
         CASE WHEN {_NB_BUCKET} < 20 THEN 'test' ELSE 'train' END AS split
  FROM documents
),
tok AS (
  SELECT b.doc_id, b.actual, b.split, x.token
  FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents) x
  JOIN base b USING (doc_id)
  WHERE x.token <> ''
),
counts AS (
  SELECT actual AS cand, token, COUNT(*) AS cnt
  FROM tok WHERE split = 'train' GROUP BY actual, token
),
totals AS (
  -- label axis from the TRAIN DOCS, not the token counts: a label
  -- whose training docs are all token-less still gets a smoothed
  -- distribution (total = 0), mirroring operators/nb.py
  SELECT b.actual AS cand, COALESCE(t.total, 0) AS total
  FROM (SELECT DISTINCT actual FROM base WHERE split = 'train') b
  LEFT JOIN (
    SELECT actual, COUNT(*) AS total FROM tok WHERE split = 'train' GROUP BY actual
  ) t ON t.actual = b.actual
),
vocab AS (SELECT DISTINCT token FROM tok WHERE split = 'train'),
vsize AS (SELECT COUNT(*) AS v FROM vocab),
loglik AS (
  SELECT t.cand, vb.token,
         CAST(FLOOR(LN((COALESCE(c.cnt, 0) + 1)::DOUBLE / (t.total + vs.v)) * 1000000 + 0.5) AS BIGINT) AS llq
  FROM vocab vb CROSS JOIN totals t CROSS JOIN vsize vs
  LEFT JOIN counts c ON c.cand = t.cand AND c.token = vb.token
),
priors AS (
  SELECT actual AS cand,
         CAST(FLOOR(LN(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM base WHERE split = 'train')) * 1000000 + 0.5) AS BIGINT) AS pq
  FROM base WHERE split = 'train' GROUP BY actual
),
cand_scores AS (
  SELECT tt.doc_id, l.cand, CAST(SUM(l.llq) AS BIGINT) AS ts
  FROM tok tt JOIN loglik l ON l.token = tt.token
  WHERE tt.split = 'test'
  GROUP BY tt.doc_id, l.cand
),
scored AS (
  SELECT td.doc_id, td.actual, p.cand, COALESCE(cs.ts, 0) + p.pq AS score
  FROM (SELECT doc_id, actual FROM base WHERE split = 'test') td
  CROSS JOIN priors p
  LEFT JOIN cand_scores cs ON cs.doc_id = td.doc_id AND cs.cand = p.cand
),
pred AS (
  SELECT actual, cand AS predicted
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) = 1
)
SELECT actual, predicted, COUNT(*) AS n_docs
FROM pred GROUP BY actual, predicted ORDER BY actual, predicted
"""


def docs_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan averaged-perceptron linear classifier
    (operators/linear.py): train a lang classifier over md5-hashed
    bag-of-words features (64 buckets + bias) on the 80% md5 train
    split for 4 fixed batch iterations, score the held-out 20% with
    the summed per-iteration weights, return the confusion matrix.
    The whole model is INTEGER (counts in, ±count updates, BIGINT
    scores) so the argmax is bit-stable with zero quantization
    machinery; like docs_naive_bayes the synthetic lang signal is
    weak — what the oracle certifies is the TRAINER: every weight of
    every iteration and every tie-break, replayed as unrolled
    MATERIALIZED CTEs."""
    from degdb_spark.operators.linear import train_predict_linear

    docs = load_table(spark, sf_dir, "documents")
    return train_predict_linear(docs, label_col="lang", test_pct=20)


def _linear_train_sql(
    n_iters: int = 4, n_features: int = 64, feat_body: str | None = None
) -> str:
    # every CTE is MATERIALIZED for the same reason as _bpe_train_sql:
    # plain CTEs re-inline and the w{k} chain would blow up
    # exponentially. Iteration k scores with w{k-1}, updates by the
    # misclassification deltas, and wavg sums the post-update weights
    # of every iteration (the averaged-perceptron estimator).
    # ``feat_body`` swaps the feature CTE's corpus-sized half (default:
    # hashed bag-of-words) — the char-ngram language-ID twin reuses the
    # whole trainer chain with a different featurizer, exactly like
    # train_predict_from_features on the Spark side.
    fhash = f"CAST(('0x' || substr(md5(x.token), 1, 8)) AS BIGINT) % {n_features}"
    if feat_body is None:
        feat_body = f"""
  SELECT b.doc_id, b.actual, b.split, {fhash} AS f, COUNT(*) AS x
  FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents) x
  JOIN base b USING (doc_id)
  WHERE x.token <> ''
  GROUP BY 1, 2, 3, 4"""
    parts = [
        f"""base AS MATERIALIZED (
  SELECT doc_id, lang AS actual,
         CASE WHEN {_NB_BUCKET} < 20 THEN 'test' ELSE 'train' END AS split
  FROM documents
),
feat AS MATERIALIZED ({feat_body}
  UNION ALL
  SELECT doc_id, actual, split, {n_features} AS f, 1 AS x FROM base
),
labels AS MATERIALIZED (SELECT DISTINCT actual AS cand FROM base WHERE split = 'train'),
w0 AS MATERIALIZED (
  SELECT l.cand, g.f, CAST(0 AS BIGINT) AS w
  FROM labels l CROSS JOIN (SELECT unnest(generate_series(0, {n_features})) AS f) g
)"""
    ]
    for k in range(1, n_iters + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT doc_id, actual, cand AS pred FROM (
    SELECT ft.doc_id, ft.actual, w.cand, CAST(SUM(ft.x * w.w) AS BIGINT) AS s
    FROM feat ft JOIN w{k - 1} w ON w.f = ft.f
    WHERE ft.split = 'train'
    GROUP BY 1, 2, 3
  ) QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, cand) = 1
),
u{k} AS MATERIALIZED (
  SELECT d.cand, ft.f, CAST(SUM(d.sgn * ft.x) AS BIGINT) AS dw
  FROM (
    SELECT doc_id, actual AS cand, 1 AS sgn FROM p{k} WHERE pred <> actual
    UNION ALL
    SELECT doc_id, pred AS cand, -1 AS sgn FROM p{k} WHERE pred <> actual
  ) d JOIN feat ft ON ft.doc_id = d.doc_id AND ft.split = 'train'
  GROUP BY 1, 2
),
w{k} AS MATERIALIZED (
  SELECT w.cand, w.f, w.w + COALESCE(u.dw, 0) AS w
  FROM w{k - 1} w LEFT JOIN u{k} u ON u.cand = w.cand AND u.f = w.f
)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM w{k}" for k in range(1, n_iters + 1))
    parts.append(
        f"""wavg AS MATERIALIZED (
  SELECT cand, f, CAST(SUM(w) AS BIGINT) AS w FROM ({union}) GROUP BY cand, f
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT actual, predicted, COUNT(*) AS n_docs FROM (
  SELECT doc_id, actual, cand AS predicted FROM (
    SELECT ft.doc_id, ft.actual, w.cand, CAST(SUM(ft.x * w.w) AS BIGINT) AS s
    FROM feat ft JOIN wavg w ON w.f = ft.f
    WHERE ft.split = 'test'
    GROUP BY 1, 2, 3
  ) QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, cand) = 1
) GROUP BY actual, predicted ORDER BY actual, predicted
"""
    )


LINEAR_SQL = _linear_train_sql()


def docs_langid_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED language-ID — trained-model family member #9 (VERDICT
    r12 "What's missing" #2): the fastText recipe (Joulin et al.
    2016) of a linear classifier over hashed CHARACTER 3-gram
    features (operators/linear.char_ngram_features — orthography:
    accents, digraphs, function-morphemes — where the stopword
    heuristic only sees whole function words), through the SAME
    integer averaged-perceptron trainer as docs_linear_classifier.
    Returns the held-out confusion matrix; the oracle unrolls every
    iteration's weights over the char-ngram feature CTE. The
    heuristic-vs-trained accuracy comparison on an orthographically
    separable corpus is pinned in tests/test_text_skew.py."""
    from degdb_spark.operators.linear import (
        char_ngram_features,
        train_predict_from_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return train_predict_from_features(
        char_ngram_features(docs, label_col="lang", test_pct=20)
    )


def _langid_train_sql(
    n_iters: int = 4, n_features: int = 64, n: int = 3, max_chars: int = 256
) -> str:
    fhash = f"CAST(('0x' || substr(md5(g.gram), 1, 8)) AS BIGINT) % {n_features}"
    feat_body = f"""
  SELECT b.doc_id, b.actual, b.split, {fhash} AS f, COUNT(*) AS x
  FROM (
    SELECT i.doc_id, substr(i.t, i.pos, {n}) AS gram
    FROM (
      SELECT d.doc_id, d.t,
             unnest(generate_series(1, len(d.t) - {n - 1})) AS pos
      FROM (SELECT doc_id, lower(substr(trim(text), 1, {max_chars})) AS t
            FROM documents) d
    ) i
  ) g
  JOIN base b USING (doc_id)
  GROUP BY 1, 2, 3, 4"""
    return _linear_train_sql(
        n_iters=n_iters, n_features=n_features, feat_body=feat_body
    )


LANGID_TRAIN_SQL = _langid_train_sql()


QUERIES: dict[str, Query] = {
    "docs_naive_bayes": Query(docs_naive_bayes, NB_SQL),
    "docs_linear_classifier": Query(docs_linear_classifier, LINEAR_SQL),
    "docs_langid_trained": Query(docs_langid_trained, LANGID_TRAIN_SQL),
    "docs_dsir_selection": Query(dsir_selection, DSIR_SQL),
    "docs_bpe_pair_counts": Query(bpe_pair_counts, BPE_PAIRS_SQL),
    "docs_bpe_encode": Query(bpe_encode_vocab, BPE_ENCODE_SQL),
    "docs_bpe_train": Query(bpe_train_merges, BPE_TRAIN_SQL),
    "docs_unigram_tokenizer": Query(unigram_tokenizer, UNIGRAM_SQL),
    "docs_unigram_fertility": Query(unigram_fertility, UNIGRAM_FERTILITY_SQL),
    "docs_decision_tree": Query(docs_decision_tree, TREE_SQL),
    "docs_boosted_stumps": Query(docs_boosted_stumps, BOOST_SQL),
    "docs_lm_perplexity": Query(docs_lm_perplexity, LM_PERPLEXITY_SQL),
    "docs_setsim_join": Query(setsim_pairs, SETSIM_SQL),
    "docs_zipf_fit": Query(zipf_fit, ZIPF_SQL),
    "docs_heaps_law": Query(heaps_law_fit, HEAPS_SQL),
    "docs_dup_rate_by_source": Query(dup_rate_by_source, DUP_RATE_SQL),
    "docs_quality_vs_dup": Query(quality_vs_dup, QUALITY_VS_DUP_SQL),
    "docs_contamination_by_source": Query(
        contamination_by_source, CONTAM_BY_SOURCE_SQL
    ),
    "docs_novelty_by_source": Query(novelty_by_source, NOVELTY_SQL),
    "docs_langid_confusion": Query(langid_confusion, _langid_confusion_sql()),
    "docs_decontaminate": Query(decontamination_report, DECONTAMINATE_SQL),
    "docs_pii_redaction": Query(pii_redaction, PII_SQL),
    "docs_repetition_metrics": Query(repetition_metrics, REPETITION_SQL),
    "docs_filter_rules": Query(filter_rules_query, FILTER_RULES_SQL),
    "docs_vocab_topk": Query(vocab_topk, VOCAB_SQL),
    "docs_tfidf_terms": Query(tfidf_top_terms, TFIDF_SQL),
    "docs_packing": Query(packing_query, PACKING_SQL),
    "docs_bestfit_packing": Query(bestfit_packing_query, BESTFIT_PACKING_SQL),
    "docs_packing_efficiency": Query(packing_efficiency, PACKING_EFF_SQL),
    "docs_collocations": Query(collocations, COLLOCATIONS_SQL),
    "docs_ngram_jaccard": Query(ngram_jaccard_neardups, JACCARD_SQL),
    "docs_dedup_clusters": Query(dedup_clusters_query, DEDUP_CLUSTERS_SQL),
    "docs_neardup_kept": Query(neardup_kept_summary, NEARDUP_KEPT_SQL),
    "docs_leakage_safe_split": Query(leakage_safe_split, LEAKAGE_SPLIT_SQL),
    "docs_unigram_logprob": Query(unigram_logprob, UNIGRAM_LOGPROB_SQL),
    "docs_bigram_logprob": Query(bigram_logprob, BIGRAM_LOGPROB_SQL),
    "docs_minhash_neardups": Query(minhash_neardups, MINHASH_SQL),
    "docs_incremental_neardups": Query(incremental_neardups, INCREMENTAL_MINHASH_SQL),
    "docs_vocab_drift": Query(vocab_drift, VOCAB_DRIFT_SQL),
    "docs_lsh_calibration": Query(lsh_calibration, LSH_CALIBRATION_SQL),
    "docs_simhash_neardups": Query(simhash_neardups, SIMHASH_SQL),
    # r1-driver-verified entries trail so the 50-query verification
    # window stays on the least-proven queries (see __init__.registry).
    "docs_token_stats": Query(token_stats, TOKEN_STATS_SQL),
    "docs_quality_scores": Query(quality_scores, QUALITY_SQL),
    "docs_language_id": Query(language_id, LANG_ID_SQL),
    "docs_exact_dedup": Query(exact_dedup_groups, EXACT_DEDUP_SQL),
    "docs_span_dedup": Query(span_dedup_report, SPAN_DEDUP_SQL),
    "docs_paragraph_dedup": Query(paragraph_dedup_report, PARAGRAPH_DEDUP_SQL),
    "docs_paragraph_dup_by_source": Query(
        paragraph_dup_by_source, PARAGRAPH_DUP_BY_SOURCE_SQL
    ),
    "docs_substring_dedup": Query(substring_dedup_report, SUBSTR_DEDUP_SQL),
    "docs_substring_dup_by_source": Query(substring_dup_by_source, SUBSTR_DUP_BY_SOURCE_SQL),
    "docs_fingerprints": Query(doc_fingerprints, FINGERPRINT_SQL),
}


def fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (MinHash-LSH) benchmark decontamination — the middle
    decontamination rung (operators/dedup.fuzzy_contamination):
    lightly edited benchmark copies that the exact 3-gram check can
    miss band-collide with the eval doc and verify at token-set
    Jaccard >= 0.4. Same eval-set convention as docs_decontaminate
    (every 25th doc); per-corpus-doc report with the bench side
    broadcast. The oracle replays the shared banded-LSH chain
    (_MINHASH_CTES) restricted to mixed bench-corpus pairs."""
    from degdb_spark.operators.dedup import fuzzy_contamination

    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_contamination(
        docs.filter(F.col("doc_id") % 25 != 0),
        docs.filter(F.col("doc_id") % 25 == 0),
        threshold=0.4,
    ).orderBy("doc_id")


FUZZY_DECONTAMINATE_SQL = f"""
WITH {_MINHASH_CTES}
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_bench_matches,
       COALESCE(h.mx, -1.0) AS max_jaccard,
       COALESCE(h.n, 0) > 0 AS fuzzy_contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 25 <> 0) d
LEFT JOIN (
  SELECT CASE WHEN id_a % 25 = 0 THEN id_b ELSE id_a END AS doc_id,
         COUNT(*) AS n, MAX(jaccard) AS mx
  FROM verified
  WHERE (id_a % 25 = 0) <> (id_b % 25 = 0)
  GROUP BY 1
) h USING (doc_id)
ORDER BY d.doc_id
"""

QUERIES["docs_fuzzy_decontaminate"] = Query(
    fuzzy_decontaminate, FUZZY_DECONTAMINATE_SQL
)
