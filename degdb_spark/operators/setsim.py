"""Exact set-similarity self-join via prefix filtering (PPJoin-style).

The EXACT complement of the MinHash-LSH candidate generator in
operators/dedup.py: for a Jaccard threshold t, two token sets can only
reach t if they share at least one token in each other's PREFIX — the
first |x| - ceil(t*|x|) + 1 tokens under a global rarest-first
ordering. Blocking on prefix tokens is therefore lossless (100% recall
by construction, unlike banding), and rarest-first prefixes keep the
blocks small: frequent tokens never enter short prefixes.

Scale design (100 TB corpus):

- The global token order is (document frequency asc, token) — a TOTAL
  order, so each document sorts its own (df, token) structs locally and
  gets the identical rarest-first sequence with no vocabulary-wide rank
  window (shingled vocabularies run to billions of tokens — ranking
  them through an unpartitioned row_number() would sort the whole
  vocabulary on one task) and no vocabulary broadcast: df rides a
  token-keyed equi-join that reuses the partitioning the df
  aggregation just produced.
- Candidate generation explodes only prefix tokens (a ~(1-t) fraction
  of each set) and equi-joins on token — the same banded-join family
  as MinHash/q-grams, one shuffle keyed by token.
- Verification is an array intersection on the candidate pair only;
  token arrays ride the join already sorted.

Determinism: the order is a total order (ties broken by token), sizes
and intersections are integers, and jaccard = inter/union rounds at
4 dp — bit-replayable in DuckDB.

Reference scope note: the reference engine dedups exact triples only
(triplestore insert); thresholded set similarity is part of the
LLM-pipeline extension surface (SURVEY.md §8.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.queries.rounding import dround
from degdb_spark.persistence import pin


def _rarest_first_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, toks rarest-first, sz) — the per-doc total-order sort
    described in the module docstring. Exposed for the skew property
    tier (tests/test_text_skew.py) as well as setsim_join."""
    from degdb_spark.operators.text import tokens

    tok = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    # per-doc token array sorted rarest-first. (df, token) is already a
    # total order, so sorting each doc's (df, token) structs locally
    # yields exactly the sequence a global row_number() rank would —
    # without the vocabulary-sized single-task window or broadcasting
    # the vocabulary. The localCheckpoint matters: `sets` feeds pref,
    # sa AND sb below, and without it the tokenize→dfreq→aggregate
    # pipeline executes three times.
    return (
        tok.join(dfreq, on="token")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "token"))),
                lambda s: s["token"],
            ).alias("toks"),
            F.count(F.lit(1)).alias("sz"),
        )
        .transform(pin, eager=False)
    )


def _prefix_tokens(sets: DataFrame, threshold: float) -> DataFrame:
    """(id, ptok): each doc exploded to its prefix tokens only — the
    lossless blocking keys. Prefix length |x| - ceil(t*|x|) + 1."""
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    return sets.select(
        "id", F.explode(F.slice("toks", 1, prefix_len)).alias("ptok")
    )


def setsim_join(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs (id_a, id_b, inter, union_size, jaccard) with exact token-
    set Jaccard >= threshold, canonical id_a < id_b."""
    sets = _rarest_first_sets(docs, id_col, text_col)
    # candidate generation carries ONLY ids — deduping (id_a, id_b)
    # before attaching token arrays keeps the candidate shuffle rows ~2
    # longs wide instead of dragging both arrays through the distinct
    # (the candidate count dwarfs the corpus, so array width there
    # dominates the shuffle)
    pref = _prefix_tokens(sets, threshold)
    cand_ids = (
        pref.select(F.col("id").alias("id_a"), "ptok")
        .join(pref.select(F.col("id").alias("id_b"), "ptok"), on="ptok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # AQE right-sizes the candidate frame by BYTES, but verification is
    # compute-bound per row (an array_intersect over ~|doc| tokens), so
    # the byte-coalesced 2-partition frame serialized 2.6 s of
    # intersections onto 2 tasks (measured) — spread candidates before
    # attaching the arrays; per-pair results are partitioning-independent.
    # UNCONDITIONALLY (ADVICE r13): the conditional helper's partition-
    # count probe finalizes the AQE plan of this post-shuffle subtree,
    # which EXECUTES the candidate join+distinct once just to read the
    # count, and the real query then re-runs the same stages (no
    # cross-execution exchange reuse) — candidate generation was paid
    # twice per query. The candidate rows are two longs, so the
    # unconditional round-robin costs far less than the double run.
    cand_ids = cand_ids.repartition(
        cand_ids.sparkSession.sparkContext.defaultParallelism
    )
    sa = sets.select(
        F.col("id").alias("id_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("sz_a")
    )
    sb = sets.select(
        F.col("id").alias("id_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("sz_b")
    )
    cand = cand_ids.join(sa, on="id_a").join(sb, on="id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        cand.withColumn("inter", inter.cast("long"))
        .withColumn("union_size", union.cast("long"))
        .withColumn("jaccard", dround(F.col("inter") / F.col("union_size"), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_size", "jaccard")
    )


def setsim_sql(threshold: float = 0.8) -> str:
    """DuckDB replay of setsim_join over the doc_id<1000 slice
    (mirrors the contract query scoping)."""
    toks = r"regexp_split_to_array(lower(trim(text)), '\s+')"
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id AS id, unnest({toks}) AS token
  FROM documents WHERE doc_id < 1000
), tok2 AS (SELECT * FROM tok WHERE token <> ''),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM tok2 GROUP BY token
), ranked AS (
  SELECT token, ROW_NUMBER() OVER (ORDER BY df, token) AS rnk FROM dfreq
), sets AS (
  SELECT id, list(t.token ORDER BY r.rnk) AS toks, COUNT(*) AS sz
  FROM tok2 t JOIN ranked r ON t.token = r.token
  GROUP BY id
), pref AS (
  SELECT id, toks, sz,
         unnest(toks[1:(sz - CAST(CEIL({threshold} * sz) AS BIGINT) + 1)]) AS ptok
  FROM sets
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                  a.toks AS toks_a, b.toks AS toks_b,
                  a.sz AS sz_a, b.sz AS sz_b
  FROM pref a JOIN pref b ON a.ptok = b.ptok AND a.id < b.id
), verified AS (
  SELECT id_a, id_b,
         len(list_intersect(toks_a, toks_b)) AS inter,
         sz_a + sz_b - len(list_intersect(toks_a, toks_b)) AS union_size
  FROM cand
)
SELECT id_a, id_b, inter, union_size,
       FLOOR((inter::DOUBLE / union_size) * 10000 + 0.5) / 10000 AS jaccard
FROM verified
WHERE FLOOR((inter::DOUBLE / union_size) * 10000 + 0.5) / 10000 >= {threshold}
ORDER BY id_a, id_b
"""
