"""Ranked-retrieval queries: BM25 top-k search over `documents`.

Complements the reference's point-lookup query surface
(`core/http.go:29-35` answers exact triple patterns) with scored
retrieval — the op a data pipeline needs for decontamination audits and
eval-set mining. Oracle-checked bit-for-bit (see operators/search.py
for the determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from degdb_spark.catalog import load_table
from degdb_spark.operators import search as S
from degdb_spark.queries import Query
from degdb_spark.queries.naming import sf_segment as _sf_segment
from degdb_spark.persistence import pin

#: Fixed benchmark query: one rare term ('dup' ~ 2.6% df) + two common
#: ones, so idf actually differentiates and the candidate filter prunes.
BM25_TERMS = ["dup", "spark", "window"]


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.bm25_topk(docs, BM25_TERMS, k=25)


def parts_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over part names: canonicalize identical
    strings first (the test table repeats each name ~31x), then q-gram
    blocking + levenshtein <= 3 on the canonical rows only
    (operators/fuzzy.py)."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.fuzzy import fuzzy_match

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    out = fuzzy_match(
        names.select("id", F.col("p_name").alias("name")), "id", "name", max_dist=3
    )
    return (
        out.select(
            "id_a",
            "id_b",
            F.col("text_a").alias("name_a"),
            F.col("text_b").alias("name_b"),
            "dist",
        )
        .orderBy("id_a", "id_b")
    )


FUZZY_MATCH_SQL = """
WITH names AS (
  SELECT p_name AS name, MIN(p_partkey) AS id FROM part GROUP BY p_name
), grams AS (
  SELECT id, name,
         unnest(list_distinct([substr(name, i, 3) for i in range(1, GREATEST(length(name)-1, 1))])) AS g
  FROM names
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
  FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
)
SELECT id_a, id_b, name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= 3
ORDER BY id_a, id_b
"""




#: Fixed phrase for the positional-search benchmark query.
PHRASE = ["hash", "join"]


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact consecutive-token phrase counting as a shuffle-free scan
    (operators/search.phrase_count): top-25 docs by occurrences."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.text import tokens

    from degdb_spark.operators.balance import rebalance_for_compute

    docs = load_table(spark, sf_dir, "documents")
    # "shuffle-free scan" cuts both ways: a single-file input runs the
    # whole per-position match loop on ONE task (measured 4.3 s on one
    # core) — round-robin the raw docs first (guide §2.5); per-doc
    # counts are partitioning-independent
    toks = rebalance_for_compute(docs).select(
        "doc_id", tokens("text").alias("toks")
    )
    out = toks.select(
        "doc_id", S.phrase_count_tokens(F.col("toks"), PHRASE).alias("n_hits")
    )
    # filter AFTER the top-k, not before: a pre-limit filter on the
    # computed column is pushed below the rebalance exchange and
    # re-evaluates the whole per-position match on the single scan
    # task (the very thing the rebalance exists to avoid). Equivalent
    # by the total order: the top-25 under (n_hits DESC, doc_id) is
    # identical whether non-positive rows are dropped before or after
    # the cut — if ≥25 docs are positive they fill the cut either
    # way; if fewer, the post-filter trims exactly the same rows.
    return (
        out.orderBy(F.col("n_hits").desc(), "doc_id")
        .limit(25)
        .filter(F.col("n_hits") > 0)
    )




def _positional_index_table(sf_dir: str) -> str:
    """Content-addressed name for the contract-query positional index,
    keyed on the sf dir and the documents parquet's (mtime, size) — a
    warehouse outliving a testdata regeneration can never serve stale
    positions, while repeated queries in one round reuse the build
    (same pattern as the ANN contract index). The sf-dir hash is its
    own name segment so retirement is scoped per sf dir — building one
    sf dir's index never drops another's live table."""
    import hashlib
    import os

    sig = []
    try:
        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        sig += [str(st.st_mtime_ns), str(st.st_size)]
    except OSError:
        pass
    content = hashlib.md5("|".join(sig).encode()).hexdigest()[:12]
    return f"pos_idx_contract_{_sf_segment(sf_dir)}_{content}"



def _legacy_pos_index(name: str) -> bool:
    """Pre-round-7 positional-index names (the single ``{12hex}`` era;
    no sf segment, no sidecars) — retired on sight. Cannot match a
    current ``pos_idx_contract_{8hex}_{12hex}`` name."""
    import re

    return bool(re.fullmatch(r"pos_idx_contract_[0-9a-f]{12}", name))


def phrase_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_phrase_search answered FROM the persisted positional index
    (operators/search.phrase_topk_from_index): probes the phrase's
    token buckets instead of rescanning + retokenizing the corpus —
    the serving-workload path for repeated phrase queries at 100 TB
    (the scan path remains the ad-hoc shape, SCALE.md). The
    fingerprint-keyed build runs only when the artifact is absent;
    stale-fingerprint siblings are retired. Shares the scan query's
    oracle — identical results by construction (parity also
    pytest-enforced, tests/test_search.py)."""
    from degdb_spark.operators.pq import drop_managed_table

    table = _positional_index_table(sf_dir)
    if not spark.catalog.tableExists(table):
        # retire only THIS sf dir's stale generations (see
        # _positional_index_table) plus pre-rename legacy builds
        prefix = f"pos_idx_contract_{_sf_segment(sf_dir)}_"
        stale = {
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith(prefix) or _legacy_pos_index(t.name)
        } - {table}
        for t in sorted(stale):
            drop_managed_table(spark, t)
        docs = load_table(spark, sf_dir, "documents")
        S.build_positional_index(docs, table)
    return S.phrase_topk_from_index(spark, table, PHRASE, k=25)


def proximity_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_proximity_search answered FROM the persisted positional
    index (operators/search.proximity_topk_from_index): two
    bucket-pruned token probes + one doc_id equi-join instead of
    rescanning + retokenizing the corpus — with phrase_search_indexed
    this makes both positional-index query modes driver-checkable.
    Reuses (or builds) the same fingerprint-keyed artifact and shares
    the scan query's oracle — identical results by construction
    (parity pytest-enforced, tests/test_search.py)."""
    table = _positional_index_table(sf_dir)
    if not spark.catalog.tableExists(table):
        phrase_search_indexed(spark, sf_dir)  # builds + retires stale
    return S.proximity_topk_from_index(
        spark, table, PROX_A, PROX_B, PROX_WINDOW, k=25
    )


def parts_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi-Sunter) on blocked
    candidates: q-gram blocking over canonical names, agreement vector
    (name edit distance <= 2, brand equal, type equal), pinned (m, u)
    weights -> match_weight ranking pairs for link/review decisions."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.fuzzy import blocked_pairs, linkage_scores

    part = load_table(spark, sf_dir, "part")
    canon = (
        part.groupBy("p_name")
        .agg(F.min("p_partkey").alias("id"))
        .join(
            part.select(
                F.col("p_partkey").alias("id"), "p_brand", "p_type"
            ),
            on="id",
        )
        .select("id", F.col("p_name").alias("name"), "p_brand", "p_type")
    )
    # read by both blocking sides AND both attribute fetches — left
    # lazy, each consumer replans the canonicalization (part scan +
    # dedup join): 8 scans in the executed plan, 0 after
    canon = canon.transform(pin)
    cand = blocked_pairs(canon, "id", "name")
    attrs_a = canon.select(
        F.col("id").alias("id_a"), F.col("p_brand").alias("brand_a"), F.col("p_type").alias("type_a")
    )
    attrs_b = canon.select(
        F.col("id").alias("id_b"), F.col("p_brand").alias("brand_b"), F.col("p_type").alias("type_b")
    )
    pairs = cand.join(attrs_a, on="id_a").join(attrs_b, on="id_b")
    scored = linkage_scores(
        pairs,
        {
            "name_close": F.levenshtein("text_a", "text_b") <= 2,
            "brand_eq": F.col("brand_a") == F.col("brand_b"),
            "type_eq": F.col("type_a") == F.col("type_b"),
        },
    )
    return (
        scored.filter(F.col("match_weight") > 0)
        .select(
            "id_a", "id_b",
            "agree_name_close", "agree_brand_eq", "agree_type_eq",
            "match_weight",
        )
        .orderBy("id_a", "id_b")
    )


PARTS_LINKAGE_SQL = """
WITH canon AS (
  SELECT n.id, n.p_name AS name, p.p_brand, p.p_type
  FROM (SELECT p_name, MIN(p_partkey) AS id FROM part GROUP BY p_name) n
  JOIN part p ON p.p_partkey = n.id
), grams AS (
  SELECT id, name, p_brand, p_type,
         unnest(list_distinct([substr(name, i, 3) for i in range(1, GREATEST(length(name)-1, 1))])) AS g
  FROM canon
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
                  a.p_brand AS brand_a, b.p_brand AS brand_b,
                  a.p_type AS type_a, b.p_type AS type_b
  FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
), flags AS (
  SELECT id_a, id_b,
         CAST(levenshtein(name_a, name_b) <= 2 AS INT) AS agree_name_close,
         CAST(brand_a = brand_b AS INT) AS agree_brand_eq,
         CAST(type_a = type_b AS INT) AS agree_type_eq
  FROM cand
)
SELECT id_a, id_b, agree_name_close, agree_brand_eq, agree_type_eq,
       FLOOR((CASE WHEN agree_name_close = 1 THEN 4.247927513443585::DOUBLE ELSE -4.247927513443584::DOUBLE END + CASE WHEN agree_brand_eq = 1 THEN 3.169925001442312::DOUBLE ELSE -3.1699250014423126::DOUBLE END + CASE WHEN agree_type_eq = 1 THEN 2.0874628412503395::DOUBLE ELSE -2.4150374992788435::DOUBLE END) * 10000 + 0.5) / 10000 AS match_weight
FROM flags
WHERE FLOOR((CASE WHEN agree_name_close = 1 THEN 4.247927513443585::DOUBLE ELSE -4.247927513443584::DOUBLE END + CASE WHEN agree_brand_eq = 1 THEN 3.169925001442312::DOUBLE ELSE -3.1699250014423126::DOUBLE END + CASE WHEN agree_type_eq = 1 THEN 2.0874628412503395::DOUBLE ELSE -2.4150374992788435::DOUBLE END) * 10000 + 0.5) / 10000 > 0
ORDER BY id_a, id_b
"""


#: proximity benchmark pair + window (tokens apart)
PROX_A, PROX_B, PROX_WINDOW = "dup", "spark", 5


def proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval: documents where '{dup}' and '{spark}'
    occur within 5 tokens, ranked by minimum distance — the
    middle ground between bag-of-terms BM25 and exact phrase match.
    Shuffle-free codegen array scan (operators/search.
    proximity_min_distance); top-k via orderBy().limit()."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.text import tokens

    from degdb_spark.operators.balance import rebalance_for_compute

    docs = load_table(spark, sf_dir, "documents")
    # same single-task hazard as phrase_search: spread the scan first
    toked = rebalance_for_compute(docs).select(
        "doc_id", tokens("text").alias("_t")
    )
    # cheap membership gate first: position arrays only materialize for
    # docs containing BOTH terms (array_contains is a single scan per
    # doc; the position cross-product is the expensive part)
    cand = toked.filter(
        F.array_contains("_t", PROX_A) & F.array_contains("_t", PROX_B)
    )
    scored = cand.select(
        "doc_id",
        S.proximity_min_distance(F.col("_t"), PROX_A, PROX_B).alias("min_dist"),
    )
    # window filter after the top-k (the phrase_search device): ascending
    # (min_dist, doc_id) top-25 then <= window trims the identical rows
    # a pre-limit filter would, without pushing the position
    # cross-product below the rebalance exchange. The cheap
    # array_contains membership gate above stays a pre-limit filter on
    # purpose — that one we WANT pushed into the scan.
    return (
        scored.orderBy("min_dist", "doc_id")
        .limit(25)
        .filter(F.col("min_dist") <= PROX_WINDOW)
    )


#: hybrid-retrieval fixture: the dense query vector (a corpus member,
#: self-excluded by brute_force_topk) fused with the BM25 terms above.
HYBRID_DENSE_QID = 7
_HYBRID_LIST_K, _HYBRID_TOP = 20, 15


def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — Reciprocal-Rank Fusion of a lexical and a
    dense ranking (operators/search.rrf_fuse, Cormack et al. 2009
    k=60): BM25 top-20 for the benchmark terms fused with exact
    cosine top-20 around embedding #7 (vec_id ↔ doc_id — the synthetic
    tables' shared id space). The op every RAG/retrieval pipeline
    runs; scores are exact integer nano-units (no float summation
    order anywhere), so every fused rank and agreement count
    hash-certifies. The oracle replays BOTH rankings (the BM25
    pipeline and the brute-force cosine ranking) and the integer
    fusion."""
    from degdb_spark.operators.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = S.bm25_topk(docs, BM25_TERMS, k=_HYBRID_LIST_K).select("doc_id", "rank")
    from pyspark.sql import functions as F

    dense = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == HYBRID_DENSE_QID), k=_HYBRID_LIST_K
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return S.rrf_fuse([lex, dense], top=_HYBRID_TOP)


def _hybrid_sql() -> str:
    bm25 = S.bm25_sql(BM25_TERMS, k=_HYBRID_LIST_K)
    return f"""
WITH lex AS MATERIALIZED (
  SELECT doc_id, rank FROM ({bm25}) _b
),
dense AS MATERIALIZED (
  SELECT neighbor_id AS doc_id, rank FROM (
    SELECT neighbor_id,
           ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS rank
    FROM (
      SELECT neighbor_id,
             FLOOR((list_dot_product(qv, cv) /
                    (sqrt(list_dot_product(qv, qv)) *
                     sqrt(list_dot_product(cv, cv)))) * 10000 + 0.5)
               / 10000 AS sim
      FROM (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id <> {HYBRID_DENSE_QID}) c
      CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = {HYBRID_DENSE_QID}) q
    )
  ) WHERE rank <= {_HYBRID_LIST_K}
),
u AS (
  -- rrf_fuse reduces each input to its best rank per doc before the
  -- union (identity here: both lists are rank-unique) — replayed so
  -- the oracle certifies the same fusion plan.
  SELECT doc_id, MIN(rank) AS rank FROM lex GROUP BY doc_id
  UNION ALL
  SELECT doc_id, MIN(rank) AS rank FROM dense GROUP BY doc_id
),
f AS (
  SELECT doc_id,
         CAST(SUM((2000000000 + (60 + rank)) // (2 * (60 + rank))) AS BIGINT)
           AS rrf_nano,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM u GROUP BY doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_nano DESC, doc_id) AS BIGINT) AS rank,
       doc_id, n_lists, rrf_nano
FROM f ORDER BY rank LIMIT {_HYBRID_TOP}
"""


QUERIES: dict[str, Query] = {
    "docs_bm25_search": Query(bm25_search, S.bm25_sql(BM25_TERMS, k=25)),
    "docs_hybrid_search": Query(hybrid_search, _hybrid_sql()),
    "docs_proximity_search": Query(
        proximity_search, S.proximity_sql(PROX_A, PROX_B, PROX_WINDOW, k=25)
    ),
    "parts_fuzzy_match": Query(parts_fuzzy_match, FUZZY_MATCH_SQL),
    "docs_phrase_search": Query(phrase_search, S.phrase_sql(PHRASE, k=25)),
    "docs_phrase_search_indexed": Query(
        phrase_search_indexed, S.phrase_sql(PHRASE, k=25)
    ),
    "docs_proximity_search_indexed": Query(
        proximity_search_indexed, S.proximity_sql(PROX_A, PROX_B, PROX_WINDOW, k=25)
    ),
    "parts_linkage_scores": Query(parts_linkage_scores, PARTS_LINKAGE_SQL),
}
