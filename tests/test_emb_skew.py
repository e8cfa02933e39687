"""Skewed-corpus property tier for the embeddings family (VERDICT r6
ask #6 — the embeddings twin of tests/test_graph_skew.py and
tests/test_text_skew.py).

Real embedding corpora cluster hard: one semantic neighborhood (memes,
boilerplate pages, near-identical product shots) can own ~90% of the
vectors, and one crawl domain can own ~90% of a DSIR run's documents.
The sf testdata is too uniform to exercise the per-cell work bounds
SCALE.md claims, so this tier synthesizes the skew and asserts:

1. SemDeDup on a one-hot-cell corpus stays an EQUI-join on cell (no
   CartesianProduct even when one cell holds 90% of vectors), its
   keep policy is exact on planted duplicate neighborhoods inside the
   hot cell, and the paper's k-scaling story is real: raising k splits
   the hot cell, shrinking the max per-cell population (the quadratic
   pair term the operator pays).
2. IVF probe/re-rank with pinned centroids returns EXACT brute-force
   cosine top-k on the skewed corpus when the probes cover the hot
   cell — skew moves the straggler partition, not the answer.
3. DSIR with a 90%-dominant TARGET domain keeps its count state
   bounded (≤ DSIR_BUCKETS) and still orders non-target docs by
   domain fit — dominance shrinks the LLR magnitudes, never flips the
   ranking.

Corpus geometry (DIM=10): the hot neighborhood hugs e0 — 15 groups of
12 copies each (180 vectors, 90%). Group g's direction is
e0 + 0.5·(e_a+e_b)/√2 over distinct dim pairs from 1-6; copies are the
same direction scaled, so WITHIN a group cosine is exactly 1 (a planted
duplicate neighborhood) while BETWEEN groups it is ≤ (1+0.25·0.5)/1.25
= 0.9 — far below any dedup threshold. The 20 cold vectors live on
dims 7-9 with distinct secondary components, firmly in the other cell.
"""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

DIM = 10
N_GROUPS = 15  # C(6,2) dim pairs from dims 1-6
COPIES = 12


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _group_dirs():
    pairs = [(a, b) for a in range(1, 7) for b in range(a + 1, 7)]
    dirs = []
    for a, b in pairs[:N_GROUPS]:
        v = [0.0] * DIM
        v[0] = 1.0
        v[a] = 0.5 / math.sqrt(2.0)
        v[b] = 0.5 / math.sqrt(2.0)
        dirs.append(v)
    return dirs


def _hot_cell_corpus():
    rows = []
    vid = 0
    for g, d in enumerate(_group_dirs()):
        for j in range(COPIES):
            s = 1.0 + 0.1 * j  # same direction, different magnitude
            rows.append(Row(vec_id=vid, embedding=[s * x for x in d]))
            vid += 1
    for i in range(20):  # cold cell: dims 7-9, distinct secondaries
        v = [0.0] * DIM
        v[7 + i % 3] = 1.0
        v[7 + (i + 1) % 3] = 0.3 + 0.05 * (i // 3)
        rows.append(Row(vec_id=2000 + i, embedding=v))
    return rows


_C_HOT = [1.0] + [0.0] * (DIM - 1)
_C_COLD = [0.0] * 7 + [0.5, 0.5, 0.5]
_CENTROIDS_K2 = [_C_HOT, _C_COLD]
# k=3: split the hot neighborhood by whether the group touches dim 1
_C_HOT_DIM1 = [1.0, 0.35] + [0.0] * (DIM - 2)
_CENTROIDS_K3 = [_C_HOT_DIM1, _C_HOT, _C_COLD]


def test_semantic_dedup_hot_cell_equijoin_and_exact_keep(spark):
    from degdb_spark.operators.ml_lsh import semantic_dedup

    emb = spark.createDataFrame(_hot_cell_corpus())
    out = semantic_dedup(emb, _CENTROIDS_K2, threshold=0.9999)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    rows = {r.cell: r for r in out.collect()}
    hot = rows[0]
    # the skew is real: 90% of the corpus shares the hot cell
    assert hot.n_vectors == N_GROUPS * COPIES == 180
    # exact keep policy: each group is one duplicate neighborhood
    # (within-group cosine exactly 1), between-group cosine ≤ 0.9 —
    # exactly one survivor per group
    assert hot.n_kept == N_GROUPS
    assert hot.n_dropped == N_GROUPS * (COPIES - 1)
    # cold cell: secondary components differ by ≥0.05, cosines stay
    # below threshold — nothing dropped
    assert rows[1].n_vectors == 20 and rows[1].n_dropped == 0


def test_semantic_dedup_k_scaling_splits_hot_cell(spark):
    """The paper's regime: a hot cell is fixed by raising k, not by
    the operator — more centroids must shrink the max per-cell
    population (the quadratic pair term)."""
    from degdb_spark.operators.ml_lsh import _semantic_assigned

    emb = spark.createDataFrame(_hot_cell_corpus())

    def max_cell(cents):
        return (
            _semantic_assigned(emb, cents)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .first()[0]
        )

    m2, m3 = max_cell(_CENTROIDS_K2), max_cell(_CENTROIDS_K3)
    assert m2 == 180
    # 5 of 15 groups touch dim 1 and peel off to the new centroid
    assert m3 == (N_GROUPS - 5) * COPIES == 120
    assert m3 < 0.75 * m2


def _brute_topk(rows, qid, k):
    """Brute-force cosine top-k replicating the operator's 4-dp
    FLOOR-rounding and (cos desc, id asc) tie order."""
    by_id = {r.vec_id: r.embedding for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    q = by_id[qid]
    scored = [
        (math.floor(cos(q, v) * 10000 + 0.5) / 10000, i)
        for i, v in by_id.items()
        if i != qid
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in scored[:k]]


def test_ivf_fixed_exact_topk_on_hot_cell(spark):
    """Probe/re-rank answers on the skewed corpus must equal
    brute-force cosine top-k — for a hot-cell query (whose cell holds
    90% of the corpus) and a cold one — when n_probe covers the
    cells."""
    from degdb_spark.operators.ml_lsh import ivf_topk_fixed

    rows = _hot_cell_corpus()
    emb = spark.createDataFrame(rows)
    queries = emb.filter(F.col("vec_id").isin(0, 2003))
    got = ivf_topk_fixed(
        emb, queries, _CENTROIDS_K2, k=5, n_probe=2, broadcast_probes=True
    ).collect()
    for qid in (0, 2003):
        got_ids = [
            r.neighbor_id
            for r in sorted((r for r in got if r.query_id == qid), key=lambda r: r.rank)
        ]
        assert got_ids == _brute_topk(rows, qid, 5), (qid, got_ids)


def test_dsir_bounded_state_and_ranking_under_target_dominance(spark, tmp_path):
    """90% of docs in the TARGET domain: the bucket state stays bounded
    and a target-like non-target doc still outranks an out-of-domain
    one."""
    from degdb_spark.operators.text import (
        DSIR_BUCKETS,
        dsir_occurrences,
        dsir_word_counts,
    )
    from degdb_spark.queries.text_queries import dsir_selection

    rows = []
    for i in range(360):  # dominant target: speaks alpha/beta + filler
        rows.append(
            Row(
                doc_id=i,
                text=f"alpha beta filler{i}",
                lang="en",
                source="src0",
                n_chars=20,
            )
        )
    rows.append(Row(doc_id=5000, text="alpha beta alpha", lang="en", source="src1", n_chars=16))
    rows.append(Row(doc_id=5001, text="zeta eta theta", lang="en", source="src1", n_chars=14))
    docs = spark.createDataFrame(rows)
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    counts = dsir_word_counts(dsir_occurrences(docs), "src0")
    assert counts.count() <= DSIR_BUCKETS

    got = {r.doc_id: r.dsir_score for r in dsir_selection(spark, str(tmp_path)).collect()}
    assert set(got) == {5000, 5001}, got
    assert got[5000] > got[5001], got


# ---- property tier: random vectors, full-probe IVF == brute force -----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _random_vectors(draw):
    n = draw(st.integers(min_value=3, max_value=14))
    vecs = []
    for i in range(n):
        v = draw(
            st.lists(
                st.integers(min_value=-4, max_value=4).map(lambda x: x / 2.0),
                min_size=4,
                max_size=4,
            )
        )
        if not any(v):
            v = [1.0, 0.0, 0.0, 0.0]  # keep norms nonzero
        vecs.append(v)
    return vecs


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_random_vectors())
def test_ivf_full_probe_equals_bruteforce(spark, vecs):
    """The IVF law the probe parameter trades against: with n_probe =
    #cells (no pruning at all), probe/re-rank must equal brute-force
    cosine top-k on ANY corpus — every divergence would be a bug in
    assignment, probing, or re-rank, not an approximation."""
    from pyspark.sql import Row

    from degdb_spark.operators.ml_lsh import ivf_topk_fixed

    rows = [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows)
    cents = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
    ]
    queries = emb.filter(F.col("vec_id") == 0)
    got = [
        r.neighbor_id
        for r in ivf_topk_fixed(
            emb, queries, cents, k=3, n_probe=len(cents), broadcast_probes=True
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == _brute_topk(rows, 0, 3)


def test_knn_graph_reverse_cap_bounds_hub_candidates(spark):
    """Hub-skew tier for NN-Descent (VERDICT r11 "What's wrong" #1):
    one vector sits inside EVERYONE's top-k, so its reverse
    (in-)degree is n-1 — the shape that made the uncapped local join
    quadratic on one pivot key. Asserts (a) capped_reverse really
    clips every pivot to rho*k rows (so per-pivot general-neighbor
    membership is <= (1+rho)*k and candidates <= ((1+rho)k)^2), and
    (b) the capped full run still equals the Python replica on the
    hub corpus — skew moves the work bound, not correctness.

    Corpus: v0 = e0; v_i = e0 + 0.5*e_i (its OWN residual dim) so
    cos(v_i, v0) = 1/sqrt(1.25) ~ 0.894 while cos(v_i, v_j) =
    1/1.25 = 0.8 — the hub strictly outranks every other neighbor
    for every vector."""
    import numpy as np

    from degdb_spark.operators.knngraph import capped_reverse, knn_graph_descent
    from tests.test_similarity import _knn_graph_replica, _state_rows

    n, k, rounds, rho = 120, 4, 2, 1
    V = np.zeros((n, n), dtype=np.float64)
    V[0, 0] = 1.0
    for i in range(1, n):
        V[i, 0] = 1.0
        V[i, i] = 0.5
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )

    # (a) the cap itself, on a state where v0's in-degree is n-1
    state = spark.createDataFrame(
        [(i, 0, 0.707107) for i in range(1, n)]
        + [(i, 1 + i % 7, 0.5) for i in range(1, n)],
        "id long, nbr long, sim double",
    )
    rev_in_degree = (
        state.groupBy("nbr").count().orderBy(F.desc("count")).first()
    )
    assert rev_in_degree["nbr"] == 0 and rev_in_degree["count"] == n - 1
    capped = capped_reverse(state, cap=rho * k)
    per_pivot = {r["id"]: r["cnt"] for r in
                 capped.groupBy("id").agg(F.count("*").alias("cnt")).collect()}
    assert max(per_pivot.values()) <= rho * k  # the hub is clipped
    assert per_pivot[0] == rho * k

    # the slice is the deterministic md5 order the oracle replays
    import hashlib

    want_hub = sorted(
        range(1, n),
        key=lambda i: (hashlib.md5(f"0:{i}".encode()).hexdigest(), i),
    )[: rho * k]
    got_hub = sorted(
        r["nbr"] for r in capped.filter(F.col("id") == 0).collect()
    )
    assert got_hub == sorted(want_hub)

    # (b) end-to-end on the hub corpus: Spark == capped replica
    got = sorted(
        tuple(r)
        for r in knn_graph_descent(emb, k=k, rounds=rounds, rho=rho).collect()
    )
    want_state, _ = _knn_graph_replica(
        [list(map(float, row)) for row in V], k, rounds, rho=rho
    )
    assert got == _state_rows(want_state)
    # the hub strictly dominates: every vector that has discovered it
    # ranks it 1, and descent SPREADS it — its in-degree in the final
    # graph exceeds the ring init's k (the skew the cap defends against
    # grows in-plan, it is not an artifact of the synthetic state above)
    hub_rows = [r for r in got if r[0] != 0 and r[2] == 0]
    assert all(r[1] == 1 for r in hub_rows)
    assert len(hub_rows) > k
