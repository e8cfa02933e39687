"""In-plan unigram-LM (SentencePiece-style) tokenizer training.

The tokenizer family's second member (VERDICT r11 "What's missing"
#2): BPE (operators/text.bpe_train) learns merges bottom-up; modern
pipelines (T5, LLaMA) instead train a UNIGRAM LANGUAGE MODEL over a
candidate piece vocabulary (Kudo 2018, "Subword Regularization",
arXiv:1804.10959 §3): start from a large seed vocabulary, alternate
(E) segmenting the corpus under current piece costs with (M)
re-estimating costs from the resulting piece counts, and prune pieces
the segmentation stopped using. This is the hard-EM (Viterbi) member
of that family, deterministic end-to-end so the DuckDB oracle replays
every round:

- SEED: all substrings of length 1..max_piece over the word
  histogram, count-weighted; keep the top ``n_pieces`` by
  (count DESC, piece ASC) plus ALL single characters (segmentability
  invariant — every word always has at least its character
  segmentation).
- E-STEP (Viterbi): per histogram word, dp[i] = min over j=1..4 of
  dp[i-j] + cost(w[i-j+1..i]) with missing pieces at +INF; ties
  break to the SMALLEST j (checked in order). The dp fold and the
  backtrace both run as ONE codegen higher-order ``aggregate`` over
  the word — no UDF, no shuffle, corpus text untouched (the E-step
  reads the Heaps-bounded histogram, exactly like BPE training).
- M-STEP: piece counts = Σ n_w over backtraced pieces; survivors =
  counted pieces plus single characters floored at count 1 (the
  prune); cost(p) = −floor(ln(count_p / total)·10⁶ + 0.5) — integer
  MICRONATS (the operators/nb.py discipline), quantized before any
  comparison so segmentations cannot drift with float order.

Cross-engine exactness: costs are computed on the DRIVER with
CPython's libm ln (the same C library DuckDB calls, unlike JVM
Math.log) from integer (count, total) pairs both engines derive
identically; the per-round cost table re-enters the plan as ONE
``map(...)`` literal in a single F.expr (the ml_lsh
_centroid_struct_lit device — no py4j chatter, value-exact). Pieces
are [a-z]-only by the tokenizer's own split, so embedding them in SQL
literals needs no escaping (asserted).

Scale shape (100 TB): the corpus is scanned ONCE into the (word, n)
histogram (Heaps' law: ~10⁶-10⁷ distinct words); every EM round is
one codegen pass over that histogram plus one ≤|pieces| groupBy —
map-side combinable, model-sized collect per round (the
Lloyd/BPE/boost O(model)-driver-rows-per-round pattern). The piece
vocabulary is bounded by n_pieces + |alphabet|, broadcast-sized for
any real tokenizer (32k-256k pieces); at that size the map literal
becomes a broadcast-join lookup behind the same seam — the plan
shape, not the algorithm, is what changes.

Reference provenance: degdb has no tokenizer surface; training-
pipeline extension (SURVEY.md §2.6), companion to bpe_train whose
histogram input and round structure it shares.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.operators.nb import LOG_SCALE
from degdb_spark.persistence import lineage_cut

#: unreachable-path sentinel: far above any real path cost
#: (16 chars × ~30 ln-units × 10⁶ ≈ 5e8), far below bigint overflow
#: even summed 16 times with real costs on top.
INF_COST = 1_000_000_000_000_000

_PIECE_RE = re.compile(r"^[a-z]+$")


def _cost_map_expr(costs: dict[str, int]) -> str:
    """The round's piece→cost table as one map literal (sorted for a
    deterministic expr string)."""
    pairs = []
    for p in sorted(costs):
        assert _PIECE_RE.match(p), f"piece not [a-z]+: {p!r}"
        pairs.append(f"'{p}', {int(costs[p])}L")
    return "map(" + ", ".join(pairs) + ")"


def _dp_expr(m: str, max_piece: int) -> str:
    """Viterbi forward fold: dp as a 1-indexed array<bigint>,
    dp[i] at element i+1."""
    opts = []
    for j in range(1, max_piece + 1):
        look = (
            f"element_at(acc, i - {j - 1}) + coalesce("
            f"element_at({m}, substring(w, i - {j - 1}, {j})), {INF_COST}L)"
        )
        opts.append(look if j == 1 else f"if(i >= {j}, {look}, {INF_COST}L)")
    return (
        "aggregate(sequence(1, length(w)), array(cast(0 as bigint)),"
        f" (acc, i) -> array_append(acc, least({', '.join(opts)})))"
    )


def _backtrace_expr(m: str, max_piece: int) -> str:
    """Viterbi backtrace fold over the materialized dp column: emit
    the path's pieces (reverse order — counts don't care), preferring
    the SMALLEST j on ties (branches checked in order; the last
    branch needs no check — dp[pos] was a min over these options, so
    if j < max_piece all fail, the longest piece is the argmin)."""
    take = []
    for j in range(1, max_piece + 1):
        nxt = (
            f"named_struct('pos', acc.pos - {j}, 'ps',"
            f" array_append(acc.ps, substring(w, acc.pos - {j - 1}, {j})))"
        )
        if j == max_piece:
            take.append(nxt)
        else:
            cond = (
                f"acc.pos >= {j} and element_at(dp, acc.pos - {j - 1}) + "
                f"coalesce(element_at({m}, substring(w, acc.pos - {j - 1}, {j})),"
                f" {INF_COST}L) = element_at(dp, acc.pos + 1)"
            )
            take.append(f"if({cond}, {nxt}, ")
    chain = "".join(take) + ")" * (max_piece - 1)
    return (
        "aggregate(sequence(1, length(w)),"
        " named_struct('pos', length(w), 'ps', cast(array() as array<string>)),"
        f" (acc, x) -> if(acc.pos <= 0, acc, {chain})).ps"
    )


def _mstep(
    counted: dict[str, int], selected: dict[str, int]
) -> tuple[dict[str, int], dict[str, int]]:
    """Counts → (survivor counts, micronat costs). Survivors = counted
    pieces + single chars floored at 1 (never pruned); cost(p) =
    −floor(ln(cnt/total)·10⁶ + 0.5), CPython libm = DuckDB libm."""
    surv = {
        p: counted.get(p, 0)
        for p in selected
        if counted.get(p, 0) > 0 or len(p) == 1
    }
    for p in list(surv):
        if len(p) == 1 and surv[p] == 0:
            surv[p] = 1
    total = float(sum(surv.values()))
    costs = {
        p: -math.floor(math.log(c / total) * LOG_SCALE + 0.5)
        for p, c in surv.items()
    }
    return surv, costs


def segmented_words(hist: DataFrame, costs: dict[str, int], max_piece: int = 4) -> DataFrame:
    """(w, n, ps): every histogram word Viterbi-segmented under the
    given piece costs — the E-step frame, also the INFERENCE surface
    (encode with a trained vocabulary, the bpe_encode twin). Both
    folds run in one codegen pass; ``ps`` is the piece array in
    backtrace (reverse) order."""
    m = _cost_map_expr(costs)
    return hist.select(
        "w", "n", F.expr(_dp_expr(m, max_piece)).alias("dp")
    ).select("w", "n", F.expr(_backtrace_expr(m, max_piece)).alias("ps"))


def train_unigram(
    hist: DataFrame,
    n_pieces: int = 100,
    rounds: int = 2,
    max_piece: int = 4,
) -> tuple[dict[str, int], dict[str, int]]:
    """The training loop itself: returns (survivor counts, micronat
    costs) of the final model — the artifact segmented_words() and the
    report builders consume."""
    if rounds < 1:
        raise ValueError("unigram_train requires rounds >= 1")
    hist = hist.select("w", "n").transform(lineage_cut, eager=True)

    # SEED: substring counts, top-K ∪ single chars
    subs_expr = (
        "flatten(transform(sequence(1, length(w)), i ->"
        f" transform(sequence(1, least({max_piece}, length(w) - i + 1)),"
        " j -> substring(w, i, j))))"
    )
    subs = (
        hist.select(F.explode(F.expr(subs_expr)).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
        .transform(lineage_cut, eager=True)
    )
    seed_rows = (
        subs.orderBy(F.col("cnt").desc(), "piece")
        .limit(n_pieces)
        .unionByName(subs.filter(F.length("piece") == 1))
        .distinct()
        .collect()
    )
    if not seed_rows:
        raise ValueError("unigram_train needs a non-empty corpus")
    counted = {r["piece"]: int(r["cnt"]) for r in seed_rows}
    surv, costs = _mstep(counted, counted)

    for _ in range(rounds):
        seg = segmented_words(hist, costs, max_piece).select(
            "n", F.explode("ps").alias("piece")
        )
        counted = {
            r["piece"]: int(r["cnt"])
            for r in seg.groupBy("piece").agg(F.sum("n").alias("cnt")).collect()
        }
        surv, costs = _mstep(counted, surv)
    return surv, costs


def unigram_train_from_hist(
    hist: DataFrame,
    n_pieces: int = 100,
    rounds: int = 2,
    max_piece: int = 4,
    top: int = 30,
) -> DataFrame:
    """Unigram-LM training over an existing (w, n) word histogram (the
    retrain-from-index entry point, like bpe_train_from_hist).
    Returns the trained vocabulary's ``top`` pieces by
    (count DESC, piece ASC): (rank, piece, n, cost_micro)."""
    spark = hist.sparkSession
    surv, costs = train_unigram(
        hist, n_pieces=n_pieces, rounds=rounds, max_piece=max_piece
    )
    out = sorted(surv.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return spark.createDataFrame(
        [
            (i + 1, p, c, costs[p])
            for i, (p, c) in enumerate(out)
        ],
        "rank long, piece string, n long, cost_micro long",
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    n_pieces: int = 100,
    rounds: int = 2,
    max_piece: int = 4,
    top: int = 30,
) -> DataFrame:
    """unigram_train_from_hist over the corpus word histogram."""
    from degdb_spark.operators.text import word_histogram

    return unigram_train_from_hist(
        word_histogram(docs, text_col),
        n_pieces=n_pieces,
        rounds=rounds,
        max_piece=max_piece,
        top=top,
    )
