"""End-to-end training-data curation pipeline.

Chains the individually oracle-checked operators into the standard
pretraining-corpus run — the workflow a user of this engine actually
executes nightly:

    rule filters → exact dedup → near-dup cluster keep-policy →
    global span dedup (boilerplate rewrite) → benchmark
    decontamination → quality-ordered token-budget selection
    → train/test split → sequence packing

Every stage is the operator documented in SCALE.md (no new plan
shapes); the pipeline's own contribution is the staging discipline:

- each stage's survivor frame is eagerly pin()ned before the
  next stage (stages 3-5 each consume the prior frame 2-3 times — the
  same 3x-recompute trap setsim_join had);
- stage counts come from the checkpointed frames, so the audit report
  never re-runs a stage;
- outputs are written once at the end (curated corpus + packing
  placements + a JSON stage report).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from degdb_spark.persistence import pin


def paragraph_dedup_stage(
    s2: DataFrame, keep_cols: list[str] | None = None
) -> DataFrame:
    """Curate stage 2b, module-level so its keep/drop semantics are
    directly testable: CCNet paragraph dedup applied as a REWRITE
    stage. Docs that lost some (but not all) paragraphs are rewritten
    to the deduped text with token/char counts refreshed; fully-
    duplicated docs (n_paras > 0, n_kept == 0) drop out; docs with NO
    paragraphs at all (whitespace-only text — n_paras == 0) pass
    through untouched, because nothing about them is duplicated
    (ADVICE r12 — the rule gate upstream, not dedup, judges empties)."""
    from degdb_spark.operators.dedup import paragraph_dedup
    from degdb_spark.operators.text import token_count

    if keep_cols is None:
        keep_cols = s2.columns
    paras = paragraph_dedup(s2).filter(
        (F.col("n_kept") > 0) | (F.col("n_paras") == 0)
    )
    return (
        s2.join(
            paras.select("doc_id", "n_paras", "n_kept", "text_clean"),
            on="doc_id",
        )
        .withColumn(
            "text",
            F.when(
                F.col("n_kept") < F.col("n_paras"), F.col("text_clean")
            ).otherwise(F.col("text")),
        )
        .withColumn("n_tokens", token_count("text").cast("long"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .select(*keep_cols)
    )


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    neardup_threshold: float = 0.4,
    budget_div: int = 4,
    pack_budget: int = 256,
    rewrite_dedup: str = "span",
    substring_min_tokens: int = 20,
    packing: str = "concat",
) -> list[dict]:
    """Run the full curation pipeline over ``sf_dir``/documents.

    The benchmark (eval) set for decontamination follows the repo's
    contract-query convention: every 25th doc is held out and the rest
    is the training corpus. Returns the per-stage audit report (list of
    {stage, n_docs, n_tokens}); if ``out_dir`` is set, also writes
    ``corpus.parquet``, ``packing.parquet``, and ``report.json``.

    ``rewrite_dedup`` picks the stage-3b rewrite: "span" (C4-style
    aligned 10-token spans — the default, byte-pinned in tests) or
    "substring" (ExactSubstr variable-length ≥ ``substring_min_tokens``
    repeats at ANY offset, operators/dedup.substring_dedup — strictly
    stronger boilerplate removal at the cost of the stride-1 window
    pass).

    ``packing`` picks the final placement strategy: "concat"
    (concat-and-chunk — fills every window, truncates straddlers) or
    "bestfit" (document-preserving harmonic length classes,
    operators/packing.pack_bestfit — zero split in-budget docs; the
    report's n_windows then counts best-fit bins and adds the
    oversize-doc truncation workload).
    """
    if rewrite_dedup not in ("span", "substring"):
        raise ValueError(f"rewrite_dedup must be 'span' or 'substring', got {rewrite_dedup!r}")
    if packing not in ("concat", "bestfit"):
        raise ValueError(f"packing must be 'concat' or 'bestfit', got {packing!r}")
    from degdb_spark.catalog import load_table
    from degdb_spark.operators.dedup import (
        contamination_report,
        dedup_clusters,
        exact_dedup,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from degdb_spark.operators.packing import pack_bestfit, pack_documents
    from degdb_spark.operators.ranking import global_running_sum
    from degdb_spark.operators.sampling import train_test_split
    from degdb_spark.operators.text import filter_rules, token_count

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    corpus = docs.filter(F.col("doc_id") % 25 != 0)

    report: list[dict] = []

    def audit(stage: str, df: DataFrame) -> DataFrame:
        df = df.transform(pin, eager=True)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
        ).collect()[0]
        report.append(
            {"stage": stage, "n_docs": int(row["n"]), "n_tokens": int(row["t"])}
        )
        return df

    # stage 0+1: quality/repetition features + Gopher/C4 rule gate
    flagged = filter_rules(corpus)
    keep_cols = [
        "doc_id", "text", "lang", "source", "n_chars",
        "n_tokens", "quality_score",
    ]
    s1 = audit("rule_filters", flagged.filter("passes_all").select(*keep_cols))

    # stage 2: exact dedup (min-id per normalized fingerprint)
    s2 = audit("exact_dedup", exact_dedup(s1))

    # stage 2b: CCNet paragraph dedup (Wenzek et al. §3.1 — their first
    # dedup rung): drop every repeated NORMALIZED paragraph after its
    # first (doc, position) occurrence, corpus-wide. Runs after the
    # cheaper whole-doc rungs (rules are a scan, exact dedup one hash
    # agg on an already-computed fingerprint) and before near-dup
    # clustering so shingling never pays for boilerplate paragraphs.
    # Same rewrite discipline as stage 3b: only docs that LOST a
    # paragraph are rewritten; fully-duplicated docs drop out. A doc
    # with NO paragraphs at all (whitespace-only text) has n_kept = 0
    # but nothing duplicated — it survives this stage (ADVICE r12);
    # earlier rule filters are where empty docs are judged.
    s2 = audit("paragraph_dedup", paragraph_dedup_stage(s2, keep_cols))

    # stage 3: near-dup clusters, keep one representative per component
    pairs = ngram_jaccard_pairs(
        s2, candidates=minhash_lsh_candidates(s2), threshold=neardup_threshold
    )
    clusters = dedup_clusters(s2, pairs)
    s3 = audit(
        "neardup_clusters",
        s2.join(
            clusters.filter("kept").select("doc_id"), on="doc_id", how="left_semi"
        ),
    )

    # stage 3b: C4-style global span dedup — rewrite the survivors by
    # dropping corpus-wide repeated 10-token spans (boilerplate), AFTER
    # doc-level dedup (so the rewrite never pays for whole near-dup
    # docs) and BEFORE selection (so the token budget counts only text
    # that will actually be trained on). Only docs that actually LOST a
    # span are rewritten (the rewrite is token-normalized: lowercased,
    # whitespace-collapsed); untouched docs keep their original text
    # byte-for-byte. Token/char counts are recomputed for rewritten
    # docs; fully-boilerplate docs drop out.
    from degdb_spark.operators.dedup import span_dedup, substring_dedup

    if rewrite_dedup == "substring":
        # ExactSubstr mode: repeats removed at ANY offset/length; docs
        # reduced to nothing drop out, partially-hit docs are rewritten
        rep = (
            substring_dedup(s3, min_tokens=substring_min_tokens)
            .select(
                "doc_id",
                F.col("n_tokens").alias("_sub_total"),
                F.col("n_removed").alias("_sub_removed"),
                "text_clean",
            )
            .filter(F.col("_sub_removed") < F.col("_sub_total"))
        )
        rewritten = F.col("_sub_removed") > 0
        join_src = rep
    else:
        spans = span_dedup(s3).filter(F.col("n_kept") > 0)
        rewritten = F.col("n_kept") < F.col("n_spans")
        join_src = spans.select("doc_id", "n_spans", "n_kept", "text_clean")
    cleaned = (
        s3.join(join_src, on="doc_id")
        .withColumn(
            "text",
            F.when(rewritten, F.col("text_clean")).otherwise(F.col("text")),
        )
        .withColumn("n_tokens", token_count("text").cast("long"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .select(*keep_cols)
    )
    s3b = audit(f"{rewrite_dedup}_dedup", cleaned)

    # stage 4: benchmark decontamination (3-gram overlap)
    contam = contamination_report(s3b, bench)
    s4 = audit(
        "decontaminate",
        s3b.join(
            contam.filter(~F.col("contaminated")).select("doc_id"),
            on="doc_id",
            how="left_semi",
        ),
    )

    # stage 5: quality-ordered token-budget selection (best 1/budget_div
    # of surviving tokens; two-phase running sum, broadcast budget)
    cum = global_running_sum(
        s4,
        [F.col("quality_score").desc(), F.col("doc_id")],
        "n_tokens",
        sum_name="cum_tokens",
    )
    total = s4.agg(F.sum("n_tokens").alias("_total"))
    s5 = audit(
        "token_budget",
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("cum_tokens") <= F.expr(f"_total DIV {budget_div}"))
        .select(*keep_cols),
    )

    # stage 6: split + packing placements
    final = train_test_split(s5, "doc_id")
    if packing == "bestfit":
        placements = pack_bestfit(final, budget=pack_budget).transform(
            pin, eager=True
        )
        row = placements.agg(
            F.coalesce(F.max("pack_id") + 1, F.lit(0)).alias("w"),
            F.coalesce(
                F.sum(F.col("oversize").cast("int")), F.lit(0)
            ).alias("o"),
        ).collect()[0]
        n_windows, n_oversize = int(row["w"]), int(row["o"])
    else:
        placements = pack_documents(final, budget=pack_budget)
        n_windows = int(
            placements.agg(
                F.coalesce(
                    F.expr(f"(sum(n_tokens) + {pack_budget - 1}) DIV {pack_budget}"),
                    F.lit(0),
                ).alias("w")
            ).collect()[0]["w"]
        )
        n_oversize = None
    stage_row = {
        "stage": "packed",
        "n_docs": report[-1]["n_docs"],
        "n_tokens": report[-1]["n_tokens"],
        "n_windows": n_windows,
    }
    if n_oversize is not None:
        stage_row["n_oversize_docs"] = n_oversize
    report.append(stage_row)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        final.write.mode("overwrite").parquet(os.path.join(out_dir, "corpus.parquet"))
        placements.write.mode("overwrite").parquet(
            os.path.join(out_dir, "packing.parquet")
        )
        import json

        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
    return report


def curate_media(
    spark: SparkSession,
    media: DataFrame,
    out_dir: str | None = None,
    min_shared_shots: int = 2,
) -> list[dict]:
    """The MEDIA twin of :func:`curate` — the nightly run a multimodal
    training-data pipeline executes over an image/audio/video table:

        codec validation (strict decode through the real codecs,
        bad payloads quarantined as rows) →
        exact dedup (payload md5, min-id representative) →
        fingerprintability gate (images 8-divisible, audio ≥64
        samples, videos with ≥1 decodable ≥8×8 shot) →
        perceptual near-dup keep-policy per modality
        (images/audio: banded aHash pairs; videos: SHOT-level
        overlap — the trim-robust path — via shot_overlap_neardups)
        → one representative per connected component.

    Every stage is an individually verified operator
    (operators/multimodal.py + the shared dedup_clusters components
    loop); the pipeline's contribution is the staging discipline of
    :func:`curate` — each survivor frame is eagerly pinned, audits
    read the pinned frames, outputs are written once at the end.
    Returns the per-stage report ({stage, n_items, n_bytes}); with
    ``out_dir`` also writes ``curated.parquet`` and ``report.json``.
    """
    from degdb_spark.operators.dedup import dedup_clusters
    from degdb_spark.operators.multimodal import (
        audio_ahash,
        audio_sample_stats,
        banded_neardup_pairs,
        image_ahash,
        image_pixel_stats,
        image_quality,
        shot_overlap_neardups,
        validate_media,
        video_shot_fingerprints,
    )

    report: list[dict] = []
    media = media.transform(pin, eager=True)

    def audit(stage: str, df: DataFrame) -> DataFrame:
        df = df.transform(pin, eager=True)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.length("payload")), F.lit(0)).alias("b"),
        ).collect()[0]
        report.append(
            {"stage": stage, "n_items": int(row["n"]), "n_bytes": int(row["b"])}
        )
        return df

    # stage 1: strict codec validation — quarantine undecodable payloads
    valid_ids = validate_media(media).filter("ok = 1").select("media_id")
    s1 = audit("validated", media.join(valid_ids, "media_id", "left_semi"))

    # stage 1b: image quality gate (VERDICT r12 missing #5) — blurry
    # (variance-of-Laplacian) and flat (dominant-gray) images are
    # quarantined like undecodable payloads; audio/video pass through.
    # Integer flags off the same decode seam, one mapInPandas pass.
    bad_imgs = image_quality(s1).filter("blurry OR flat").select("media_id")
    s1 = audit("image_quality", s1.join(bad_imgs, "media_id", "left_anti"))

    # stage 2: exact dedup on payload bytes (min-id per md5 digest)
    keep_exact = (
        s1.select("media_id", F.md5(F.col("payload")).alias("_digest"))
        .groupBy("_digest")
        .agg(F.min("media_id").alias("media_id"))
        .select("media_id")
    )
    s2 = audit("exact_dedup", s1.join(keep_exact, "media_id", "left_semi"))

    # stage 3: fingerprintability gate, per modality
    img_ok = (
        image_pixel_stats(s2)
        .filter((F.col("width") % 8 == 0) & (F.col("height") % 8 == 0))
        .select("media_id")
    )
    aud_ok = audio_sample_stats(s2).filter("n_samples >= 64").select("media_id")
    shots = video_shot_fingerprints(s2).transform(pin, eager=True)
    vid_ok = shots.filter("shot_idx >= 0").select("media_id").distinct()
    s3 = audit(
        "fingerprintable",
        s2.join(img_ok.union(aud_ok).union(vid_ok), "media_id", "left_semi"),
    )

    # stage 4: perceptual near-dup keep-policy, one representative per
    # connected component; videos pair at the SHOT level (trim-robust)
    img_pairs = banded_neardup_pairs(
        image_ahash(s3.filter("kind = 'image'"))
    ).filter("near_dup = 1")
    aud_pairs = banded_neardup_pairs(
        audio_ahash(s3.filter("kind = 'audio'"))
    ).filter("near_dup = 1")
    vid_pairs = shot_overlap_neardups(
        shots.join(s3.select("media_id"), "media_id", "left_semi"),
        min_shared=min_shared_shots,
    ).filter("near_dup = 1")
    pairs = (
        img_pairs.select("id_a", "id_b")
        .unionByName(aud_pairs.select("id_a", "id_b"))
        .unionByName(vid_pairs.select("id_a", "id_b"))
    )
    clusters = dedup_clusters(
        s3.select(F.col("media_id")), pairs, id_col="media_id"
    )
    s4 = audit(
        "neardup_keep",
        s3.join(
            clusters.filter("kept").select("media_id"), "media_id", "left_semi"
        ),
    )

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        s4.write.mode("overwrite").parquet(os.path.join(out_dir, "curated.parquet"))
        import json

        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
    return report
