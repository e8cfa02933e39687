"""CLI surface (`python -m degdb_spark`) — the reference binary's verb
set adapted to Spark (main.go:15-20 flags; peers/disk are platform
concerns here)."""

from __future__ import annotations

import json

from degdb_spark.__main__ import main


def test_cli_query(spark, capsys):
    # get_spark() inside main() reuses the active test session
    rc = main(
        ["query", '[{"subj": "nation/7"}]', "--load-sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert {r["pred"] for r in rows} >= {"name", "in_region"}
    assert all(r["subj"] == "nation/7" for r in rows)


def test_cli_profile(spark, capsys):
    import json

    from degdb_spark.__main__ import main

    rc = main(["profile", "region", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    by_col = {r["col_name"]: r for r in rows}
    assert by_col["r_regionkey"]["n_distinct"] == 5
    assert by_col["r_regionkey"]["n_nulls"] == 0


def test_cli_sql(spark, capsys):
    import json

    from degdb_spark.__main__ import main

    rc = main([
        "sql",
        "SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 5 and all(r["n"] == 1 for r in rows)


def test_cli_search(capsys, spark):
    import json as _json

    from degdb_spark.__main__ import main

    rc = main(["search", "dup spark", "--sf-dir", "/root/testdata/sf0.001", "-k", "3"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [_json.loads(l) for l in lines]
    assert len(rows) == 3
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert all("snippet" in r and r["score"] > 0 for r in rows)


def test_cli_dedup_report(capsys, spark):
    import json as _json

    from degdb_spark.__main__ import main

    rc = main(["dedup-report", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [_json.loads(l) for l in lines]
    assert rows and all(
        set(r) == {"source", "n_docs", "n_neardup_docs", "dup_rate"} for r in rows
    )
    assert all(0.0 <= r["dup_rate"] <= 1.0 for r in rows)


def test_cli_pipeline(capsys, spark, tmp_path):
    import json as _json
    import os as _os

    from degdb_spark.__main__ import main

    out = str(tmp_path / "curated")
    rc = main(["pipeline", "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [_json.loads(l) for l in lines]
    stages = [r["stage"] for r in rows]
    assert stages == [
        "rule_filters", "exact_dedup", "paragraph_dedup",
        "neardup_clusters", "span_dedup",
        "decontaminate", "token_budget", "packed",
    ]
    # survivors shrink (or stay equal) at every gate; budget stage cuts hard
    counts = [r["n_docs"] for r in rows[:7]]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert rows[6]["n_tokens"] <= rows[5]["n_tokens"] // 4 + 1
    assert rows[7]["n_windows"] > 0
    # outputs written
    assert _os.path.exists(_os.path.join(out, "report.json"))
    assert _os.path.isdir(_os.path.join(out, "corpus.parquet"))
    assert _os.path.isdir(_os.path.join(out, "packing.parquet"))
    curated = spark.read.parquet(_os.path.join(out, "corpus.parquet"))
    assert curated.count() == rows[6]["n_docs"]
    assert "split" in curated.columns
    # span-dedup rewrites ONLY docs that lost a span: every curated doc
    # that kept all its spans must carry its ORIGINAL text (casing,
    # punctuation, whitespace intact), not a token-normalized rewrite
    from pyspark.sql import functions as F

    orig = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.col("text").alias("_orig")
    )
    joined = curated.join(orig, on="doc_id").select("text", "_orig")
    untouched = joined.filter(F.col("text") == F.col("_orig")).count()
    assert untouched > 0, "some docs must survive span dedup unrewritten"


def test_cli_media_pipeline(capsys, spark, tmp_path):
    import json as _json
    import os as _os

    from degdb_spark.__main__ import main

    out = str(tmp_path / "curated_media")
    rc = main(["media-pipeline", "--n", "18", "--out", out])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [_json.loads(l) for l in lines]
    assert [r["stage"] for r in rows] == [
        "validated", "image_quality", "exact_dedup", "fingerprintable",
        "neardup_keep",
    ]
    counts = [r["n_items"] for r in rows]
    assert counts[0] == 18  # the synthetic table is fully decodable
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert _os.path.exists(_os.path.join(out, "report.json"))


def test_cli_pipeline_substring_mode(capsys, spark, tmp_path):
    """--rewrite-dedup substring swaps stage 3b for ExactSubstr: the
    stage label changes, the pipeline still completes end-to-end, and
    the rewrite removes at least as much text as span mode does (a
    variable-length superset of aligned-span removal at equal L would;
    here we just pin monotone counts and a successful run)."""
    import json as _json

    from degdb_spark.__main__ import main

    out = str(tmp_path / "curated_sub")
    rc = main([
        "pipeline", "--sf-dir", "/root/testdata/sf0.001",
        "--out", out, "--rewrite-dedup", "substring",
    ])
    assert rc == 0
    rows = [
        _json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    stages = [r["stage"] for r in rows]
    assert stages == [
        "rule_filters", "exact_dedup", "paragraph_dedup",
        "neardup_clusters", "substring_dedup",
        "decontaminate", "token_budget", "packed",
    ]
    counts = [r["n_docs"] for r in rows[:7]]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # the rewrite never ADDS tokens
    assert rows[4]["n_tokens"] <= rows[3]["n_tokens"]

    import pytest as _pytest

    from degdb_spark.pipeline import curate

    with _pytest.raises(ValueError, match="rewrite_dedup"):
        curate(spark, "/root/testdata/sf0.001", rewrite_dedup="nope")


def test_cli_pipeline_bestfit_packing(capsys, spark, tmp_path):
    """--packing bestfit swaps the final stage for document-preserving
    placement: the packed report row carries n_oversize_docs, the
    written placements have zero split in-budget docs (one (pack_id,
    pack_slot) per doc) and every non-oversize bin's tokens fit the
    budget."""
    import json as _json
    import os as _os

    from degdb_spark.__main__ import main

    out = str(tmp_path / "curated_bf")
    rc = main([
        "pipeline", "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        "--packing", "bestfit",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [_json.loads(l) for l in lines]
    packed = rows[-1]
    assert packed["stage"] == "packed" and "n_oversize_docs" in packed
    placements = spark.read.parquet(_os.path.join(out, "packing.parquet"))
    rows_p = placements.collect()
    assert len({r.doc_id for r in rows_p}) == len(rows_p)  # one placement per doc
    bins = {}
    for r in rows_p:
        if not r.oversize:
            bins[r.pack_id] = bins.get(r.pack_id, 0) + r.n_tokens
    assert bins and all(v <= 256 for v in bins.values())
    assert packed["n_windows"] == len({r.pack_id for r in rows_p})
