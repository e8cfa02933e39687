"""Unit tests for the training-data pipeline operators added in round 2:
repetition metrics, filter rules, vocabulary, sequence packing, int8
quantization — hand-computed expectations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from degdb_spark.operators import text as X
from degdb_spark.operators.packing import pack_documents
from degdb_spark.operators.quantize import quantize_int8, reconstruction_error


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b a b a b"),          # heavy 2-gram repetition
        (1, "one two three four"),   # no repetition
        (2, ""),                     # empty
        (3, "x"),                    # single token — no 2-grams
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngrams(spark):
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    out = df.select(X.ngrams("text", 2).alias("g")).collect()[0].g
    assert out == ["a b", "b c"]
    assert df.select(X.ngrams("text", 4).alias("g")).collect()[0].g == []


def test_repetition_features(docs):
    out = {r.doc_id: r for r in X.repetition_features(docs).collect()}
    # doc 0: 2-grams = [a b, b a, a b, b a, a b] → 5 total, 2 distinct
    assert out[0].dup_2gram_ratio == pytest.approx(1 - 2 / 5, abs=1e-4)
    # top 2-gram "a b" appears 3/5
    assert out[0].top_2gram_share == pytest.approx(3 / 5, abs=1e-4)
    assert out[1].dup_2gram_ratio == 0.0
    assert out[2].dup_2gram_ratio == 0.0 and out[3].top_2gram_share == 0.0


def test_filter_rules(spark):
    rows = [
        (0, "the cat sat on the mat and the dog ran off fast"),  # passes
        (1, "word " * 3),                                        # too short
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], ["doc_id", "text"])
    out = {r.doc_id: r for r in X.filter_rules(df).collect()}
    assert out[0].passes_all
    assert not out[1].rule_word_count and not out[1].passes_all


def test_doc_frequency(docs):
    out = {r.token: r for r in X.doc_frequency(docs).collect()}
    # "a" appears (distinct) in docs 0 and 3?? — doc 3 is "x"; "a" only doc 0
    assert out["a"].df_count == 1
    assert out["x"].df_count == 1
    assert out["a"].idf == pytest.approx(math.log(4 / 1), abs=1e-6)


def test_pack_documents_matches_serial(spark):
    rows = [(i, "tok " * (i % 7 + 1)) for i in range(100)]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], ["doc_id", "text"])
    out = {r.doc_id: r for r in pack_documents(df, budget=10, num_partitions=8).collect()}
    # serial reference
    off = 0
    for i in range(100):
        n = i % 7 + 1
        assert out[i].n_tokens == n
        assert out[i].start_offset == off, f"doc {i}"
        assert out[i].pack_id == off // 10
        assert out[i].crosses_boundary == (off // 10 != (off + n - 1) // 10)
        off += n


def test_quantize_int8_properties(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert out[0].scale == pytest.approx(1.0 / 127)
    assert out[0].codes == [127, -63, 32, 0]  # -0.5/s = -63.5 → floor(-63) ; 0.25/s = 31.75 → 32
    assert out[1].scale == 0.0 and out[1].codes == [0, 0, 0, 0]
    err = {r.vec_id: r for r in reconstruction_error(df).collect()}
    # max error bounded by scale/2, + 8dp-rounding slack (the reported
    # value is dround(·, 8) so it can exceed the raw bound by ≤5e-9)
    assert err[0].max_abs_err <= out[0].scale / 2 + 5e-9
    assert err[1].mse == 0.0 and err[1].max_abs_err == 0.0


# ---- property tier: packing vs a pure-Python running-offset replica ---------

import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=25),
    st.integers(min_value=2, max_value=4),
)
def test_pack_documents_matches_python_replica(spark, token_counts, nparts):
    """The two-phase-scan packing must equal the definitional Python
    replica (one sequential running offset over id order) for ANY
    document sizes — including empty docs — and ANY partition count:
    the range partitioner only affects parallel shape, never placement."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.packing import pack_documents

    budget = 7
    docs = [(i, " ".join(f"t{j}" for j in range(n)) if n else "") for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.pack_id, r.crosses_boundary)
        for r in pack_documents(df, budget=budget, num_partitions=nparts).collect()
    }

    off = 0
    want = {}
    for i, n in enumerate(token_counts):
        first = off // budget
        last = (off + max(n - 1, 0)) // budget
        want[i] = (n, off, first, n > 0 and first != last)
        off += n
    assert got == want


def test_curate_media_planted_stages(spark, tmp_path):
    """curate_media end to end on a planted table: a corrupt payload
    (validation), an exact byte duplicate (md5 dedup), a sub-64-sample
    audio clip and two non-8-divisible images (fingerprintability
    gate), two video trim twins (shot-level near-dup) and one
    aHash-identical image pair (banded near-dup) — every stage's count
    and the final survivor set pinned."""
    import os

    import numpy as np

    from degdb_spark.functions import codecs as C
    from degdb_spark.operators import multimodal as M
    from degdb_spark.pipeline import curate_media

    vids = M.synthetic_shot_media(spark, 4)  # trim pairs (0,1), (2,3)
    imgs = M.synthetic_jpeg_media(spark, 4).withColumn(
        "media_id", F.col("media_id") + 100
    )  # dims: 100=56x56 ok, 101=68x68 gate, 102=80x80 ok, 103=92x92 gate
    auds = M.synthetic_dtmf_media(spark, 2).withColumn(
        "media_id", F.col("media_id") + 200
    )
    tiny = C.encode_wav(np.arange(10, dtype=np.int16), 8000)
    img0_payload = bytes(imgs.filter("media_id = 100").select("payload").collect()[0][0])
    extra = spark.createDataFrame(
        [
            (210, "audio", bytearray(tiny), ("wav", None, None, 1, 8000)),
            (300, "image", bytearray(b"garbage-not-media"), ("bmp", 1, 1, None, None)),
            (310, "image", bytearray(img0_payload), ("jpeg", 56, 56, None, None)),
        ],
        schema=M.MEDIA_SCHEMA,
    )
    media = vids.unionByName(imgs).unionByName(auds).unionByName(extra)

    out = str(tmp_path / "curated")
    report = curate_media(spark, media, out_dir=out)
    assert [(r["stage"], r["n_items"]) for r in report] == [
        ("validated", 12),       # 13 in, the corrupt payload quarantined
        ("image_quality", 12),   # mod-pattern images are crisp: none gated
        ("exact_dedup", 11),     # 310 is byte-identical to 100
        ("fingerprintable", 8),  # tiny audio + images 101/103 gated
        ("neardup_keep", 5),     # video twins 1,3 + aHash-equal image 102
    ]
    survivors = sorted(
        r.media_id
        for r in spark.read.parquet(os.path.join(out, "curated.parquet"))
        .select("media_id")
        .collect()
    )
    # min-id representative per component: full clips beat their trims,
    # image 100 beats its uniform-shift twin 102, both audio clips are
    # genuinely distinct and survive
    assert survivors == [0, 2, 100, 200, 201]
    assert os.path.exists(os.path.join(out, "report.json"))


def test_validate_media_reports_errors(spark):
    """validate_media: good payloads ok=1; malformed and honestly-gated
    payloads ok=0 with the codec's message."""
    from degdb_spark.operators import multimodal as M

    good = M.synthetic_media(spark, 3).select("media_id", "kind", "payload")
    bad = spark.createDataFrame(
        [
            (90, "image", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)),
            (91, "audio", bytearray(b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 64)),
        ],
        "media_id long, kind string, payload binary",
    )
    got = {r.media_id: r for r in M.validate_media(good.unionByName(bad)).collect()}
    assert all(got[i].ok == 1 and got[i].error is None for i in range(3))
    assert got[90].ok == 0 and "PNG" in got[90].error.upper() or got[90].ok == 0
    assert got[91].ok == 0 and "codec" in got[91].error  # the mp3 strict gate


def test_curate_media_empty_table(spark):
    """An empty media table flows through every pipeline stage to an
    all-zero report — no stage crashes on schema-only input."""
    from degdb_spark.operators import multimodal as M
    from degdb_spark.pipeline import curate_media

    empty = spark.createDataFrame([], M.MEDIA_SCHEMA)
    report = curate_media(spark, empty)
    assert [(r["stage"], r["n_items"]) for r in report] == [
        ("validated", 0), ("image_quality", 0), ("exact_dedup", 0),
        ("fingerprintable", 0), ("neardup_keep", 0),
    ]


def test_paragraph_dedup_stage_semantics(spark):
    """Curate stage 2b (pipeline.paragraph_dedup_stage, ADVICE r12):
    (a) a doc that lost SOME paragraphs is rewritten to the deduped
    text with counts refreshed; (b) a FULLY-duplicated doc drops out;
    (c) a whitespace-only doc (zero paragraphs — nothing duplicated)
    passes through untouched instead of being dropped as if it were a
    full duplicate; (d) untouched docs keep their original text."""
    from degdb_spark.pipeline import paragraph_dedup_stage

    banner = "accept cookies now"
    rows = [
        (0, f"alpha body here\n{banner}", "en", "web"),
        (1, f"{banner}\nbeta body there", "en", "web"),  # loses the banner
        (2, banner, "en", "web"),  # fully duplicated -> drops
        (3, " \n\t\n ", "en", "web"),  # whitespace-only -> survives
    ]
    s2 = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in paragraph_dedup_stage(s2).collect()}
    assert set(out) == {0, 1, 3}
    assert out[0].text == rows[0][1]  # first occurrence keeps both paras
    assert out[1].text == "beta body there"  # banner stripped
    assert out[3].text == rows[3][1]  # untouched whitespace doc


def test_pack_bestfit_never_splits_and_fits(spark):
    """pack_bestfit (Ding et al. 2024 motivation, harmonic classes):
    (a) every in-budget doc gets exactly ONE placement — zero split
    documents, the headline metric; (b) every non-oversize bin's
    token sum fits the budget; (c) the whole assignment matches a
    Python replica of the class/rank/offset arithmetic; (d) on a
    window-tiling corpus the fill equals concat-chunk's 1.0 while
    concat still truncates and bestfit does not."""
    import hashlib

    from degdb_spark.operators.packing import pack_bestfit, pack_documents

    C = 32
    lens = [40, 33, 20, 17, 16, 16, 11, 10, 9, 8, 7, 5, 4, 3, 2, 1, 1]
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [tuple(r) for r in pack_bestfit(df, budget=C, num_partitions=5)
           .orderBy("doc_id").collect()]

    # (a) one placement per doc, none missing
    assert [r[0] for r in out] == list(range(len(lens)))
    # (b) bins fit
    bins = {}
    for doc_id, n, cls, pack, slot, oversize in out:
        bins.setdefault(pack, []).append((n, oversize))
    for pack, members in bins.items():
        if not members[0][1]:
            assert sum(n for n, _ in members) <= C, (pack, members)

    # (c) replica
    by_class = {}
    for i, n in enumerate(lens):
        k = C // n
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_class.setdefault(k, []).append((-n, h, i))
    offs, off = {}, 0
    for k in sorted(by_class):
        cap = max(k, 1)
        offs[k] = off
        off += (len(by_class[k]) + cap - 1) // cap
    want = {}
    for k, docs in by_class.items():
        cap = max(k, 1)
        for r, (_neg, _h, i) in enumerate(sorted(docs)):
            want[i] = (k, offs[k] + r // cap, r % cap, k == 0)
    got = {r[0]: (r[2], r[3], r[4], r[5]) for r in out}
    assert got == want

    # (d) tiling corpus: equal fill, strictly less truncation
    tiling = spark.createDataFrame(
        [(i, " ".join(["w"] * 16)) for i in range(10)],
        "doc_id long, text string",
    )
    bf = pack_bestfit(tiling, budget=C).collect()
    per_bin = {}
    for r in bf:
        per_bin.setdefault(r.pack_id, 0)
        per_bin[r.pack_id] += r.n_tokens
    assert all(v == C for v in per_bin.values())  # fill 1.0 == concat's
    cc = pack_documents(tiling, budget=C).collect()
    assert all(not r.crosses_boundary for r in cc)  # tiling: concat also clean
    # non-tiling corpus: concat truncates, bestfit never does
    odd = spark.createDataFrame(
        [(i, " ".join(["w"] * 13)) for i in range(10)],
        "doc_id long, text string",
    )
    assert sum(r.crosses_boundary for r in pack_documents(odd, budget=C).collect()) > 0
    assert all(not r.oversize for r in pack_bestfit(odd, budget=C).collect())


def test_image_quality_gate_quarantines_flat_and_blurry(spark):
    """image_quality (blur/flat gates): a constant-color image is both
    flat AND blurry (zero Laplacian variance, one gray bin); a smooth
    near-constant gradient is blurry but not flat; the crisp synthetic
    mod-pattern images are neither. curate_media quarantines exactly
    the bad ones at the image_quality stage, audio untouched."""
    import numpy as np

    from degdb_spark.functions import codecs as C
    from degdb_spark.operators import multimodal as M
    from degdb_spark.pipeline import curate_media

    flat_px = np.full((64, 64, 3), 200, dtype=np.uint8)
    smooth = np.zeros((64, 64, 3), dtype=np.uint8)
    smooth[:, :, :] = (np.arange(64)[None, :, None] // 8).astype(np.uint8)
    good = M.synthetic_media(spark, 3)  # ids 0 image, 1 audio, 2 video
    extra = spark.createDataFrame(
        [
            (50, "image", bytearray(C.encode_bmp(flat_px)),
             ("bmp", 64, 64, None, None)),
            (51, "image", bytearray(C.encode_bmp(smooth)),
             ("bmp", 64, 64, None, None)),
        ],
        schema=M.MEDIA_SCHEMA,
    )
    media = good.unionByName(extra)
    q = {r.media_id: r for r in M.image_quality(media).collect()}
    assert q[50].flat and q[50].blurry and q[50].gray_distinct == 1
    assert q[51].blurry and not q[51].flat
    assert not q[0].blurry and not q[0].flat

    report = curate_media(spark, media)
    by_stage = {r["stage"]: r["n_items"] for r in report}
    assert by_stage["validated"] == 5
    assert by_stage["image_quality"] == 3  # both planted bad images gone
