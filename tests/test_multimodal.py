"""Multimodal plumbing tests: schema contract, Arrow batch shape, frame
sampling arithmetic — the decode itself is stubbed (no codec libs in this
environment), the Spark-side pipeline is real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmapreduceproject_spark.operators.multimodal import (
    extract_image_features,
    resize_images,
    sample_video_frames,
    synthetic_media,
)


def test_feature_extraction_shape(spark):
    media = synthetic_media(spark, n=32, kind="image")
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    assert set(feats.columns) == {
        "media_id", "mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b",
    }
    for r in rows:
        assert 0.0 <= r["mean_r"] <= 255.0 and r["std_r"] >= 0.0


def test_feature_extraction_deterministic(spark):
    media = synthetic_media(spark, n=8)
    a = {r["media_id"]: r["mean_g"] for r in extract_image_features(media).collect()}
    b = {
        r["media_id"]: r["mean_g"]
        for r in extract_image_features(media.repartition(5)).collect()
    }
    assert a == b


def test_video_frame_sampling(spark):
    media = synthetic_media(spark, n=4, kind="video")
    out = sample_video_frames(media, every_n=3)
    frames = sorted(
        (r["media_id"], r["frame_idx"]) for r in out.where("media_id = 0").collect()
    )
    assert frames == [(0, 0), (0, 3), (0, 6), (0, 9)]  # n_frames=10, step 3


def test_resize_known_payload_exact(spark):
    """Nearest-neighbor resize on a hand-built 2x2 RAW8 frame: upscale to
    4x4 must replicate each source pixel into a 2x2 block, downscale back
    must recover the original bytes exactly (src = floor(dst*in/out))."""
    import numpy as np
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 9, 9]]], dtype=np.uint8
    )
    from osmapreduceproject_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(
        [
            Row(
                media_id=1,
                kind="image",
                payload=bytearray(px.tobytes()),
                meta=Row(width=2, height=2, sample_rate=None, n_frames=1),
            )
        ],
        schema=MEDIA_SCHEMA,
    )
    up = resize_images(df, 4, 4)
    row = up.collect()[0]
    assert row["meta"]["width"] == 4 and row["meta"]["height"] == 4
    got = np.frombuffer(bytes(row["payload"]), dtype=np.uint8).reshape(4, 4, 3)
    want = px.repeat(2, axis=0).repeat(2, axis=1)
    assert (got == want).all()
    back = resize_images(up, 2, 2).collect()[0]
    assert bytes(back["payload"]) == px.tobytes()


def test_resize_synthetic_roundtrip_and_determinism(spark):
    from osmapreduceproject_spark.operators.multimodal import synthetic_raw_images

    media = synthetic_raw_images(spark, n=8, width=16, height=12)
    out = resize_images(media, 8, 6)
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert len(bytes(r["payload"])) == 8 * 6 * 3
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
    a = {r["media_id"]: bytes(r["payload"]) for r in rows}
    b = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(media.repartition(5), 8, 6).collect()
    }
    assert a == b


def test_resize_rejects_malformed_payload(spark):
    """A payload whose byte length contradicts the declared dimensions is a
    decode ERROR, not a silent skip."""
    media = synthetic_media(spark, n=2)  # utf-8 'payload:N' bytes, not RAW8
    with pytest.raises(Exception, match="RAW8"):
        resize_images(media, 16, 16).collect()


def test_audio_features_shape_and_determinism(spark):
    from osmapreduceproject_spark.operators.multimodal import extract_audio_features

    media = synthetic_media(spark, n=8, kind="audio")
    a = {r["media_id"]: (r["rms"], r["zcr"]) for r in extract_audio_features(media).collect()}
    b = {
        r["media_id"]: (r["rms"], r["zcr"])
        for r in extract_audio_features(media.repartition(5)).collect()
    }
    assert a == b and len(a) == 8
    for rms, zcr in a.values():
        assert rms > 0 and 0.0 < zcr < 1.0


def test_binaryfile_ingest_feeds_feature_extraction(spark):
    """The documented ingest path end-to-end: spark.read.format(
    'binaryFile') over real files → rename to the media contract → the
    same mapInPandas feature extractor as the synthetic table. Payload
    bytes match synthetic_media's, so features must be identical."""
    from pyspark.sql import functions as F

    from osmapreduceproject_spark.queries import _ensure_binfix

    bf = (
        spark.read.format("binaryFile")
        .load(_ensure_binfix())
        .select(
            F.regexp_extract(F.col("path"), r"payload-(\d+)\.bin", 1)
            .cast("bigint")
            .alias("media_id"),
            F.col("content").alias("payload"),
        )
    )
    from_files = {r["media_id"]: r["mean_r"] for r in extract_image_features(bf).collect()}
    from_synth = {
        r["media_id"]: r["mean_r"]
        for r in extract_image_features(synthetic_media(spark, n=16)).collect()
    }
    assert from_files == from_synth


def test_raw_image_features_known_values(spark):
    """extract_raw_image_features on a hand-built 2x1x3 frame: channel
    means/stds must equal the exact closed-form values."""
    import numpy as np
    from pyspark.sql import Row

    from osmapreduceproject_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_raw_image_features,
    )

    # two pixels: (10, 200, 0) and (30, 200, 255)
    px = np.array([[[10, 200, 0], [30, 200, 255]]], dtype=np.uint8)
    df = spark.createDataFrame(
        [
            Row(
                media_id=7,
                kind="image",
                payload=bytearray(px.tobytes()),
                meta=Row(width=2, height=1, sample_rate=None, n_frames=1),
            )
        ],
        schema=MEDIA_SCHEMA,
    )
    r = extract_raw_image_features(df).collect()[0]
    assert r["media_id"] == 7
    assert r["mean_r"] == 20.0 and r["mean_g"] == 200.0 and r["mean_b"] == 127.5
    assert r["std_r"] == 10.0 and r["std_g"] == 0.0 and r["std_b"] == 127.5


def test_raw_image_features_rejects_malformed_payload(spark):
    from osmapreduceproject_spark.operators.multimodal import (
        extract_raw_image_features,
    )

    media = synthetic_media(spark, n=2)  # utf-8 'payload:N' bytes, not RAW8
    with pytest.raises(Exception, match="RAW8"):
        extract_raw_image_features(media).collect()


def test_raw_audio_features_known_values(spark):
    """extract_raw_audio_features on a hand-built 4-sample clip:
    bytes [128, 129, 127, 128] → centered wave [0, 1, -1, 0] →
    rms = sqrt(2/4), peak = 1, zcr = 3/3 (every adjacent sign differs)."""
    import math

    from pyspark.sql import Row

    from osmapreduceproject_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_raw_audio_features,
    )

    df = spark.createDataFrame(
        [
            Row(
                media_id=3,
                kind="audio",
                payload=bytearray(bytes([128, 129, 127, 128])),
                meta=Row(width=None, height=None, sample_rate=16000, n_frames=None),
            )
        ],
        schema=MEDIA_SCHEMA,
    )
    r = extract_raw_audio_features(df).collect()[0]
    assert r["media_id"] == 3 and r["n_samples"] == 4
    assert r["rms"] == math.sqrt(0.5)
    assert r["peak"] == 1
    assert r["zcr"] == 1.0


def test_arith_raw_media_partitioning_invariance(spark):
    """The closed-form generators must emit identical bytes under any
    partitioning (they derive from media_id alone), and the real
    extractors must therefore produce identical features."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio,
        arith_raw_images,
        extract_raw_audio_features,
        extract_raw_image_features,
    )

    img = arith_raw_images(spark, n=12, width=8, height=6)
    a = {
        r["media_id"]: (r["mean_r"], r["std_b"])
        for r in extract_raw_image_features(img).collect()
    }
    b = {
        r["media_id"]: (r["mean_r"], r["std_b"])
        for r in extract_raw_image_features(img.repartition(5)).collect()
    }
    assert a == b and len(a) == 12
    au = arith_raw_audio(spark, n=6, n_samples=256)
    c = {
        r["media_id"]: (r["rms"], r["zcr"], r["peak"])
        for r in extract_raw_audio_features(au).collect()
    }
    d = {
        r["media_id"]: (r["rms"], r["zcr"], r["peak"])
        for r in extract_raw_audio_features(au.repartition(4)).collect()
    }
    assert c == d and len(c) == 6


def test_dhash_invariant_under_integer_upscale(spark):
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        dhash_images,
        resize_images,
    )

    base = arith_raw_images(spark, n=32, width=16, height=12)
    orig = {r.media_id: r.dhash for r in dhash_images(base).collect()}
    up = {
        r.media_id: r.dhash
        for r in dhash_images(resize_images(base, 32, 24)).collect()
    }
    # cross-resolution duplicate key: every 2x NN upscale collides with
    # its original
    assert up == orig
    # and the hash actually separates distinct images (not a constant)
    assert len(set(orig.values())) > 25


def test_dhash_passthrough_keeps_column_types(spark):
    """extra_cols pass through with their REAL types: a string key and a
    double score must survive the mapInPandas schema (the hardcoded
    'long' passthrough miscast, ADVICE r7)."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        dhash_images,
    )

    base = arith_raw_images(spark, n=8, width=16, height=12).select(
        "*",
        F.concat(F.lit("img-"), F.col("media_id")).alias("skey"),
        (F.col("media_id") * 1.5).alias("score"),
    )
    out = dhash_images(base, extra_cols=["skey", "score"])
    assert dict(out.dtypes) == {
        "media_id": "bigint", "skey": "string", "score": "double",
        "dhash": "bigint",
    }
    rows = {r["media_id"]: (r["skey"], r["score"]) for r in out.collect()}
    assert rows[3] == ("img-3", 4.5)
    assert len(rows) == 8


def test_dhash_neardup_finds_planted_perturbations(spark):
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        arith_raw_images_perturbed,
        dhash_neardup_pairs,
    )

    base = arith_raw_images(spark, n=16, width=16, height=12)
    pert = arith_raw_images_perturbed(spark, n=16, width=16, height=12)
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in dhash_neardup_pairs(base.unionByName(pert), max_hamming=6).collect()
    }
    # every locally-perturbed twin is recovered as a near-dup of its
    # original (the +3-on-12-bytes edit touches only top-left gradient
    # bits), and hamming stays within the verify threshold
    for m in range(16):
        assert (m, 1000 + m) in pairs, m
        assert 0 <= pairs[(m, 1000 + m)] <= 6


def test_audio_fingerprint_disperses_and_is_deterministic(spark):
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio,
        audio_fingerprint,
    )

    clips = arith_raw_audio(spark, n=32, n_samples=2048)
    a = {r.media_id: r.fp for r in audio_fingerprint(clips).collect()}
    b = {r.media_id: r.fp for r in audio_fingerprint(clips).collect()}
    assert a == b  # partitioning-independent
    assert len(a) == 32
    # a constant fingerprint would make the dedup key useless
    assert len(set(a.values())) > 1


def test_scene_changes_flags_planted_cut(spark):
    """Two synthetic videos of smooth-gradient frames with a hard cut at
    frame 5 (pattern inverts): exactly one flagged transition per video,
    at the cut; within-scene frames (identical here) never flag. The
    dhash primitive itself is value-oracled via q132/q133."""
    import numpy as np
    from pyspark.sql import Row

    from osmapreduceproject_spark.operators.multimodal import scene_changes

    w, h = 18, 16
    rows = []
    for vid in (0, 1):
        for f in range(10):
            # scene A: horizontal ramp; scene B (after cut): inverted ramp
            ramp = np.tile(np.arange(w, dtype=np.uint8) * 10, (h, 1))
            gray = ramp if f < 5 else ramp[:, ::-1]
            rgb = np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8)
            rows.append(
                Row(
                    media_id=vid,
                    frame_idx=f,
                    payload=bytearray(rgb.tobytes()),
                    meta=Row(width=w, height=h),
                )
            )
    df = spark.createDataFrame(rows)
    out = scene_changes(df, max_hamming=10).collect()
    got = {(r["media_id"], r["from_frame"], r["to_frame"]) for r in out}
    assert got == {(0, 4, 5), (1, 4, 5)}
    assert all(r["hamming"] > 10 for r in out)
