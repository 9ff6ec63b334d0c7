"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns plus a typed metadata struct —
the Spark-side contract (schema, partition discipline, Arrow batch shape)
is real and tested. Compressed-codec decode is stubbed because no media
libraries ship in this environment (swap `_decode_image_batch` for a
PIL/torchaudio implementation and nothing else changes);
:func:`resize_images` is REAL over the uncompressed RAW8 RGB layout
(:func:`synthetic_raw_images`) — pure-NumPy nearest-neighbor, no codec
needed.

Scale notes: decode/feature-extract run as ``mapInPandas`` (Arrow-batched,
one Python worker per core, no shuffle); rows carrying multi-MB payloads
should set ``spark.sql.files.maxPartitionBytes`` low enough that a batch
of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes
    derive from media_id, so every stage is reproducible."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.lit(kind).alias("kind"),
            F.encode(F.concat(F.lit("payload:"), F.col("id").cast("string")), "utf-8").alias(
                "payload"
            ),
            F.struct(
                F.lit(32).alias("width"),
                F.lit(24).alias("height"),
                F.lit(16000).alias("sample_rate"),
                F.lit(10).alias("n_frames"),
            ).alias("meta"),
        )
    )


def _decode_image_batch(payloads: pd.Series) -> np.ndarray:
    """STUB — deterministic fake decoder.

    A real deployment replaces this with e.g. PIL.Image.open over the
    bytes. Here: a pseudo-image derived from the payload hash so the
    pipeline shape (bytes → HxWxC array → features) is fully exercised.
    """
    import hashlib

    out = []
    for p in payloads:
        # md5, not Python hash(): hash() is salted per-process (PYTHONHASHSEED)
        # and would make the "decoded" pixels differ between runs.
        h = int.from_bytes(hashlib.md5(bytes(p)).digest()[:4], "big")
        rng = np.random.default_rng(h)
        out.append(rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8))
    return np.stack(out)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode → per-channel mean/std features, via mapInPandas.

    Output schema: media_id, mean_r/g/b, std_r/g/b. The decode itself is
    stubbed (see `_decode_image_batch`); everything Spark-side is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained decode (duplicate of _decode_image_batch): the
        # closure must not reference module globals — cloudpickle would
        # serialize them by reference and workers whose driver runs from
        # a foreign cwd can't import this package.
        import hashlib

        import numpy as np
        import pandas as pd

        def decode(payloads):
            out = []
            for p in payloads:
                h = int.from_bytes(hashlib.md5(bytes(p)).digest()[:4], "big")
                rng = np.random.default_rng(h)
                out.append(rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8))
            return np.stack(out)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            imgs = decode(pdf["payload"]).astype(np.float64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "mean_r": imgs[:, :, :, 0].mean(axis=(1, 2)),
                    "mean_g": imgs[:, :, :, 1].mean(axis=(1, 2)),
                    "mean_b": imgs[:, :, :, 2].mean(axis=(1, 2)),
                    "std_r": imgs[:, :, :, 0].std(axis=(1, 2)),
                    "std_g": imgs[:, :, :, 1].std(axis=(1, 2)),
                    "std_b": imgs[:, :, :, 2].std(axis=(1, 2)),
                }
            )

    schema = (
        "media_id long, mean_r double, mean_g double, mean_b double, "
        "std_r double, std_g double, std_b double"
    )
    return df.select("media_id", "payload").mapInPandas(run, schema=schema)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Decode → per-clip waveform features (RMS, peak, zero-crossing
    rate), via mapInPandas — the audio twin of
    :func:`extract_image_features`.

    The decode is a deterministic STUB (pseudo-waveform seeded from the
    payload md5; a real deployment drops in soundfile/torchaudio);
    everything Spark-side — Arrow batching, schema contract, no shuffle —
    is real and tested. Output: media_id, n_samples, rms, peak, zcr.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references (workers may
        # not have this package importable from a foreign driver cwd).
        import hashlib

        import numpy as np
        import pandas as pd

        n_samples = 2048

        for pdf in batches:
            if len(pdf) == 0:
                continue
            waves = []
            for p in pdf["payload"]:
                h = int.from_bytes(hashlib.md5(bytes(p)).digest()[:4], "big")
                rng = np.random.default_rng(h)
                waves.append(rng.standard_normal(n_samples))
            w = np.stack(waves)
            signs = np.sign(w)
            zc = (signs[:, 1:] != signs[:, :-1]).mean(axis=1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_samples": np.full(len(pdf), n_samples, dtype=np.int64),
                    "rms": np.sqrt((w * w).mean(axis=1)),
                    "peak": np.abs(w).max(axis=1),
                    "zcr": zc,
                }
            )

    schema = "media_id long, n_samples long, rms double, peak double, zcr double"
    return df.select("media_id", "payload").mapInPandas(run, schema=schema)


def synthetic_raw_images(
    spark, n: int = 64, width: int = 32, height: int = 24
) -> DataFrame:
    """Deterministic RAW8 RGB image table: payload is ``height × width × 3``
    row-major uint8 bytes (an uncompressed BMP-without-header frame), pixels
    seeded from media_id — every stage downstream is reproducible and no
    codec library is needed to decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure (no module-global references): workers on
        # a foreign-cwd driver can't import this package.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [
                np.random.default_rng(int(m))
                .integers(0, 256, size=(height, width, 3), dtype=np.uint8)
                .tobytes()
                for m in pdf["id"]
            ]
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def arith_raw_images(
    spark, n: int = 256, width: int = 16, height: int = 12
) -> DataFrame:
    """RAW8 RGB image table whose pixel bytes follow a CLOSED-FORM integer
    formula over the row-major byte index ``i``:

        v(media_id, i) = (31·media_id + 7·i + (i² mod 251)) mod 256

    Unlike :func:`synthetic_raw_images` (RNG pixels — the adversarial
    fixture for byte-exact resize tests), every byte here is regenerable
    by any SQL engine with integer arithmetic, which is what upgrades the
    RAW8 decode→feature path from a rows-only check to a full
    cross-engine value oracle (q64). Same schema/meta contract as the
    other media sources."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure (no module-global references): workers on
        # a foreign-cwd driver can't import this package.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [
                ((31 * int(m) + 7 * idx + (idx * idx) % 251) % 256)
                .astype(np.uint8)
                .tobytes()
                for m in pdf["id"]
            ]
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def extract_raw_image_features(df: DataFrame) -> DataFrame:
    """Per-channel mean/std over the RAW8 RGB layout — a REAL decode, no
    stub anywhere: payload bytes → height×width×3 uint8 → features.

    Cross-engine determinism (the queries.py float rules): mean and E[x²]
    derive from exact int64 channel sums divided once in double — the
    same bits under any partitioning or engine — and
    std = sqrt(E[x²] − mean²) composes only those operands. Output is
    UNROUNDED; hash-gated callers apply F.round. Payloads whose length
    doesn't match meta dims raise (decode error, not a silent skip).
    Runs as mapInPandas: Arrow-batched, one pass, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                ch = buf.reshape(-1, 3).astype(np.int64)
                per = w * h
                s = ch.sum(axis=0)
                s2 = (ch * ch).sum(axis=0)
                mean = s / per
                std = np.sqrt(s2 / per - mean * mean)
                rows.append((int(m), *mean.tolist(), *std.tolist()))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mean_r", "mean_g", "mean_b",
                    "std_r", "std_g", "std_b",
                ],
            )

    flat = df.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(
        run,
        "media_id long, mean_r double, mean_g double, mean_b double, "
        "std_r double, std_g double, std_b double",
    )


def arith_raw_audio(spark, n: int = 64, n_samples: int = 2048) -> DataFrame:
    """Uncompressed 8-bit-PCM audio table with closed-form samples:

        v(media_id, i) = (17·media_id + 11·i + (i² mod 89)) mod 256

    The audio twin of :func:`arith_raw_images` — SQL-regenerable bytes so
    the decode→waveform-feature path gets a full value oracle (q97)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [
                ((17 * int(m) + 11 * idx + (idx * idx) % 89) % 256)
                .astype(np.uint8)
                .tobytes()
                for m in pdf["id"]
            ]
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("audio").alias("kind"),
        "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_raw_audio_features(df: DataFrame) -> DataFrame:
    """Waveform features over 8-bit PCM payloads — a REAL decode: bytes →
    centered integer wave (v − 128) → n_samples / RMS / peak /
    zero-crossing rate.

    Determinism mirrors :func:`extract_raw_image_features`: RMS is
    sqrt(exact-int64 Σw² / n); peak is an integer max; ZCR is an integer
    sign-change count over consecutive samples divided by (n−1). Output
    UNROUNDED doubles (+ integer n_samples/peak); callers round for the
    hash gate. mapInPandas, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                w = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64) - 128
                n = w.size
                if n < 2:
                    raise ValueError(f"payload of {n} samples is not a waveform")
                signs = np.sign(w)
                zc = int((signs[1:] != signs[:-1]).sum())
                rows.append(
                    (
                        int(m),
                        n,
                        float(np.sqrt(int((w * w).sum()) / n)),
                        int(np.abs(w).max()),
                        zc / (n - 1),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "peak", "zcr"]
            )

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id long, n_samples long, rms double, peak long, zcr double"
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of RAW8 RGB payloads to ``width × height``.

    Decodes the uncompressed row-major ``meta.height × meta.width × 3``
    uint8 layout (:func:`synthetic_raw_images` emits it; any raw RGB frame
    qualifies), resizes with pure-NumPy integer index mapping
    (``src = floor(dst · in / out)`` — deterministic, no interpolation
    float rounding), re-encodes to the same layout, and rewrites
    ``meta.width/height``. Runs as mapInPandas: Arrow-batched, no shuffle,
    no codec libraries. Payloads whose length doesn't match the declared
    dimensions raise ValueError (a decode error, not a silent skip).
    """
    out_w, out_h = int(width), int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            resized = []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                w, h = int(w), int(h)
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                img = buf.reshape(h, w, 3)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                resized.append(img[rows][:, cols].tobytes())
            out = pdf[["media_id", "kind", "sample_rate", "n_frames"]].copy()
            out["payload"] = resized
            yield out

    flat = df.select(
        "media_id",
        "kind",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    out = flat.mapInPandas(
        run,
        "media_id long, kind string, sample_rate int, n_frames int, payload binary",
    )
    return out.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.lit(out_w).alias("width"),
            F.lit(out_h).alias("height"),
            F.col("sample_rate"),
            F.col("n_frames"),
        ).alias("meta"),
    )


def sample_video_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: expand each video row into frame-index
    rows (decode stubbed, sampling arithmetic real)."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def dhash_images(df: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """Perceptual difference-hash (dHash) over RAW8 RGB payloads — the
    image-dedup primitive: decode → integer grayscale ((r+g+b)//3) →
    nearest-neighbor 9×8 downsample (same floor(dst·in/out) index map as
    :func:`resize_images`) → 64 horizontal-gradient bits packed into a
    signed int64 (wrapped two's-complement). Scale-invariant under the
    engine's own NN resize by construction: floor-index maps compose
    (floor(floor(x)/k) = floor(x/k)), so an integer-factor NN upscale
    samples the identical source pixels and hashes equally — which is
    exactly what makes dHash a cross-resolution duplicate key. Grouping
    equal hashes (or banding bytes for hamming-near matches, q32's
    SimHash machinery) turns this into image near-dedup.

    mapInPandas, Arrow-batched, no shuffle; bad payload lengths raise.
    Returns (media_id, *extra_cols, dhash) — ``extra_cols`` pass through
    untouched (e.g. ``frame_idx`` for per-frame video hashing)."""
    extra_cols = extra_cols or []

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            extras = [pdf[c] for c in pdf.columns
                      if c not in ("media_id", "payload", "width", "height")]
            for m, p, w, h, *ex in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"], *extras
            ):
                w, h = int(w), int(h)
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                gray = buf.reshape(h, w, 3).astype(np.int64).sum(axis=2) // 3
                rr = (np.arange(8) * h) // 8
                cc = (np.arange(9) * w) // 9
                g = gray[rr][:, cc]  # 8 × 9 sample grid
                bits = (g[:, :-1] < g[:, 1:]).flatten()  # row-major 64 bits
                hval = 0
                for i, b in enumerate(bits):
                    if b:
                        hval |= 1 << i
                if hval >= 1 << 63:
                    hval -= 1 << 64
                out.append((int(m), *ex, hval))
            cols = [c for c in pdf.columns
                    if c not in ("media_id", "payload", "width", "height")]
            yield pd.DataFrame(out, columns=["media_id", *cols, "dhash"])

    flat = df.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        *extra_cols,
    )
    # Passthrough columns keep their REAL types (read off flat.schema) —
    # hardcoding 'long' would miscast or fail Arrow conversion for a
    # string key or double timestamp passthrough.
    extra_schema = "".join(
        f"{c} {flat.schema[c].dataType.simpleString()}, " for c in extra_cols
    )
    schema = "media_id long, " + extra_schema + "dhash long"
    return flat.mapInPandas(run, schema)


def arith_video_frames(
    spark,
    n_videos: int = 24,
    n_frames: int = 12,
    cut_at: int = 6,
    width: int = 16,
    height: int = 12,
    delta_bytes: int = 12,
) -> DataFrame:
    """Closed-form RAW8 video fixture for scene-cut detection: frame
    ``f`` of video ``vid`` carries the :func:`arith_raw_images` pixel
    formula for base image ``m = vid`` before the planted cut at
    ``cut_at`` and ``m = vid + 500`` after it, plus per-frame motion
    ``+f`` (mod 256) on the first ``delta_bytes`` bytes — a few
    top-left pixels drift slightly frame to frame (within-scene motion
    that moves ≤1 gradient bit, measured) while the cut rewrites the
    whole composition (hamming ≥27 at these defaults). Every byte is
    regenerable by integer SQL, which is what upgrades
    :func:`scene_changes` from a planted-cut unit check to a full
    cross-engine value oracle — the q132 RAW8 precedent applied along
    time. Schema: (media_id, kind, frame_idx, payload, meta)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure (no module-global references): workers on
        # a foreign-cwd driver can't import this package.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        motion = (idx < delta_bytes).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids, fids, payloads = [], [], []
            for i in pdf["id"]:
                vid, f = divmod(int(i), n_frames)
                m = vid if f < cut_at else vid + 500
                v = (31 * m + 7 * idx + (idx * idx) % 251 + f * motion) % 256
                vids.append(vid)
                fids.append(f)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {"media_id": vids, "frame_idx": fids, "payload": payloads}
            )

    raw = spark.range(n_videos * n_frames).mapInPandas(
        gen, "media_id long, frame_idx int, payload binary"
    )
    return raw.select(
        "media_id",
        F.lit("video").alias("kind"),
        "frame_idx",
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ).alias("meta"),
    )


def arith_raw_images_perturbed(
    spark,
    n: int = 96,
    width: int = 16,
    height: int = 12,
    delta: int = 3,
    n_bytes: int = 12,
    id_offset: int = 1000,
) -> DataFrame:
    """Perturbed twins of :func:`arith_raw_images`: media_id
    ``id_offset + m`` carries m's pixels with ``delta`` added (mod 256)
    to the first ``n_bytes`` bytes — a localized edit (a few pixels of
    the top-left corner), the fixture for *near*-duplicate detection:
    the dHash differs in only the gradient bits those pixels touch.
    Same closed-form regenerability as the base table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        bump = np.where(idx < n_bytes, delta, 0)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [
                ((31 * int(m) + 7 * idx + (idx * idx) % 251 + bump) % 256)
                .astype(np.uint8)
                .tobytes()
                for m in pdf["id"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["id"].values + id_offset, "payload": payloads}
            )

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def dhash_neardup_pairs(
    df: DataFrame, max_hamming: int = 6, n_bands: int = 8
) -> DataFrame:
    """Image NEAR-duplicate pairs via banded dHash — the perceptual
    analogue of MinHash-LSH: hash every image (:func:`dhash_images`),
    split the 64-bit hash into ``n_bands`` byte bands, equi-join on
    (band, value) collisions, verify candidates with an exact popcount
    hamming distance. Pigeonhole guarantee: with 8 bands, any pair
    within hamming ≤ 7 shares at least one untouched band, so recall at
    the default threshold is 1.0 — and candidates come only from band
    equi-joins, never an all-pairs distance pass (the q31/q35 scale
    discipline applied to images).

    Bands are unsigned byte extractions (shiftrightunsigned) from the
    signed hash — replicated in the oracle as HUGEINT division on the
    pre-wrap value. Returns (a_id, b_id, hamming), a_id < b_id."""
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    d = dhash_images(df)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("dhash"), 8 * b).bitwiseAND(F.lit(255)).alias("bval"),
        )
        for b in range(n_bands)
    ]
    bands = d.select(
        "media_id", "dhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select("media_id", "dhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    a = bands.select(
        F.col("media_id").alias("a_id"), F.col("dhash").alias("__da"), "band", "bval"
    )
    b = bands.select(
        F.col("media_id").alias("b_id"), F.col("dhash").alias("__db"), "band", "bval"
    )
    cand = (
        a.join(b, ["band", "bval"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "__da", "__db")
        .distinct()
    )
    ham = F.bit_count(F.col("__da").bitwiseXOR(F.col("__db"))).cast("bigint")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def audio_fingerprint(df: DataFrame, frame: int = 8, n_frames: int = 65) -> DataFrame:
    """Acoustic fingerprint over 8-bit-PCM payloads — the audio analogue
    of :func:`dhash_images`: integer frame energies (sum of raw byte
    values per ``frame``-sample window) reduced to 64
    energy-gradient bits (e[k] < e[k+1]) packed into a signed int64.
    All-integer arithmetic end-to-end, so the fingerprint is replicable
    closed-form by any engine — the same property that upgraded the
    RAW8 image path. Band-joining these fingerprints (q133's machinery)
    gives hamming-near audio dedup; equal fingerprints are the
    re-encoded-duplicate key. mapInPandas, Arrow-batched, no shuffle;
    clips shorter than frame·n_frames samples raise.

    Returns (media_id, fp)."""
    need = frame * n_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                if buf.size < need:
                    raise ValueError(
                        f"payload has {buf.size} samples; fingerprint needs {need}"
                    )
                e = buf[:need].astype(np.int64).reshape(n_frames, frame).sum(axis=1)
                bits = e[:-1] < e[1:]
                fp = 0
                for i, b in enumerate(bits):
                    if b:
                        fp |= 1 << i
                if fp >= 1 << 63:
                    fp -= 1 << 64
                out.append((int(m), fp))
            yield pd.DataFrame(out, columns=["media_id", "fp"])

    return df.select("media_id", "payload").mapInPandas(run, "media_id long, fp long")


def scene_changes(
    frames: DataFrame,
    max_hamming: int = 10,
) -> DataFrame:
    """Video scene-cut detection over RAW8 frames: dHash every frame
    (:func:`dhash_images` with ``frame_idx`` passthrough — the SAME
    value-oracled perceptual hash as the q132/q133 image dedup), then a
    per-video lag window compares adjacent sampled frames by
    popcount-hamming; a distance above ``max_hamming`` flags a cut.
    Within-scene motion moves a few gradient bits, a cut rewrites the
    composition — the same threshold logic as q133's near-dup banding,
    applied along time. Input: (media_id, frame_idx, payload,
    meta.width, meta.height) rows, e.g. from the frame-sampling
    plumbing of :func:`sample_video_frames` joined to decoded frames.

    Scale shape: hashing is Arrow-batched mapInPandas (no shuffle); the
    comparison is ONE per-video window over 8-byte hashes ordered by
    frame index — frame payloads never shuffle, only (video, idx, hash)
    triplets. Returns flagged transitions:
    (media_id, from_frame, to_frame, hamming).
    """
    from pyspark.sql import Window

    hashed = dhash_images(frames, extra_cols=["frame_idx"])
    w = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    lagged = (
        hashed.withColumn("__prev_hash", F.lag("dhash").over(w))
        .withColumn("__prev_idx", F.lag("frame_idx").over(w))
        .where(F.col("__prev_hash").isNotNull())
    )
    ham = F.bit_count(F.col("dhash").bitwiseXOR(F.col("__prev_hash"))).cast("bigint")
    return (
        lagged.withColumn("hamming", ham)
        .where(F.col("hamming") > max_hamming)
        .select(
            "media_id",
            F.col("__prev_idx").alias("from_frame"),
            F.col("frame_idx").alias("to_frame"),
            "hamming",
        )
    )


def arith_raw_audio_silence(
    spark,
    n: int = 32,
    n_samples: int = 2048,
    quiet_ranges: tuple = ((512, 768), (1536, 1664)),
) -> DataFrame:
    """:func:`arith_raw_audio` with PLANTED SILENCE: samples inside the
    ``quiet_ranges`` half-open intervals are exactly 128 (the 8-bit-PCM
    zero level, |v−128| = 0) while the rest follow the closed-form
    arithmetic wave — the fixture for silence/segment detection, fully
    SQL-regenerable (a CASE over the sample index) so the
    trim-detection path gets a cross-engine value oracle like the rest
    of the RAW8/PCM family."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(n_samples, dtype=np.int64)
        quiet = np.zeros(n_samples, dtype=bool)
        for lo, hi in quiet_ranges:
            quiet[lo:hi] = True
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for m in pdf["id"]:
                v = (17 * int(m) + 11 * idx + (idx * idx) % 89) % 256
                v = np.where(quiet, 128, v)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("audio").alias("kind"),
        "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def audio_silence_segments(
    df: DataFrame,
    frame: int = 64,
    max_amp: int = 64,
    min_frames: int = 2,
) -> DataFrame:
    """Silence-segment detection over 8-bit-PCM payloads — the trim step
    an ASR data pipeline runs before cutting clips: per ``frame``-sample
    window, the integer amplitude mass Σ|v−128|; frames at or below
    ``max_amp`` are silent; runs of ≥ ``min_frames`` consecutive silent
    frames become segments. All-integer frame energies (the
    :func:`audio_fingerprint` discipline) make the whole path
    closed-form replicable.

    Shape: energies are Arrow-batched mapInPandas (payloads never
    shuffle — only (media_id, frame_idx, amp) triplets leave the map);
    runs are the gaps-and-islands window pattern over SILENT FRAMES
    ONLY (one per-media exchange carrying just the quiet minority).
    Trailing samples short of a full frame are ignored. Returns
    (media_id, start_frame, end_frame, n_frames) with ``end_frame``
    inclusive.
    """
    from pyspark.sql import Window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                nf = buf.size // frame
                if nf == 0:
                    continue
                amp = (
                    np.abs(buf[: nf * frame].astype(np.int64) - 128)
                    .reshape(nf, frame)
                    .sum(axis=1)
                )
                for i, a in enumerate(amp):
                    out.append((int(m), i, int(a)))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "amp"])

    amps = df.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, amp long"
    )
    silent = amps.where(F.col("amp") <= max_amp)
    w = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    isl = (
        silent.withColumn("__prev", F.lag("frame_idx").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("frame_idx") - F.col("__prev") > 1),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        isl.groupBy("media_id", "__island")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .where(F.col("n_frames") >= min_frames)
        .drop("__island")
    )


def video_keyframe_select(
    frames: DataFrame,
    max_hamming: int = 10,
) -> DataFrame:
    """Scene segmentation + keyframe selection — the downstream half of
    :func:`scene_changes` a video-curation pipeline actually materializes:
    dHash every frame (the value-oracled q132 hash), segment each video
    at adjacent-frame hamming > ``max_hamming`` (lag + cumulative-sum
    over one per-video window — the sessionize pattern along frame
    time), and emit ONE representative per scene: the middle frame
    (discrete-median position, ceil(n/2)-th frame of the scene), whose
    stable choice dedups a video to O(scenes) frames for embedding or
    captioning instead of O(frames).

    Scale shape: hashing is Arrow-batched mapInPandas (payloads never
    shuffle); segmentation and selection are two windows and one
    groupBy, all keyed on the video — (video, frame, hash) triplets are
    the only shuffled rows. Returns
    (media_id, scene_idx, scene_start, scene_end, n_frames,
    keyframe_idx) with frame bounds inclusive.
    """
    from pyspark.sql import Window

    hashed = dhash_images(frames, extra_cols=["frame_idx"])
    w = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    ham = F.bit_count(
        F.col("dhash").bitwiseXOR(F.lag("dhash").over(w))
    )
    seg = (
        hashed.withColumn(
            "__new",
            F.when(ham.isNull() | (ham > max_hamming), 1).otherwise(0),
        )
        .withColumn(
            "scene_idx",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
        )
    )
    ws = Window.partitionBy("media_id", "scene_idx").orderBy(
        F.col("frame_idx").asc()
    )
    wc = Window.partitionBy("media_id", "scene_idx")
    ranked = seg.withColumn("__rn", F.row_number().over(ws)).withColumn(
        "__n", F.count(F.lit(1)).over(wc)
    )
    return (
        ranked.groupBy("media_id", "scene_idx")
        .agg(
            F.min("frame_idx").alias("scene_start"),
            F.max("frame_idx").alias("scene_end"),
            F.max("__n").alias("n_frames"),
            F.min(
                F.when(F.col("__rn") == F.ceil(F.col("__n") / 2), F.col("frame_idx"))
            ).alias("keyframe_idx"),
        )
        .withColumn("n_frames", F.col("n_frames").cast("bigint"))
    )


def arith_raw_audio_clipped(
    spark,
    n: int = 32,
    n_samples: int = 2048,
    clip_ranges: tuple = (((512, 768), 255), ((1536, 1664), 0)),
) -> DataFrame:
    """:func:`arith_raw_audio` with PLANTED CLIPPING: samples inside each
    ``clip_ranges`` half-open interval sit exactly at the given 8-bit
    rail (255 = positive clip, 0 = negative clip) while the background
    wave is remapped to [1, 253] so it can never touch a rail by
    accident — the fixture for clipping detection, fully SQL-regenerable
    (a CASE over the sample index) like the silence twin."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(n_samples, dtype=np.int64)
        rail = np.full(n_samples, -1, dtype=np.int64)
        for (lo, hi), v in clip_ranges:
            rail[lo:hi] = v
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for m in pdf["id"]:
                v = (17 * int(m) + 11 * idx + (idx * idx) % 89) % 253 + 1
                v = np.where(rail >= 0, rail, v)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("audio").alias("kind"),
        "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def audio_clipping_report(df: DataFrame) -> DataFrame:
    """Clipping detection over 8-bit-PCM payloads — the gain-staging QC
    an audio pipeline runs next to :func:`audio_silence_segments`
    (silence says the clip is too quiet to use; this says it was
    recorded too hot): per clip, how many samples sit AT a rail (0 or
    255 — a digitized over-range sample can only land there) and the
    longest consecutive clipped run (sustained saturation distorts;
    isolated rail hits are usually legal signal extremes).

    The whole computation is per-clip local: one Arrow-batched
    mapInPandas pass decodes each payload and emits ONE summary row —
    no per-sample rows ever shuffle (the run-length scan is a numpy
    diff over the clip in its own task, bounded by clip length).
    clip_frac is exact-integer division in double, rounded to 6.
    Returns (media_id, n_samples, n_clipped, clip_frac,
    longest_clipped_run).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                ns = int(buf.size)
                clipped = (buf == 0) | (buf == 255)
                n_clip = int(clipped.sum())
                longest = 0
                if n_clip:
                    # run lengths of True blocks via edge indices
                    edges = np.diff(clipped.astype(np.int8))
                    starts = np.flatnonzero(edges == 1) + 1
                    ends = np.flatnonzero(edges == -1) + 1
                    if clipped[0]:
                        starts = np.concatenate(([0], starts))
                    if clipped[-1]:
                        ends = np.concatenate((ends, [ns]))
                    longest = int((ends - starts).max())
                out.append((int(m), ns, n_clip, longest))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_samples", "n_clipped", "longest_clipped_run",
                ],
            )

    rep = df.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, n_samples long, n_clipped long, "
        "longest_clipped_run long",
    )
    return rep.select(
        "media_id",
        "n_samples",
        "n_clipped",
        F.round(
            F.col("n_clipped").cast("double") / F.col("n_samples"), 6
        ).alias("clip_frac"),
        "longest_clipped_run",
    )


def arith_raw_images_bordered(
    spark,
    n: int = 64,
    width: int = 16,
    height: int = 12,
    border_value: int = 200,
) -> DataFrame:
    """:func:`arith_raw_images` with a UNIFORM BORDER planted on every
    EVEN media_id: all three channel bytes of every edge pixel (row 0,
    row h−1, col 0, col w−1) are ``border_value``, interior pixels (and
    all of every odd image) keep the closed-form arithmetic bytes — the
    letterbox-detection fixture, fully SQL-regenerable like the rest of
    the RAW8 family."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        border = np.zeros((height, width), dtype=bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        bmask = np.repeat(border.reshape(-1), 3)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for m in pdf["id"]:
                v = (31 * int(m) + 7 * idx + (idx * idx) % 251) % 256
                if int(m) % 2 == 0:
                    v = np.where(bmask, border_value, v)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def image_border_uniformity(df: DataFrame, tol: int = 0) -> DataFrame:
    """Letterbox/pillarbox detection over RAW8 RGB payloads — the
    padded-frame screen an image-curation pipeline runs before cropping
    or training (uniform borders are added pixels, not content): per
    image, the fraction of BORDER pixels whose integer gray value
    ``(r+g+b)//3`` is within ``tol`` of the top-left corner's gray.
    A frac near 1 means the border is one flat color — letterboxed,
    padded, or a solid-background scan.

    Per-image local like :func:`audio_clipping_report`: one
    Arrow-batched mapInPandas decodes each payload against its meta
    dims and emits ONE row — pixels never shuffle. Dimension-mismatched
    payloads raise (decode error, not a silent skip). Exact integer
    gray comparison; frac is exact-integer division in double, 6
    decimals. Returns (media_id, n_border_px, n_matching,
    border_uniform_frac, is_letterboxed [frac ≥ 0.95]).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for m, p, w_, h_ in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                w, h = int(w_), int(h_)
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"image_border_uniformity: media {int(m)} payload "
                        f"{buf.size} bytes != {w}x{h}x3"
                    )
                px = buf.reshape(h, w, 3).astype(np.int64)
                gray = px.sum(axis=2) // 3
                border = np.zeros((h, w), dtype=bool)
                border[0, :] = border[-1, :] = True
                border[:, 0] = border[:, -1] = True
                bg = gray[border]
                corner = int(gray[0, 0])
                match = int((np.abs(bg - corner) <= tol).sum())
                out.append((int(m), int(bg.size), match))
            yield pd.DataFrame(
                out, columns=["media_id", "n_border_px", "n_matching"]
            )

    rep = df.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).mapInPandas(run, "media_id long, n_border_px long, n_matching long")
    frac = F.col("n_matching").cast("double") / F.col("n_border_px")
    return rep.select(
        "media_id",
        "n_border_px",
        "n_matching",
        F.round(frac, 6).alias("border_uniform_frac"),
        (frac >= 0.95).alias("is_letterboxed"),
    )


def video_motion_profile(
    frames: DataFrame,
    max_hamming: int = 10,
) -> DataFrame:
    """Per-video motion intensity profile — the triage scalar BEFORE
    :func:`scene_changes`' per-cut detail (a static slideshow, a
    continuous pan, and a jump-cut montage are different datasets):
    per video, frame count, mean and max adjacent-frame dHash hamming
    distance, and the number of hard cuts (hamming > ``max_hamming``).

    Rides the exact value-oracled machinery of :func:`scene_changes`
    (Arrow-batched per-frame dHash — only (video, idx, hash) triplets
    leave the decode, payloads never shuffle; one per-video lag
    window), then collapses to ONE row per video. mean_hamming is an
    exact integer sum divided once in double, 6 decimals; single-frame
    videos (no adjacent pairs) emit NULL mean/max and zero cuts.
    Returns (media_id, n_frames, n_pairs, mean_hamming, max_hamming_obs,
    n_cuts).
    """
    from pyspark.sql import Window

    hashed = dhash_images(frames, extra_cols=["frame_idx"])
    w = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    lagged = hashed.withColumn("__ph", F.lag("dhash").over(w))
    ham = F.bit_count(F.col("dhash").bitwiseXOR(F.col("__ph")))
    pairs = lagged.select(
        "media_id",
        F.when(F.col("__ph").isNotNull(), ham).alias("__ham"),
    )
    return pairs.groupBy("media_id").agg(
        (F.count(F.lit(1))).alias("n_frames"),
        F.count("__ham").alias("n_pairs"),
        F.round(
            F.sum("__ham").cast("double") / F.nullif(F.count("__ham"), F.lit(0)), 6
        ).alias("mean_hamming"),
        F.max("__ham").alias("max_hamming_obs"),
        F.coalesce(
            F.sum((F.col("__ham") > max_hamming).cast("int")), F.lit(0)
        ).cast("bigint").alias("n_cuts"),
    )


def arith_raw_audio_dither(
    spark,
    n: int = 32,
    n_samples: int = 2048,
    quiet_ranges: tuple = ((512, 768), (1536, 1664)),
) -> DataFrame:
    """:func:`arith_raw_audio_silence` with DITHERED quiet sections:
    samples inside ``quiet_ranges`` are ``127 + ((17·m + i) mod 3)``
    (values 127/128/129 — a ±1 LSB noise floor instead of digital
    zero) while the rest follow the closed-form arithmetic wave. The
    fixture for signal-to-noise estimation: pure digital silence has
    ZERO noise mass and makes any SNR ratio degenerate, so the SNR
    path needs a floor that is quiet-but-nonzero, still fully
    SQL-regenerable (a CASE over the sample index)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(n_samples, dtype=np.int64)
        quiet = np.zeros(n_samples, dtype=bool)
        for lo, hi in quiet_ranges:
            quiet[lo:hi] = True
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for m in pdf["id"]:
                v = (17 * int(m) + 11 * idx + (idx * idx) % 89) % 256
                v = np.where(quiet, 127 + (17 * int(m) + idx) % 3, v)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("audio").alias("kind"),
        "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def audio_snr_report(
    df: DataFrame,
    frame: int = 64,
    max_amp: int = 64,
) -> DataFrame:
    """Per-clip signal-to-noise estimate over 8-bit-PCM payloads — the
    recording-quality gate an audio-curation pipeline runs next to the
    clipping report (q260): frames classify as noise floor (integer
    amplitude mass Σ|v−128| at or below ``max_amp`` — the
    :func:`audio_silence_segments` silence rule) or signal, and
    SNR_dB = 10·log10(mean signal mass / mean noise mass). A clip
    that is all signal or all floor, or whose floor mass is exactly 0
    (digital silence), emits NULL SNR rather than ±inf — measure
    those with the silence/clipping reports instead.

    Shape: frame masses are the same Arrow-batched mapInPandas scan
    as the silence path (payloads never shuffle — only
    (media, frame, mass) triplets leave the map), then ONE media-keyed
    aggregation of exact integer counts/masses; the two means and the
    log ratio are a fixed-order double expression over those integers.
    Returns (media_id, n_frames, n_floor_frames, floor_frac,
    mean_signal_mass, mean_floor_mass, snr_db), 6-decimal.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                nf = buf.size // frame
                if nf == 0:
                    continue
                amp = (
                    np.abs(buf[: nf * frame].astype(np.int64) - 128)
                    .reshape(nf, frame)
                    .sum(axis=1)
                )
                for i, a in enumerate(amp):
                    out.append((int(m), i, int(a)))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "amp"])

    masses = df.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, amp long"
    )
    is_floor = F.col("amp") <= F.lit(int(max_amp))
    agg = masses.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(is_floor.cast("bigint")).alias("n_floor_frames"),
        F.sum(F.when(is_floor, F.col("amp"))).alias("__floor_mass"),
        F.sum(F.when(~is_floor, F.col("amp"))).alias("__sig_mass"),
    )
    n_sig = (F.col("n_frames") - F.col("n_floor_frames")).cast("double")
    n_flr = F.col("n_floor_frames").cast("double")
    sig_mean = F.col("__sig_mass").cast("double") / n_sig
    flr_mean = F.col("__floor_mass").cast("double") / n_flr
    ok = (
        (F.col("n_floor_frames") > 0)
        & (F.col("n_frames") > F.col("n_floor_frames"))
        & (F.col("__floor_mass") > 0)
    )
    return agg.select(
        "media_id",
        "n_frames",
        "n_floor_frames",
        F.round(n_flr / F.col("n_frames"), 6).alias("floor_frac"),
        F.when(
            F.col("n_frames") > F.col("n_floor_frames"), F.round(sig_mean, 6)
        ).alias("mean_signal_mass"),
        F.when(F.col("n_floor_frames") > 0, F.round(flr_mean, 6)).alias(
            "mean_floor_mass"
        ),
        F.when(ok, F.round(10.0 * F.log(10.0, sig_mean / flr_mean), 6)).alias(
            "snr_db"
        ),
    )


def image_exposure_report(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-image exposure/contrast QC over RAW8 RGB payloads: gray-level
    histogram entropy (bits, over ``n_bins`` uniform luma bins),
    crushed-shadow and blown-highlight fractions (gray ≤ 7 / ≥ 248),
    and the observed gray range — the cheap screens for
    black/overexposed/low-contrast frames a vision-data pipeline drops
    before paying for resize and embedding. Gray is the integer
    (r + g + b) // 3 luma (the :func:`image_border_uniformity`
    convention).

    Shape: decode and the whole histogram reduce inside the Arrow
    batch (payloads never shuffle; one summary row per image leaves
    the map). Determinism: entropy uses the partial-summable
    H = log2(n) − Σ c·log2(c)/n form with every c·log2(c) term rounded
    to an integer at micro-units BEFORE the (exact, order-free) sum —
    the same quantize-then-sum recipe as the stats family, replayed
    term-for-term by the SQL oracle. Returns (media_id, n_px,
    entropy_bits, shadow_frac, highlight_frac, gray_min, gray_max),
    6-decimal. ``n_bins`` must divide 256 evenly — a non-divisor would
    silently spill gray 255 into an (n_bins+1)-th bin and feed the
    entropy a different binning than documented (review finding, r11),
    so it fails loudly instead.
    """
    nb = int(n_bins)
    if nb < 1 or 256 % nb != 0:
        raise ValueError(
            f"image_exposure_report: n_bins={nb} must be a positive "
            "divisor of 256 (bin = gray // (256/n_bins))"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math as _math

        import numpy as np
        import pandas as pd

        width = 256 // nb
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                gray = buf.reshape(-1, 3).astype(np.int64).sum(axis=1) // 3
                n = gray.size
                counts = np.bincount(gray // width, minlength=nb)
                # half-up quantization (terms are non-negative) — Python
                # round() is half-to-even, which diverges from the oracle's
                # half-up on an exact .5 micro-unit (ADVICE r11)
                tq = sum(
                    int(_math.floor(float(c) * _math.log2(float(c)) * 1_000_000 + 0.5))
                    for c in counts
                    if c > 0
                )
                entropy = _math.log2(n) - tq / 1_000_000 / n
                rows.append(
                    (
                        int(m),
                        int(n),
                        round(entropy, 6),
                        round(int((gray <= 7).sum()) / n, 6),
                        round(int((gray >= 248).sum()) / n, 6),
                        int(gray.min()),
                        int(gray.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_px", "entropy_bits", "shadow_frac",
                    "highlight_frac", "gray_min", "gray_max",
                ],
            )

    return df.select(
        "media_id", "payload",
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
    ).mapInPandas(
        run,
        "media_id long, n_px long, entropy_bits double, shadow_frac double, "
        "highlight_frac double, gray_min long, gray_max long",
    )


def image_channel_balance(df: DataFrame) -> DataFrame:
    """Per-image color-cast QC over RAW8 RGB payloads: exact per-channel
    means, the gray-world cast range (max channel mean − min channel
    mean — a neutral scene averages equal channels; a strong cast is a
    white-balance failure worth dropping or correcting before feature
    extraction), and the dominant channel — the color companion to
    :func:`image_exposure_report`'s luma screens.

    Decode and the three channel sums reduce inside the Arrow batch
    (payloads never shuffle; one summary row per image leaves the map);
    sums are exact int64 (255·n_px bounded), means and the cast range
    are single divisions of those integers replayed by the SQL oracle.
    Dominant channel ties break r → g → b (first maximal in channel
    order, documented). Returns (media_id, n_px, mean_r, mean_g,
    mean_b, cast_range, dominant_channel), 6-decimal.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math as _math

        import numpy as np
        import pandas as pd

        # half-up 6-decimal rounding (values non-negative) — matches the
        # oracle's round(); Python round() is half-to-even (ADVICE r11)
        r6 = lambda x: _math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                px = buf.reshape(-1, 3).astype(np.int64)
                n = px.shape[0]
                sums = [int(px[:, k].sum()) for k in range(3)]
                dom = "rgb"[sums.index(max(sums))]  # tie → first in r,g,b
                rows.append(
                    (
                        int(m), int(n),
                        r6(sums[0] / n),
                        r6(sums[1] / n),
                        r6(sums[2] / n),
                        r6((max(sums) - min(sums)) / n),
                        dom,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_px", "mean_r", "mean_g", "mean_b",
                    "cast_range", "dominant_channel",
                ],
            )

    return df.select(
        "media_id", "payload",
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
    ).mapInPandas(
        run,
        "media_id long, n_px long, mean_r double, mean_g double, "
        "mean_b double, cast_range double, dominant_channel string",
    )


def arith_video_frames_frozen(
    spark,
    n_videos: int = 24,
    n_frames: int = 12,
    freeze_from: int = 4,
    freeze_len: int = 4,
    width: int = 16,
    height: int = 12,
    delta_bytes: int = 12,
) -> DataFrame:
    """:func:`arith_video_frames` variant with a PLANTED FREEZE instead
    of a scene cut: frames ``freeze_from .. freeze_from+freeze_len−1``
    all repeat frame ``freeze_from``'s exact payload (a stalled
    encoder / stuck capture), while every other frame carries the
    usual per-frame motion (+f on the first ``delta_bytes`` bytes), so
    adjacent non-frozen frames always differ. Every byte regenerable
    by integer SQL: the effective motion index is
    ``freeze_from`` inside the frozen range, ``f`` outside — the
    fixture that upgrades :func:`video_freeze_detect` to a full
    cross-engine value oracle. Schema: (media_id, kind, frame_idx,
    payload, meta)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        motion = (idx < delta_bytes).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids, fids, payloads = [], [], []
            for i in pdf["id"]:
                vid, f = divmod(int(i), n_frames)
                eff = freeze_from if freeze_from <= f < freeze_from + freeze_len else f
                v = (31 * vid + 7 * idx + (idx * idx) % 251 + eff * motion) % 256
                vids.append(vid)
                fids.append(f)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {"media_id": vids, "frame_idx": fids, "payload": payloads}
            )

    raw = spark.range(n_videos * n_frames).mapInPandas(
        gen, "media_id long, frame_idx int, payload binary"
    )
    return raw.select(
        "media_id",
        F.lit("video").alias("kind"),
        "frame_idx",
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ).alias("meta"),
    )


def video_freeze_detect(frames: DataFrame) -> DataFrame:
    """Per-video freeze detection: find runs of BYTE-IDENTICAL
    consecutive frames — the stalled-encoder/stuck-capture screen that
    :func:`video_motion_profile`'s perceptual dHash deliberately blurs
    past (small motion can hash equal; a freeze is exact repetition).
    Reports the static-pair count, fraction, and the longest identical
    run — a training pipeline drops or deduplicates frozen spans
    before paying for per-frame features.

    Identity is decided on a position-weighted frame checksum
    Σ byte_i·(i+1) (exact int64, computed INSIDE the Arrow batch —
    payloads never shuffle, only (video, idx, checksum) triplets leave
    the decode; byte-identical frames ALWAYS match, and distinct
    frames collide only on an adversarial checksum collision —
    documented, the fixture and any real stuck-capture case are
    collision-free). One per-video lag window marks static pairs — a
    pair counts only when the ``frame_idx`` delta is exactly 1, so the
    pair notion and the island splitter's gap rule agree on what
    "consecutive" means even for sampled/non-contiguous frame indices
    (review finding, r12) — and the lag-gap island pattern
    (:func:`audio_clipping_report`) sizes the longest run.
    Single-frame videos emit zero pairs and NULL fraction. Returns
    (media_id, n_frames, n_static_pairs, freeze_frac,
    longest_freeze_frames), 6-decimal.
    """
    from pyspark.sql import Window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, fi, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                w = int((buf * (np.arange(buf.size, dtype=np.int64) + 1)).sum())
                rows.append((int(m), int(fi), w))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "cksum"]
            )

    sums = frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, "media_id long, frame_idx int, cksum long"
    )
    w = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    lagged = sums.withColumn("__pc", F.lag("cksum").over(w)).withColumn(
        "__pf", F.lag("frame_idx").over(w)
    )
    # a static PAIR requires frame_idx delta == 1, matching the island
    # splitter's gap > 1 rule — otherwise a sampled video (even indices
    # only) would mark row-adjacent pairs static but fragment every run
    # (review finding, r12)
    marked = lagged.select(
        "media_id",
        "frame_idx",
        F.when(
            F.col("__pc").isNotNull(),
            (
                (F.col("cksum") == F.col("__pc"))
                & (F.col("frame_idx") - F.col("__pf") == 1)
            ).cast("int"),
        ).alias("__static"),
    )
    # islands over the static-pair indices (gap > 1 starts a new run)
    st = marked.where(F.col("__static") == 1)
    wi = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    isl = st.withColumn(
        "__new",
        F.when(
            F.lag("frame_idx").over(wi).isNull()
            | (F.col("frame_idx") - F.lag("frame_idx").over(wi) > 1),
            1,
        ).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new").over(wi.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = isl.groupBy("media_id", "__island").agg(
        F.count(F.lit(1)).alias("__run")
    ).groupBy("media_id").agg(F.max("__run").alias("__longest_pairs"))
    base = marked.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.coalesce(F.sum("__static"), F.lit(0)).cast("bigint").alias(
            "n_static_pairs"
        ),
    )
    return base.join(runs, "media_id", "left").select(
        "media_id",
        "n_frames",
        "n_static_pairs",
        F.when(
            F.col("n_frames") >= 2,
            F.round(
                F.col("n_static_pairs").cast("double") / (F.col("n_frames") - 1),
                6,
            ),
        ).alias("freeze_frac"),
        # a run of k static PAIRS is k+1 identical frames; no freeze → 1
        F.coalesce(F.col("__longest_pairs") + 1, F.lit(1)).cast("bigint").alias(
            "longest_freeze_frames"
        ),
    )


def arith_raw_audio_am(
    spark,
    n: int = 32,
    n_samples: int = 2048,
    frame: int = 64,
    period_frames: int = 4,
    duty_frames: int = 2,
) -> DataFrame:
    """Amplitude-modulated arithmetic audio fixture: frame
    ``fr = i // frame`` is QUIET (the ±1 LSB dither floor,
    ``127 + (17·m + i) mod 3``) when ``fr mod period_frames <
    duty_frames`` and LOUD (the arithmetic wave) otherwise — a
    loud/quiet envelope with an exact ``period_frames`` cycle, every
    sample regenerable by a CASE over integer SQL. The fixture that
    gives :func:`audio_envelope_periodicity` a planted ground-truth
    period. Same schema/meta contract as the other audio sources."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(n_samples, dtype=np.int64)
        quiet = (idx // frame) % period_frames < duty_frames
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for m in pdf["id"]:
                v = (17 * int(m) + 11 * idx + (idx * idx) % 89) % 256
                v = np.where(quiet, 127 + (17 * int(m) + idx) % 3, v)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("audio").alias("kind"),
        "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def audio_envelope_periodicity(
    df: DataFrame,
    frame: int = 64,
    max_lag: int = 8,
) -> DataFrame:
    """Per-clip envelope periodicity: frame the 8-bit PCM payload into
    ``frame``-sample amplitude masses (Σ|v − 128| — the
    :func:`audio_snr_report` envelope), correlate the envelope with
    itself at lags 1..max_lag, and report the best lag — the
    beat/cadence estimate ("does this clip pulse, and how fast") that
    triages rhythmic content before any real DSP, the audio analogue
    of q246's series ACF.

    Framing reduces INSIDE the Arrow batch — payloads never shuffle,
    only (clip, frame, mass) rows leave the decode (n_samples/frame
    per clip, bounded). The per-clip ACF rides ONE lag window over
    exact integer masses (≤ 128·frame — integer moments, no
    quantization needed) with the q246 conventions: available-pairs
    correlation, NULL for constant/short series. best_lag is the
    smallest lag attaining the maximal ROUNDED acf (deterministic
    tiebreak, documented); clips with no usable lag emit NULL.
    Returns (media_id, n_frames, best_lag, best_acf), 6-decimal.
    """
    from pyspark.sql import Window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                n_fr = buf.size // frame
                amp = (
                    np.abs(buf[: n_fr * frame] - 128)
                    .reshape(n_fr, frame)
                    .sum(axis=1)
                )
                rows.extend(
                    (int(m), int(fr), int(a)) for fr, a in enumerate(amp)
                )
            yield pd.DataFrame(rows, columns=["media_id", "fr", "amp"])

    from .windows import _unpivot_lag_pearson

    env = df.select("media_id", "payload").mapInPandas(
        run, "media_id long, fr int, amp long"
    )
    w = Window.partitionBy("media_id").orderBy(F.col("fr").asc())
    lag_cols = [
        F.lag(F.col("amp"), k).over(w).alias(f"__s{k - 1}")
        for k in range(1, max_lag + 1)
    ]
    wide = env.select("media_id", F.col("amp").alias("__v"), *lag_cols)
    acf = _unpivot_lag_pearson(
        wide, ["media_id"], list(range(1, max_lag + 1)), "__acf", scale=None
    ).drop("n_pairs")
    n_frames = env.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    wb = Window.partitionBy("media_id").orderBy(
        F.col("__acf").desc_nulls_last(), F.col("lag").asc()
    )
    best = (
        acf.where(F.col("__acf").isNotNull())
        .withColumn("__rn", F.row_number().over(wb))
        .where(F.col("__rn") == 1)
        .select(
            "media_id",
            F.col("lag").alias("best_lag"),
            F.col("__acf").alias("best_acf"),
        )
    )
    return n_frames.join(best, "media_id", "left").select(
        "media_id",
        "n_frames",
        F.col("best_lag").cast("int"),
        "best_acf",
    )


def arith_raw_images_blurred(
    spark, n: int = 64, width: int = 16, height: int = 12
) -> DataFrame:
    """:func:`arith_raw_images` variant where every ODD ``media_id`` is
    horizontally box-blurred — interior pixels carry the same-row
    same-channel 3-tap floor mean (v(i−3)+v(i)+v(i+3)) // 3, edge
    columns copy the base formula — so the table mixes sharp and
    smoothed images of the SAME underlying composition. Every byte
    stays regenerable by integer SQL (the arithmetic-fixture
    convention), which is what gives :func:`image_blur_score` a full
    cross-engine value oracle instead of a rows-only check."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for m in pdf["id"]:
                v = (31 * int(m) + 7 * idx + (idx * idx) % 251) % 256
                if int(m) % 2 == 1:
                    img = v.reshape(height, width, 3)
                    out = img.copy()
                    out[:, 1 : width - 1, :] = (
                        img[:, 0 : width - 2, :]
                        + img[:, 1 : width - 1, :]
                        + img[:, 2:width, :]
                    ) // 3
                    v = out.reshape(-1)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["id"].values, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def image_blur_score(df: DataFrame) -> DataFrame:
    """Per-image sharpness via the variance of a horizontal Laplacian
    over the gray plane — the classic blur screen (smoothing collapses
    second-derivative energy) that a vision-data pipeline runs before
    paying for embeddings: low variance = blurred/flat/duplicate-ish
    frame, a drop or down-weight candidate. Complements
    :func:`image_exposure_report` (tonal distribution) and
    :func:`image_border_uniformity` (letterboxing).

    Decode and reduce INSIDE the Arrow batch (payloads never shuffle):
    gray = r+g+b per pixel (pure integers, no luma weights — exactly
    regenerable in SQL), lap(x) = 2·g(x) − g(x−1) − g(x+1) over
    interior columns, then exact integer n, Σlap, Σlap², Σ|lap| into
    the one fixed-order finalize (population variance, 6-decimal
    half-away rounding — the :func:`~.stats._round6_half_away`
    convention inside the closure). A payload whose length doesn't
    match the meta dims raises (decode error, not a silent skip).
    Returns (media_id, n_lap, lap_var, mean_abs_lap).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        def rnd6(x):
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                gray = buf.reshape(h, w, 3).astype(np.int64).sum(axis=2)
                lap = 2 * gray[:, 1:-1] - gray[:, :-2] - gray[:, 2:]
                n = lap.size
                if n == 0:  # width < 3: no interior column, no Laplacian
                    rows.append((int(m), 0, None, None))
                    continue
                s = int(lap.sum())
                s2 = int((lap * lap).sum())
                sa = int(np.abs(lap).sum())
                # square in DOUBLE, not exact int: the oracle computes
                # CAST(s AS DOUBLE)*CAST(s AS DOUBLE), and past 2^53 an
                # exact-int square would round differently at the 6th
                # decimal (ADVICE r12) — same domain on both sides.
                var = (s2 - float(s) * float(s) / n) / n
                rows.append((int(m), n, rnd6(var), rnd6(sa / n)))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_lap", "lap_var", "mean_abs_lap"]
            )

    flat = df.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(
        run,
        "media_id long, n_lap bigint, lap_var double, mean_abs_lap double",
    )


def arith_video_frames_black(
    spark,
    n_videos: int = 24,
    n_frames: int = 12,
    black_from: int = 5,
    black_len: int = 3,
    width: int = 16,
    height: int = 12,
    delta_bytes: int = 12,
) -> DataFrame:
    """:func:`arith_video_frames` variant with a PLANTED BLACK SEGMENT:
    frames ``black_from .. black_from+black_len−1`` carry the base
    pixel formula reduced mod 8 (mean byte ≈ 3.5 — a fade-to-black /
    dropped-signal span), every other frame the usual mod-256 formula
    with per-frame motion. Every byte regenerable by integer SQL — the
    fixture that upgrades :func:`video_black_frames` to a full
    cross-engine value oracle. Schema: (media_id, kind, frame_idx,
    payload, meta)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        motion = (idx < delta_bytes).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids, fids, payloads = [], [], []
            for i in pdf["id"]:
                vid, f = divmod(int(i), n_frames)
                base = 31 * vid + 7 * idx + (idx * idx) % 251
                if black_from <= f < black_from + black_len:
                    v = base % 8
                else:
                    v = (base + f * motion) % 256
                vids.append(vid)
                fids.append(f)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {"media_id": vids, "frame_idx": fids, "payload": payloads}
            )

    raw = spark.range(n_videos * n_frames).mapInPandas(
        gen, "media_id long, frame_idx int, payload binary"
    )
    return raw.select(
        "media_id",
        F.lit("video").alias("kind"),
        "frame_idx",
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ).alias("meta"),
    )


def video_black_frames(frames: DataFrame, thr_mean: int = 32) -> DataFrame:
    """Per-video black/blank-frame detection: frames whose mean byte
    falls below ``thr_mean`` (decided as the INTEGER comparison
    Σbytes < thr·size — no division, bit-identical anywhere), with
    run-length accounting — the signal-loss/fade screen next to
    :func:`video_freeze_detect` (repetition) and
    :func:`scene_changes` (cuts): a training pipeline drops black
    spans before paying for per-frame features.

    Only (video, idx, luma-sum) triplets leave the Arrow decode —
    payloads never shuffle. Consecutive means ``frame_idx`` delta 1
    (the freeze-detect convention for sampled frame indices); runs are
    the lag-gap island pattern. Returns
    (media_id, n_frames, n_black, black_frac, longest_black_run).
    """
    from pyspark.sql import Window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, fi, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                rows.append((int(m), int(fi), int(buf.sum()), int(buf.size)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "lsum", "size"]
            )

    sums = frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, "media_id long, frame_idx int, lsum long, size long"
    )
    marked = sums.select(
        "media_id",
        "frame_idx",
        (F.col("lsum") < F.lit(int(thr_mean)) * F.col("size")).cast("int").alias(
            "__black"
        ),
    )
    blk = marked.where(F.col("__black") == 1)
    wi = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    isl = blk.withColumn(
        "__new",
        F.when(
            F.lag("frame_idx").over(wi).isNull()
            | (F.col("frame_idx") - F.lag("frame_idx").over(wi) > 1),
            1,
        ).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new").over(wi.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = (
        isl.groupBy("media_id", "__island")
        .agg(F.count(F.lit(1)).alias("__run"))
        .groupBy("media_id")
        .agg(F.max("__run").alias("__longest"))
    )
    base = marked.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.coalesce(F.sum("__black"), F.lit(0)).cast("bigint").alias("n_black"),
    )
    return base.join(runs, "media_id", "left").select(
        "media_id",
        "n_frames",
        "n_black",
        F.round(F.col("n_black").cast("double") / F.col("n_frames"), 6).alias(
            "black_frac"
        ),
        F.coalesce(F.col("__longest"), F.lit(0)).cast("bigint").alias(
            "longest_black_run"
        ),
    )


def audio_dynamic_range(df: DataFrame) -> DataFrame:
    """Per-clip crest factor (peak / RMS of the centered 8-bit wave) and
    its dB reading — the mastering-QC companion to
    :func:`audio_clipping_report` (rail hits) and
    :func:`audio_snr_report` (noise floor): a crest factor near 1
    (≈0 dB) is a square-wave/over-compressed signal, a high one is
    dynamic material; both extremes are drop candidates for
    speech-corpus curation.

    Decode and reduce INSIDE the Arrow batch: center c = v − 128
    (exact ints), peak = max|c|, Σc² exact; RMS = √(Σc²/n) and
    crest_db = 20·log10(peak/rms) are one fixed-order finalize with
    half-away 6-decimal rounding (the closure-local
    :func:`~.stats._round6_half_away` recipe). Silent clips (all
    zeros → RMS 0) emit NULL crest. Returns
    (media_id, n_samples, peak, rms, crest_db).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        def rnd6(x):
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                c = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64) - 128
                n = c.size
                if n == 0:
                    rows.append((int(m), 0, 0, None, None))
                    continue
                peak = int(np.abs(c).max())
                s2 = int((c * c).sum())
                rms = math.sqrt(s2 / n)
                crest = None
                if rms > 0 and peak > 0:
                    crest = rnd6(20.0 * math.log10(peak / rms))
                rows.append(
                    (int(m), n, peak, rnd6(rms) if n else None, crest)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "peak", "rms", "crest_db"],
            )

    return df.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, n_samples bigint, peak bigint, rms double, "
        "crest_db double",
    )


def image_colorfulness(df: DataFrame) -> DataFrame:
    """Hasler–Süsstrunk colorfulness metric per RAW8 RGB image:
    M = √(σ²_rg + σ²_yb) + 0.3·√(μ²_rg + μ²_yb) over the opponent
    channels rg = R−G and yb = (R+G)/2 − B — the "is this basically
    grayscale / a flat graphic" screen a vision-ingest pipeline reads
    beside :func:`image_exposure_report` (exposure) and
    :func:`image_channel_balance` (tint): screenshots, scanned text,
    and synthetic charts score near zero; natural photos score high.

    Exactness: opponent values stay INTEGER inside the Arrow batch —
    rg and the doubled yb2 = R+G−2B accumulate exact int64 moments
    (Σx, Σx²), payloads never shuffle, one summary row per image
    leaves the map. The finalize mirrors the oracle operand-for-
    operand: population variance (Σx² − (Σx)²/n)/n with the prefix
    square taken in DOUBLE (the blur-score squaring-domain convention,
    ADVICE r12), the yb moments rescaled by /2 and /4 AFTER the
    integer math, 6-decimal half-away rounding. Returns
    (media_id, n_px, mean_rg, mean_yb, std_rg, std_yb, colorfulness).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        def rnd6(x):
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                px = buf.reshape(-1, 3).astype(np.int64)
                rg = px[:, 0] - px[:, 1]
                yb2 = px[:, 0] + px[:, 1] - 2 * px[:, 2]
                n = rg.size
                sr, srr = int(rg.sum()), int((rg * rg).sum())
                sy, syy = int(yb2.sum()), int((yb2 * yb2).sum())
                vr = (srr - float(sr) * float(sr) / n) / n
                vy = ((syy - float(sy) * float(sy) / n) / n) / 4.0
                mr = sr / n
                my = (sy / n) / 2.0
                colorful = math.sqrt(vr + vy) + 0.3 * math.sqrt(mr * mr + my * my)
                rows.append((
                    int(m), n, rnd6(mr), rnd6(my),
                    rnd6(math.sqrt(vr)), rnd6(math.sqrt(vy)), rnd6(colorful),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_px", "mean_rg", "mean_yb",
                    "std_rg", "std_yb", "colorfulness",
                ],
            )

    flat = df.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(
        run,
        "media_id long, n_px bigint, mean_rg double, mean_yb double, "
        "std_rg double, std_yb double, colorfulness double",
    )


def audio_zero_crossing(df: DataFrame) -> DataFrame:
    """Zero-crossing rate per 8-bit-PCM clip — the classic cheap
    voiced/unvoiced and tone-vs-noise discriminator (speech vowels
    cross rarely, fricatives and white noise constantly, pure DC
    never): the spectral-free screen beside :func:`audio_snr_report`
    (level) and :func:`audio_envelope_periodicity` (rhythm) that a
    transcription pipeline reads to route clips before paying for a
    model.

    A sample is non-negative iff byte ≥ 128 (the 8-bit-PCM midpoint);
    a crossing is a sign change between CONSECUTIVE samples, counted
    as an exact integer INSIDE the Arrow batch (payloads never
    shuffle; one row per clip leaves the map). zcr = crossings/(n−1)
    is one division, 6-decimal half-away; a single-sample (or empty)
    clip has no pairs → NULL zcr. Returns
    (media_id, n_samples, n_crossings, zcr).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        def rnd6(x):
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                n = buf.size
                if n < 2:
                    rows.append((int(m), n, 0, None))
                    continue
                nonneg = buf >= 128
                cross = int((nonneg[1:] != nonneg[:-1]).sum())
                rows.append((int(m), n, cross, rnd6(cross / (n - 1))))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "n_crossings", "zcr"]
            )

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id long, n_samples bigint, n_crossings bigint, zcr double"
    )


def arith_video_frames_looped(
    spark,
    n_videos: int = 24,
    n_frames: int = 12,
    period: int = 4,
    width: int = 16,
    height: int = 12,
    delta_bytes: int = 12,
) -> DataFrame:
    """:func:`arith_video_frames` variant whose content CYCLES with a
    planted period: frame f carries motion index ``f mod period``, so
    frames exactly ``period`` apart are byte-identical while adjacent
    frames differ (period ≥ 2) — a stuck playlist / looping screen
    recording. ``period`` ≥ ``n_frames`` yields a loop-free clip;
    ``period = 1`` degenerates to an all-frozen clip (every frame
    identical — the freeze-detect fixture's limit case). Every byte is
    regenerable by integer SQL — the fixture that gives
    :func:`video_loop_detect` a full cross-engine value oracle.
    Schema: (media_id, kind, frame_idx, payload, meta).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        motion = (idx < delta_bytes).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids, fids, payloads = [], [], []
            for i in pdf["id"]:
                vid, f = divmod(int(i), n_frames)
                eff = f % period
                v = (31 * vid + 7 * idx + (idx * idx) % 251 + eff * motion) % 256
                vids.append(vid)
                fids.append(f)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {"media_id": vids, "frame_idx": fids, "payload": payloads}
            )

    raw = spark.range(n_videos * n_frames).mapInPandas(
        gen, "media_id long, frame_idx int, payload binary"
    )
    return raw.select(
        "media_id",
        F.lit("video").alias("kind"),
        "frame_idx",
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ).alias("meta"),
    )


def video_loop_detect(frames: DataFrame) -> DataFrame:
    """Per-video LOOP detection: byte-identical frames at ANY distance —
    the repeated-content screen that :func:`video_freeze_detect`
    (identical CONSECUTIVE frames only) deliberately misses: a looping
    screen recording or stuck playlist repeats frames at its period,
    never adjacently. Reports the distinct-frame count, the repeated-
    pair count, and the minimum and DOMINANT repeat gaps — a clip
    whose dominant gap g covers most frames is a loop of period g; a
    dominant gap of 1 is a freeze (agreeing with freeze detect).

    Shape: the freeze-detect checksum recipe — each frame reduces to a
    position-weighted byte checksum Σ byte_i·(i+1) INSIDE the Arrow
    batch, so only (video, frame_idx, checksum) triplets shuffle.
    Repeats are consecutive occurrences of the same checksum in
    frame order: ONE per-(video, checksum) lag window yields the gap
    list, and the dominant gap is a bounded count-rank with ties to
    the SMALLEST gap (both engines). Distinct frames collide only on
    an adversarial checksum collision (documented — the freeze-detect
    caveat). Returns (media_id, n_frames, n_distinct_frames,
    n_repeat_pairs, min_repeat_gap, dominant_gap, dominant_gap_n);
    loop-free clips report zero pairs and NULL gaps.
    """
    from pyspark.sql import Window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, fi, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                w = int((buf * (np.arange(buf.size, dtype=np.int64) + 1)).sum())
                rows.append((int(m), int(fi), w))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "cksum"]
            )

    sums = frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, "media_id long, frame_idx int, cksum long"
    )
    wg = Window.partitionBy("media_id", "cksum").orderBy(
        F.col("frame_idx").asc()
    )
    gaps = sums.select(
        "media_id",
        (F.col("frame_idx") - F.lag("frame_idx").over(wg)).alias("__gap"),
    ).where(F.col("__gap").isNotNull())
    per_gap = gaps.groupBy("media_id", "__gap").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    wr = Window.partitionBy("media_id").orderBy(
        F.col("__c").desc(), F.col("__gap").asc()
    )
    dom = (
        per_gap.withColumn("__rn", F.row_number().over(wr))
        .where(F.col("__rn") == 1)
        .select(
            "media_id",
            F.col("__gap").alias("dominant_gap"),
            F.col("__c").alias("dominant_gap_n"),
        )
    )
    rep = per_gap.groupBy("media_id").agg(
        F.sum("__c").cast("bigint").alias("n_repeat_pairs"),
        F.min("__gap").cast("int").alias("min_repeat_gap"),
    )
    base = sums.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.countDistinct("cksum").cast("bigint").alias("n_distinct_frames"),
    )
    return (
        base.join(rep, "media_id", "left")
        .join(dom, "media_id", "left")
        .select(
            "media_id",
            "n_frames",
            "n_distinct_frames",
            F.coalesce(F.col("n_repeat_pairs"), F.lit(0)).cast("bigint").alias(
                "n_repeat_pairs"
            ),
            "min_repeat_gap",
            F.col("dominant_gap").cast("int").alias("dominant_gap"),
            "dominant_gap_n",
        )
    )


def image_symmetry(df: DataFrame) -> DataFrame:
    """Horizontal-mirror symmetry per RAW8 RGB image: the absolute
    gray-mass difference between the left half and the MIRRORED right
    half, normalized by the two halves' combined mass — 1.0 = a
    perfectly mirror-symmetric frame. Symmetric frames are the
    signature of logos, borders/letterboxes, test cards, and template
    graphics a vision-curation pipeline down-weights (natural photos
    are rarely mirror-exact): the structural complement to
    :func:`image_border_uniformity` (edges) and
    :func:`image_colorfulness` (palette).

    Gray stays the INTEGER channel sum r+g+b (no division — exact);
    the pairwise |left − mirrored-right| mass and both half-masses are
    exact int64 sums INSIDE the Arrow batch (payloads never shuffle;
    one row per image leaves the map). symmetry_score =
    1 − diff/(left+right) is one fixed-order double (triangle
    inequality bounds it to [0, 1]); an odd width ignores the center
    column; a zero-mass (all-black) frame reports NULL score (0/0 is
    a convention, not a number). Returns
    (media_id, n_px_pairs, diff_mass, half_mass, symmetry_score),
    6-decimal.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        def rnd6(x):
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                gray = buf.reshape(h, w, 3).astype(np.int64).sum(axis=2)
                half = w // 2
                left = gray[:, :half]
                right = np.flip(gray[:, w - half:], axis=1)
                diff = int(np.abs(left - right).sum())
                hm = int(left.sum() + right.sum())
                score = None if hm == 0 else rnd6(1.0 - diff / hm)
                rows.append((int(m), h * half, diff, hm, score))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_px_pairs", "diff_mass", "half_mass",
                    "symmetry_score",
                ],
            )

    flat = df.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(
        run,
        "media_id long, n_px_pairs bigint, diff_mass bigint, half_mass bigint, "
        "symmetry_score double",
    )


def video_shot_stats(frames: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Per-video shot structure from the :func:`scene_changes` cut
    signal: shot count, mean/longest/shortest shot length in frames —
    the editing-rhythm readout a video-curation pipeline uses to
    separate static lectures (one long shot) from music-video cutting
    (many 1–2 frame shots) and to budget per-shot keyframe sampling
    (:func:`video_keyframe_select` picks WITHIN shots; this sizes
    them).

    Same machinery as the graded q239 cut detector — dHash per frame
    in the Arrow batch (payloads never shuffle), ONE per-video lag
    window marks shot STARTS (first frame, or adjacent hamming >
    ``max_hamming``), a running sum assigns shot ids, and one
    (video, shot) count yields the lengths — so gapped/sampled frame
    indices work (a shot is a run of ROWS, not an index span).
    Returns (media_id, n_frames, n_cuts, n_shots, mean_shot_frames,
    longest_shot_frames, shortest_shot_frames), 6-decimal mean.
    """
    from pyspark.sql import Window

    hashed = dhash_images(frames, extra_cols=["frame_idx"])
    w = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    prev = F.lag("dhash").over(w)
    marked = hashed.select(
        "media_id",
        "frame_idx",
        F.when(
            prev.isNull()
            | (F.bit_count(F.col("dhash").bitwiseXOR(prev)) > max_hamming),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__start"),
    )
    wi = (
        Window.partitionBy("media_id")
        .orderBy(F.col("frame_idx").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shots = (
        marked.select(
            "media_id", F.sum("__start").over(wi).alias("__shot")
        )
        .groupBy("media_id", "__shot")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__len"))
    )
    agg = shots.groupBy("media_id").agg(
        F.sum("__len").cast("bigint").alias("n_frames"),
        F.count(F.lit(1)).cast("bigint").alias("n_shots"),
        F.max("__len").alias("longest_shot_frames"),
        F.min("__len").alias("shortest_shot_frames"),
    )
    return agg.select(
        "media_id",
        "n_frames",
        (F.col("n_shots") - 1).cast("bigint").alias("n_cuts"),
        "n_shots",
        F.round(
            F.col("n_frames").cast("double") / F.col("n_shots"), 6
        ).alias("mean_shot_frames"),
        "longest_shot_frames",
        "shortest_shot_frames",
    )


def arith_video_frames_fade(
    spark,
    n_videos: int = 24,
    n_frames: int = 12,
    width: int = 16,
    height: int = 12,
) -> DataFrame:
    """:func:`arith_video_frames` variant with a PLANTED LINEAR FADE:
    every frame carries the base pixel formula scaled by the integer
    ramp ``(n_frames−1−f) // (n_frames−1)`` applied as
    ``v = (base % 256) · (n_frames−1−f) // (n_frames−1)`` — frame 0 is
    full brightness, the final frame is exactly black, and the
    brightness trajectory is monotonically decreasing in between (an
    end-of-clip fade-out / dying backlight). Every byte regenerable by
    integer SQL (one multiply + one floor division) — the fixture that
    gives :func:`video_brightness_slope` a full cross-engine value
    oracle. Schema: (media_id, kind, frame_idx, payload, meta)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        denom = n_frames - 1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids, fids, payloads = [], [], []
            for i in pdf["id"]:
                vid, f = divmod(int(i), n_frames)
                base = (31 * vid + 7 * idx + (idx * idx) % 251) % 256
                v = base * (denom - f) // denom if denom > 0 else base
                vids.append(vid)
                fids.append(f)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {"media_id": vids, "frame_idx": fids, "payload": payloads}
            )

    raw = spark.range(n_videos * n_frames).mapInPandas(
        gen, "media_id long, frame_idx int, payload binary"
    )
    return raw.select(
        "media_id",
        F.lit("video").alias("kind"),
        "frame_idx",
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ).alias("meta"),
    )


def video_brightness_slope(frames: DataFrame) -> DataFrame:
    """Per-video brightness trajectory: the least-squares slope of mean
    frame luma against frame index — the fade/exposure-drift detector
    completing the temporal-QC row (:func:`video_black_frames` finds
    frames ALREADY dark, :func:`video_freeze_detect` repetition,
    :func:`video_motion_profile` content change; this catches a clip
    DRIFTING dark or blooming bright before any single frame trips a
    threshold). A steady camera scores ≈ 0; a fade-out a clearly
    negative slope.

    Each frame reduces to ONE integer luma sum inside the Arrow batch
    (payloads never shuffle — the :func:`video_black_frames` decode
    convention); per-frame mean luma quantizes as the EXACT integer
    floor division lsum·10⁶ div size; the OLS over (frame_idx, qm)
    points is exact integer cross-moments per video divided ONCE.
    Returns (media_id, n_frames, mean_luma, luma_slope_per_frame,
    luma_range); videos with < 2 frames or a degenerate index spread
    emit NULL slope.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, fi, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                rows.append((int(m), int(fi), int(buf.sum()), int(buf.size)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "lsum", "size"]
            )

    sums = frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, "media_id long, frame_idx int, lsum long, size long"
    )
    # mean luma per frame in micro-units: EXACT integer floor division
    # (lsum ≤ 255·size keeps lsum·10⁶ far inside int64)
    qm = F.expr("lsum * 1000000 div size")
    x = F.col("frame_idx").cast("bigint")
    pts = sums.select("media_id", x.alias("__x"), qm.alias("__qm"))
    agg = pts.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("__x").alias("__sx"),
        F.sum("__qm").alias("__sy"),
        F.sum(F.col("__x") * F.col("__qm")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.min("__qm").alias("__lo"),
        F.max("__qm").alias("__hi"),
    )
    n = F.col("n_frames")
    den = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    ok = (n >= 2) & (den > 0)
    # mean and slope are EXACT integer ratios — emit the raw double
    # division (identical bits on both engines) instead of rounding:
    # these rationals land on .5-at-the-7th-digit boundaries routinely,
    # exactly where F.round (BigDecimal half-up) and a float-multiply
    # round() disagree (the mann_whitney/ADVICE-r11 bug class)
    return agg.select(
        "media_id",
        n.cast("bigint").alias("n_frames"),
        (F.col("__sy").cast("double") / n / 1_000_000).alias("mean_luma"),
        F.when(ok, num / den / 1_000_000).alias("luma_slope_per_frame"),
        ((F.col("__hi") - F.col("__lo")).cast("double") / 1_000_000).alias(
            "luma_range"
        ),
    )


def image_palette_size(df: DataFrame, bits_per_channel: int = 4) -> DataFrame:
    """Per-image effective palette census over RAW8 RGB payloads:
    distinct quantized colors (each channel keeps its top
    ``bits_per_channel`` bits — RGB444 by default, 4096 possible
    colors) and the share of the single most common one — the
    synthetic-content screen next to :func:`image_colorfulness`
    (spread) and :func:`image_exposure_report` (luma): screenshots,
    charts, and solid-background renders live on a handful of colors
    with one dominant; photographs spread across hundreds.

    Decode, quantize, and the distinct/top-share census all reduce
    inside the Arrow batch (payloads never shuffle; one summary row
    per image leaves the map). The color key is the pure integer
    (r≫s)·2^(2b) + (g≫s)·2^b + (b≫s); the top share is the exact
    integer ratio max_count/n_px with the half-up 6-decimal finalize.
    Top-color ties break toward the SMALLEST color key (documented —
    deterministic across engines). Returns
    (media_id, n_px, n_colors, top_color_key, top_color_share).
    """
    shift = 8 - int(bits_per_channel)
    bpc = int(bits_per_channel)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math as _math

        import numpy as np
        import pandas as pd

        r6 = lambda x: _math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"payload length {buf.size} is not a {h}x{w}x3 RAW8 RGB frame"
                    )
                px = buf.reshape(-1, 3).astype(np.int64) >> shift
                key = (px[:, 0] << (2 * bpc)) + (px[:, 1] << bpc) + px[:, 2]
                keys, counts = np.unique(key, return_counts=True)
                top = int(counts.max())
                # tie → smallest key: np.unique returns sorted keys, so
                # argmax takes the first (smallest) maximal key
                top_key = int(keys[int(counts.argmax())])
                n = int(key.size)
                rows.append(
                    (int(m), n, int(keys.size), top_key, r6(top / n))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_px", "n_colors", "top_color_key",
                    "top_color_share",
                ],
            )

    return df.select(
        "media_id", "payload",
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
    ).mapInPandas(
        run,
        "media_id long, n_px long, n_colors long, top_color_key long, "
        "top_color_share double",
    )


def video_frame_entropy(frames: DataFrame) -> DataFrame:
    """Per-video byte-entropy trajectory: each frame reduces to ONE
    quantized Shannon entropy of its byte histogram (micro-bits,
    0 = flat/black, 8 = uniform noise), per video the mean/min/max —
    the content-complexity screen completing the temporal-QC row (a
    near-zero MIN flags embedded black/flat spans the mean hides; a
    suspiciously HIGH mean flags noise/static; both are drop-or-route
    signals before paying for frame embeddings).

    The 256-bin histogram and the entropy both reduce INSIDE the Arrow
    batch — only (video, frame_idx, entropy-micro-int) triplets leave
    the decode, payloads never shuffle. Exactness: per-frame terms
    quantize as round_half_away(c·log₂(c/n)·10⁶) over exact integer
    ratios, the per-frame entropy re-quantizes as
    floor(−S/n + 0.5) micro-bits (S = the exact term-sum integer), and
    the per-video mean is the exact integer ratio Σhq/n_frames emitted
    UNROUNDED — both engines divide identical integers. Returns
    (media_id, n_frames, mean_entropy_bits, min_entropy_bits,
    max_entropy_bits).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math as _math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, fi, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                n = int(buf.size)
                counts = np.bincount(buf, minlength=256)
                s = 0
                for c in counts[counts > 0]:
                    c = int(c)
                    x = c * _math.log2(c / n) * 1_000_000
                    s += int(_math.copysign(_math.floor(abs(x) + 0.5), x))
                hq = int(_math.floor(-s / n + 0.5))  # micro-bits, ≥ 0
                rows.append((int(m), int(fi), hq))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "hq"])

    ent = frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, "media_id long, frame_idx int, hq long"
    )
    return ent.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        (F.sum("hq").cast("double") / F.count(F.lit(1)) / 1_000_000).alias(
            "mean_entropy_bits"
        ),
        (F.min("hq").cast("double") / 1_000_000).alias("min_entropy_bits"),
        (F.max("hq").cast("double") / 1_000_000).alias("max_entropy_bits"),
    )


def video_flicker_report(frames: DataFrame) -> DataFrame:
    """Per-video flicker detection — the sign-ALTERNATION rate of
    consecutive frame-luma deltas plus their mean per-pixel magnitude:
    strobing captures, corrupted interlacing, and ad-roll flash
    sequences oscillate (delta signs flip every frame) where normal
    footage trends or cuts — the temporal complement of
    :func:`video_black_frames` (level), :func:`video_freeze_detect`
    (repetition), and :func:`video_motion_profile` (magnitude): this
    reads the SIGN STRUCTURE. A frame-sampling policy skips flicker
    spans the way it skips freezes.

    Each frame reduces to ONE integer luma sum inside the Arrow batch
    (payloads never shuffle); deltas and their sign flips are per-video
    lag windows over the tiny sum frame. ZERO deltas (exact repeats —
    freeze frames) are EXCLUDED from the alternation sequence and
    counted (the :func:`~.windows.runs_test` at-median convention:
    a freeze is not evidence either way), so flip_rate = flips /
    (nonzero-deltas − 1). Integer masses end-to-end; the two ratios
    divide once each, half-up micro-rounded. Videos with < 2 nonzero
    deltas report NULL flip_rate; < 2 frames report NULL mean too.
    Returns (media_id, n_frames, n_deltas, n_zero_deltas, flip_rate,
    mean_abs_delta_px).
    """
    from pyspark.sql import Window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, fi, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                rows.append((int(m), int(fi), int(buf.sum()), int(buf.size)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "lsum", "size"]
            )

    sums = frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, "media_id long, frame_idx int, lsum long, size long"
    )
    wi = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    deltas = sums.select(
        "media_id",
        "size",
        (F.col("lsum") - F.lag("lsum").over(wi)).alias("__d"),
    )
    # the sign sequence needs its own per-video order: carry frame_idx
    nzo = sums.select(
        "media_id",
        "frame_idx",
        "size",
        (F.col("lsum") - F.lag("lsum").over(wi)).alias("__d"),
    ).where(F.col("__d").isNotNull() & (F.col("__d") != 0))
    ws = Window.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    flips = nzo.select(
        "media_id",
        F.when(
            F.lag(F.col("__d") > 0).over(ws).isNotNull()
            & (F.lag(F.col("__d") > 0).over(ws) != (F.col("__d") > 0)),
            1,
        ).otherwise(0).alias("__flip"),
        F.abs("__d").alias("__ad"),
        "size",
    )
    per_nz = flips.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nnz"),
        F.sum("__flip").cast("bigint").alias("__nf"),
    )
    base = deltas.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.when(F.col("__d").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_deltas"),
        F.sum(F.when(F.col("__d") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_zero_deltas"),
        F.sum(F.when(F.col("__d").isNotNull(), F.abs("__d")))
        .cast("decimal(38,0)").alias("__sad"),
        F.max("size").alias("__px"),
    )
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return base.join(per_nz, "media_id", "left").select(
        "media_id",
        "n_frames",
        "n_deltas",
        "n_zero_deltas",
        F.when(
            F.coalesce(F.col("__nnz"), F.lit(0)) >= 2,
            h6(
                F.col("__nf").cast("double")
                / (F.col("__nnz") - 1).cast("double")
            ),
        ).alias("flip_rate"),
        F.when(
            F.col("n_deltas") >= 1,
            h6(
                F.col("__sad").cast("double")
                / F.col("n_deltas").cast("double")
                / F.col("__px").cast("double")
            ),
        ).alias("mean_abs_delta_px"),
    )


def arith_raw_images_letterboxed(
    spark,
    n: int = 64,
    width: int = 16,
    height: int = 12,
    top_rows: int = 2,
    bottom_rows: int = 1,
) -> DataFrame:
    """:func:`arith_raw_images` variant with PLANTED LETTERBOX BANDS:
    the first ``top_rows`` and last ``bottom_rows`` pixel rows carry
    the base formula reduced mod 8 (near-black matte bars — the
    :func:`arith_video_frames_black` convention), every interior row
    the usual mod-256 formula. Every byte regenerable by integer SQL —
    the fixture that makes :func:`image_letterbox_detect` a full
    cross-engine value oracle. Schema: (media_id, kind, payload, meta).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        idx = np.arange(width * height * 3, dtype=np.int64)
        row = (idx // 3) // width
        barred = (row < top_rows) | (row >= height - bottom_rows)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, payloads = [], []
            for i in pdf["id"]:
                m = int(i)
                base = 31 * m + 7 * idx + (idx * idx) % 251
                v = np.where(barred, base % 8, base % 256)
                ids.append(m)
                payloads.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    raw = spark.range(n).mapInPandas(gen, "media_id long, payload binary")
    return raw.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def image_letterbox_detect(df: DataFrame, thr_mean: int = 32) -> DataFrame:
    """Per-image letterbox/pillarbox-bar detection (horizontal bands):
    count the near-black pixel rows hugging the TOP and BOTTOM edges —
    matte bars mean the true content is smaller than the stored frame,
    so crops, embeddings, and dedup hashes should run on the interior
    (:func:`image_border_uniformity` flags uniform 1-px borders;
    this measures multi-row BLACK bands specifically, the video-matte
    case). A row is dark when its integer luma sum clears
    Σbytes < thr·row_size (the :func:`video_black_frames` integer
    comparison — no division, bit-identical anywhere).

    Each image reduces INSIDE the Arrow batch to one (row, luma-sum)
    pair per pixel row — payloads never shuffle, ``height`` rows per
    image leave the map. Band depths need no island machinery: the top
    band is the index of the FIRST bright row (MIN over a conditional),
    the bottom band is rows-below-the-LAST-bright-row — an all-dark
    image reports both bands = height with zero content rows and is
    NOT letterboxed (no content to frame; documented). letterboxed =
    both bands ≥ 1 with content between. Returns (media_id, n_rows,
    top_band, bottom_band, n_content_rows, letterboxed).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                w, h = int(w), int(h)
                if buf.size != w * h * 3:
                    raise ValueError(
                        f"image_letterbox_detect: media {int(m)} payload "
                        f"size {buf.size} != {w}x{h}x3 RAW8"
                    )
                per_row = buf.reshape(h, w * 3).sum(axis=1)
                for y in range(h):
                    rows.append((int(m), y, int(per_row[y]), w * 3))
            yield pd.DataFrame(
                rows, columns=["media_id", "y", "rsum", "row_size"]
            )

    sums = df.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).mapInPandas(run, "media_id long, y int, rsum long, row_size long")
    marked = sums.select(
        "media_id",
        "y",
        (F.col("rsum") >= F.lit(int(thr_mean)) * F.col("row_size"))
        .cast("int").alias("__bright"),
    )
    agg = marked.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(F.when(F.col("__bright") == 1, F.col("y"))).alias("__first"),
        F.max(F.when(F.col("__bright") == 1, F.col("y"))).alias("__last"),
        F.sum("__bright").cast("bigint").alias("n_content_rows"),
    )
    top = F.coalesce(F.col("__first").cast("bigint"), F.col("n_rows"))
    bot = F.coalesce(
        F.col("n_rows") - 1 - F.col("__last").cast("bigint"), F.col("n_rows")
    )
    return agg.select(
        "media_id",
        "n_rows",
        top.alias("top_band"),
        bot.alias("bottom_band"),
        "n_content_rows",
        (
            (top >= 1) & (bot >= 1) & (F.col("n_content_rows") > 0)
        ).alias("letterboxed"),
    )


def audio_spectral_flatness(
    df: DataFrame,
    n_head: int = 256,
    n_bins: int = 32,
) -> DataFrame:
    """Spectral flatness (Wiener entropy) per 8-bit-PCM clip — the
    tonality screen the time-domain kit can't give:
    :func:`audio_zero_crossing` counts sign flips and
    :func:`audio_envelope_periodicity` sees rhythm, but a pure tone
    and narrowband noise can share both; flatness = geometric/
    arithmetic mean of the DFT power spectrum separates them
    (→1 white-noise-flat, →0 tonal/peaked) — the route-before-
    transcribe signal beside :func:`audio_snr_report`.

    OPERATING POINT (documented): the DFT runs over the first
    ``n_head`` samples (the clip head — a tonality screen, not a full
    spectrogram) at integer bins 1..``n_bins``, mean-removed so the
    DC offset can't masquerade as a peak. Exactness: the head mean is
    the exact rational Σv/n over byte integers; each trig term
    micro-quantizes half-away BEFORE summation (the
    :func:`~.windows.periodogram` quantized-transcendental convention,
    2π pinned to one double literal) so per-bin A/B sums are exact
    integers; power A²+B² accumulates in arbitrary-precision integers
    (HUGEINT in the oracle); per-bin ln(P) micro-quantizes before the
    exact integer sum, and the flatness/share finalize is a pinned
    operand-order double expression. Payloads never shuffle — one row
    per clip leaves the Arrow batch. Returns (media_id, n_samples,
    n_bins_used, spectral_flatness, dominant_bin, dominant_share);
    any zero-power bin pins flatness to exact 0.0 (geometric mean);
    clips with fewer than 2 head samples emit NULL flatness.
    """
    nh = int(n_head)
    nb = int(n_bins)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        two_pi = 6.283185307179586  # float(2·π), pinned as a literal

        def rnd6(x):
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        def qaway(arr):
            return np.copysign(np.floor(np.abs(arr) * 1e6 + 0.5), arr).astype(
                np.int64
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                n_total = buf.size
                head = buf[:nh].astype(np.float64)
                hn = head.size
                bins = min(nb, hn - 1)
                if hn < 2 or bins < 1:
                    rows.append((int(m), n_total, 0, None, None, None))
                    continue
                mean = float(int(head.sum())) / hn
                vc = head - mean
                idx = np.arange(hn, dtype=np.int64)
                powers = []
                for b in range(1, bins + 1):
                    x = two_pi * ((b * idx) % hn) / hn
                    aq = int(qaway(vc * np.cos(x)).sum())
                    bq = int(qaway(vc * np.sin(x)).sum())
                    powers.append(aq * aq + bq * bq)  # python ints: exact
                sp = sum(powers)
                if any(pw == 0 for pw in powers) or sp == 0:
                    flat = 0.0 if sp > 0 else None
                else:
                    qs = sum(
                        int(
                            math.copysign(
                                math.floor(
                                    abs(math.log(float(pw))) * 1e6 + 0.5
                                ),
                                math.log(float(pw)),
                            )
                        )
                        for pw in powers
                    )
                    flat = rnd6(
                        math.exp(qs / bins / 1e6) / (float(sp) / bins)
                    )
                dom = None
                share = None
                if sp > 0:
                    mx = max(powers)
                    dom = powers.index(mx) + 1
                    share = rnd6(float(mx) / float(sp))
                rows.append((int(m), n_total, bins, flat, dom, share))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "n_bins_used",
                    "spectral_flatness", "dominant_bin", "dominant_share",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, n_samples bigint, n_bins_used int, "
        "spectral_flatness double, dominant_bin int, dominant_share double",
    )
