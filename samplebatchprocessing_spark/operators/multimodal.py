"""Multimodal columns (north-star mandate): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas transforms.

Design (the part that must be right at 100 TB):
- bytes travel as parquet BINARY; metadata is a typed struct column
  next to them — never parsed out of filenames at query time;
- every media transform is a ``mapInPandas`` stage: Arrow moves the
  bytes Python-side once per batch, numpy does the per-batch work,
  and the operator composes with any relational plan before/after;
- partition sizing: media rows are large, so upstream readers set
  ``spark.sql.files.maxPartitionBytes`` (session default) and the
  batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Codecs: the real decode (JPEG/PNG/audio) needs libraries this image
doesn't ship (Pillow/libsndfile).  Per the project contract those
steps are STUBBED — ``decode=...`` hooks accept a real decoder when
available and otherwise use the deterministic fake below, which
derives pixel/sample arrays from the bytes via a seeded hash so every
downstream shape/statistic is real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # the real decoder, when the environment has it
    from PIL import Image  # type: ignore  # noqa: F401
    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def fake_decode_image(raw: bytes, height: int, width: int) -> np.ndarray:
    """Deterministic stand-in for JPEG/PNG decode: expand a sha256
    stream of the bytes into an (h, w, 3) uint8 array.  Stable across
    processes — safe for hash-checked tests."""
    need = height * width * 3
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(raw + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(
        height, width, 3)


def real_decode_image(raw: bytes, height: int, width: int) -> np.ndarray:
    """Real decode path (requires Pillow — absent in this image)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; use fake_decode_image or "
            "install PIL on the cluster")
    import io
    from PIL import Image
    img = Image.open(io.BytesIO(raw)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


IMAGE_FEATURES_SCHEMA = ("media_id long, height int, width int, "
                         "mean_r double, mean_g double, mean_b double, "
                         "brightness double, phash long")


def image_features(df: DataFrame, *,
                   decode: Callable[[bytes, int, int], np.ndarray]
                   = fake_decode_image) -> DataFrame:
    """Decode -> per-channel means, brightness, and a 64-bit
    perceptual hash (average-hash over an 8x8 downsample).
    Input: (media_id long, content binary, meta struct<height,width>).
    """
    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                h, w = int(r.meta["height"]), int(r.meta["width"])
                px = decode(bytes(r.content), h, w).astype(np.float64)
                means = px.mean(axis=(0, 1))
                gray = px.mean(axis=2)
                # average-hash: 8x8 block means vs global mean
                bh, bw = max(h // 8, 1), max(w // 8, 1)
                small = gray[:bh * 8, :bw * 8].reshape(
                    8, bh, 8, bw).mean(axis=(1, 3))
                bits = (small > small.mean()).flatten()
                phash = 0
                for i, b in enumerate(bits):
                    if b:
                        phash |= (1 << i)
                if phash >= 1 << 63:
                    phash -= 1 << 64
                rows.append((r.media_id, h, w, means[0], means[1],
                             means[2], gray.mean(), phash))
            yield pd.DataFrame(rows, columns=[
                "media_id", "height", "width", "mean_r", "mean_g",
                "mean_b", "brightness", "phash"])

    return df.mapInPandas(_batch, IMAGE_FEATURES_SCHEMA)


def image_resize(df: DataFrame, *, out_h: int, out_w: int,
                 decode: Callable[[bytes, int, int], np.ndarray]
                 = fake_decode_image) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit raw RGB bytes +
    updated metadata (the downstream training-pipeline shape)."""
    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                h, w = int(r.meta["height"]), int(r.meta["width"])
                px = decode(bytes(r.content), h, w)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                res = px[yi][:, xi]
                rows.append((r.media_id, bytearray(res.tobytes()),
                             out_h, out_w))
            yield pd.DataFrame(rows, columns=[
                "media_id", "content", "height", "width"])

    return df.mapInPandas(
        _batch, "media_id long, content binary, height int, width int")


def frame_sample(df: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video frame sampling on the METADATA level: one output row per
    sampled frame index (the decode of the actual frame bytes is the
    stubbed step).  Input: (media_id, meta struct<n_frames,fps>)."""
    n = F.col("meta.n_frames").cast("int")
    idx = F.sequence(F.lit(0), n - 1, F.lit(every_n))
    return (df.select("media_id",
                      F.col("meta.fps").alias("fps"),
                      F.explode(idx).alias("frame_idx"))
            .withColumn("timestamp_sec",
                        F.col("frame_idx") / F.col("fps")))


def audio_features(df: DataFrame, *, sample_rate: int = 16000) -> DataFrame:
    """Audio: interpret bytes as int16 PCM (the decode stub for
    real codecs), emit duration/energy/zero-crossing stats."""
    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = bytes(r.content)
                pcm = np.frombuffer(
                    raw[:len(raw) // 2 * 2], dtype="<i2").astype(np.float64)
                if len(pcm) == 0:
                    pcm = np.zeros(1)
                energy = float(np.sqrt(np.mean(pcm ** 2)))
                zc = int(np.sum(np.abs(np.diff(np.signbit(pcm)))))
                rows.append((r.media_id, len(pcm) / sample_rate,
                             energy, zc))
            yield pd.DataFrame(rows, columns=[
                "media_id", "duration_sec", "rms_energy",
                "zero_crossings"])

    return df.mapInPandas(
        _batch, "media_id long, duration_sec double, rms_energy double, "
                "zero_crossings long")


AUDIO_FP_BANDS = 64


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """Chromaprint-style acoustic fingerprint: the PCM stream splits
    into 64 equal segments, and bit i of the 64-bit fingerprint is
    whether segment i's energy exceeds its cyclic successor's —
    relative-energy signs, the standard loudness-invariant audio
    near-dup signature (Chromaprint/AcoustID scheme, public).
    Byte-identical audio produces identical fingerprints; unrelated
    streams land ~32 bits apart.  Arrow-batched; emits 8 bytes per
    media row, so downstream dedup never touches the waveform."""
    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = bytes(r.content)
                pcm = np.frombuffer(
                    raw[:len(raw) // 2 * 2], dtype="<i2").astype(np.int64)
                if len(pcm) < AUDIO_FP_BANDS:
                    pcm = np.zeros(AUDIO_FP_BANDS, dtype=np.int64)
                seg = len(pcm) // AUDIO_FP_BANDS
                e = [int(np.sum(pcm[i * seg:(i + 1) * seg] ** 2))
                     for i in range(AUDIO_FP_BANDS)]
                fp = 0
                for i in range(AUDIO_FP_BANDS):
                    if e[i] > e[(i + 1) % AUDIO_FP_BANDS]:
                        fp |= 1 << i
                if fp >= 1 << 63:
                    fp -= 1 << 64
                rows.append((r.media_id, fp))
            yield pd.DataFrame(rows, columns=["media_id", "afp"])

    return df.mapInPandas(_batch, "media_id long, afp long")


def phash_neardup_pairs(feats: DataFrame, max_hamming: int = 3,
                        n_bands: int = 4,
                        id_col: str = "media_id",
                        hash_col: str = "phash") -> DataFrame:
    """Image near-dup pairs by perceptual-hash hamming distance —
    the image-dedup stage of a multimodal training pipeline, over
    the (media_id, phash) output of :func:`image_features`.

    Banding (pigeonhole-complete): the 64-bit phash splits into
    ``n_bands`` equal slices; two hashes with hamming <=
    ``n_bands - 1`` MUST agree on at least one slice, so candidates
    from the slice equi-join have full recall for
    ``max_hamming <= n_bands - 1`` (asserted).  Verification is the
    exact ``bit_count(a XOR b)``.

    Scale (100 TB): identical discipline to MinHash-LSH banding
    (L6) — the band (idx, value) is the join key, hash-partitioned;
    no all-pairs scan exists in the plan (gated with the other
    blocked similarity ops).  The phash itself is 8 bytes/image, so
    the dedup join never touches pixel data."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banding with {n_bands} bands only guarantees recall for "
            f"hamming <= {n_bands - 1}, got max_hamming={max_hamming}")
    width = 64 // n_bands
    mask = (1 << width) - 1
    slices = F.array(*[
        F.shiftrightunsigned(F.col(hash_col), i * width)
         .bitwiseAND(F.lit(mask)).cast("long")
        for i in range(n_bands)])
    e = (feats.select(F.col(id_col), F.col(hash_col))
         .select(id_col, hash_col,
                 F.posexplode(slices).alias("band_idx", "band_val")))
    a = e.select(F.col(id_col).alias("id_a"),
                 F.col(hash_col).alias("ph_a"), "band_idx", "band_val")
    b = e.select(F.col(id_col).alias("id_b"),
                 F.col(hash_col).alias("ph_b"), "band_idx", "band_val")
    ham = F.bit_count(F.expr("ph_a ^ ph_b"))
    return (a.join(b, ["band_idx", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def media_table_from_fixture(spark, sf_dir: str,
                             kind: str = "image") -> DataFrame:
    """Build a multimodal table from the fixture parquet files as
    opaque blobs (L9 ingest) + synthesized typed metadata — the
    documented pattern for 'bytes + metadata travel together'."""
    from ..session import ship_package
    ship_package(spark)
    bf = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.parquet")
          .load(sf_dir.rstrip("/")))
    # media_id = first 15 hex digits of md5(file_name): row-local
    # (no global window at 100 TB file counts), layout-independent,
    # and reproducible in ANSI SQL — the oracle twin computes the
    # same id from read_blob filenames.
    fname = F.regexp_extract("path", r"([^/]+)$", 1)
    base = bf.select(
        F.conv(F.substring(F.md5(fname), 1, 15), 16, 10).cast("long")
        .alias("media_id"),
        "content", F.col("length").alias("n_bytes"))
    if kind == "image":
        meta = F.struct(
            (F.pmod(F.col("media_id"), F.lit(32)) + 16).cast("int")
            .alias("height"),
            (F.pmod(F.col("media_id"), F.lit(24)) + 16).cast("int")
            .alias("width"))
    else:  # video metadata
        meta = F.struct(
            (F.pmod(F.col("media_id"), F.lit(200)) + 50).cast("int")
            .alias("n_frames"),
            F.lit(25.0).alias("fps"))
    return base.withColumn("meta", meta)
