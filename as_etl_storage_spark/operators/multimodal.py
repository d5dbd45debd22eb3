"""Multimodal-column operators: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas pipelines.

Codec reality, stated precisely: formats that need external libraries
(JPEG/PNG via PIL, video via libav) ship deterministic STUBS
(``_fake_decode``/``_fake_resize``) so the Spark-side plumbing — binary
column handling, mapInPandas schema contract, Arrow batch shape, partition
parallelism — is real and testable end-to-end; swap the stub for the
library call in production, nothing else changes. Formats decodable with
numpy alone are REAL: PPM (P6) images (``_ppm_encode``/``_ppm_decode`` +
stride resize), canonical PCM WAV audio (``_wav_encode``/``_wav_decode``),
and a raw multi-frame video container (``_vid_encode``/``_vid_decode`` +
stride frame sampling) — all oracle-gated on genuinely parsed bytes.

Scale notes: mapInPandas streams Arrow batches (no per-row Python overhead);
binary payloads stay in the executors — never collected. For very large
blobs store (path, offset, nbytes) pointers instead and fetch inside the
batch iterator, keeping parquet row groups small.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the decoded-metadata output — the contract a real decoder must
#: also satisfy.
DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: encode the text column as a binary payload column
    (stands in for real image/audio bytes) with typed metadata."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).alias("declared_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives (width, height,
    n_frames) from the byte length. Raises on None like a real decoder
    would on corrupt input."""
    if payload is None:
        raise NotImplementedError("real decode of null payload")
    n = len(payload)
    return (n % 64) + 1, (n % 48) + 1, (n % 8) + 1


def decode_image_meta(with_binary: DataFrame) -> DataFrame:
    """mapInPandas decode pipeline: binary payload -> typed metadata rows.
    Arrow-batched; one Python worker per partition, no shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, frames, nbytes = [], [], [], []
            for payload in pdf["payload"]:
                w, h, f = _fake_decode(payload)
                widths.append(w)
                heights.append(h)
                frames.append(f)
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(nbytes, dtype="int32"),
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "n_frames": pd.array(frames, dtype="int32"),
                }
            )

    return with_binary.mapInPandas(decode, DECODED_META_SCHEMA)


def decode_image_meta_arrow(with_binary: DataFrame) -> DataFrame:
    """mapInArrow decode variant: identical contract to decode_image_meta
    but the batch iterator sees raw ``pyarrow.RecordBatch`` objects — no
    pandas conversion on either side. Use this form when the decoder
    consumes/produces Arrow buffers natively (zero-copy into e.g. a
    tensor library); the pandas form reads better for tabular wrangling."""
    import pyarrow as pa

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            doc_ids = batch.column("doc_id")
            widths, heights, frames, nbytes = [], [], [], []
            for payload in batch.column("payload").to_pylist():
                w, h, f = _fake_decode(payload)
                widths.append(w)
                heights.append(h)
                frames.append(f)
                nbytes.append(len(payload))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(nbytes, type=pa.int32()),
                    pa.array(widths, type=pa.int32()),
                    pa.array(heights, type=pa.int32()),
                    pa.array(frames, type=pa.int32()),
                ],
                names=["doc_id", "n_bytes", "width", "height", "n_frames"],
            )

    return with_binary.mapInArrow(decode, DECODED_META_SCHEMA)


#: schema of the resize-stage output — the contract a real resizer satisfies.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("thumbnail", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, max_side: int) -> tuple[int, int, int, int, bytes]:
    """Deterministic stand-in for an image resize (PIL ``Image.thumbnail``
    in production): aspect-preserving integer downscale to ``max_side``,
    emitting a fake thumbnail payload of out_w*out_h bytes. All arithmetic
    is integer so the plan is reproducible in any engine."""
    if payload is None:
        raise NotImplementedError("real resize of null payload")
    w, h, _ = _fake_decode(payload)
    g = max(w, h)
    out_w = max(1, (w * max_side) // g)
    out_h = max(1, (h * max_side) // g)
    return w, h, out_w, out_h, bytes(out_w * out_h)


def resize_images(with_binary: DataFrame, max_side: int = 16) -> DataFrame:
    """mapInPandas resize pipeline: binary payload -> aspect-preserving
    thumbnail + dims. Arrow-batched, partition-parallel, no shuffle — the
    thumbnail bytes stay executor-side. Swap ``_fake_resize`` for a real
    decoder+resampler; the schema contract (RESIZED_SCHEMA) is unchanged."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "width": [], "height": [], "out_w": [], "out_h": [], "thumbnail": []
            }
            for payload in pdf["payload"]:
                w, h, ow, oh, thumb = _fake_resize(payload, max_side)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(ow)
                rows["out_h"].append(oh)
                rows["thumbnail"].append(thumb)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "out_w": pd.array(rows["out_w"], dtype="int32"),
                    "out_h": pd.array(rows["out_h"], dtype="int32"),
                    "thumbnail": rows["thumbnail"],
                }
            )

    return with_binary.mapInPandas(resize, RESIZED_SCHEMA)


#: schema of the feature-extract output — per-payload feature scalars.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("f_bytes", T.IntegerType()),
        T.StructField("f_spaces", T.IntegerType()),
        T.StructField("f_vowels", T.IntegerType()),
        T.StructField("f_digits", T.IntegerType()),
    ]
)


def extract_features(with_binary: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: payload bytes -> feature
    scalars (here simple content counts; a real extractor — CLIP embedding,
    MFCC, perceptual hash — replaces the body and widens the schema).
    Arrow-batched, partition-parallel, no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vowels = set(b"aeiou")
        digits = set(b"0123456789")
        for pdf in batches:
            rows = {"f_bytes": [], "f_spaces": [], "f_vowels": [], "f_digits": []}
            for payload in pdf["payload"]:
                if payload is None:
                    raise NotImplementedError("real extract of null payload")
                rows["f_bytes"].append(len(payload))
                rows["f_spaces"].append(payload.count(b" "))
                rows["f_vowels"].append(sum(1 for b in payload if b in vowels))
                rows["f_digits"].append(sum(1 for b in payload if b in digits))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{k: pd.array(v, dtype="int32") for k, v in rows.items()},
                }
            )

    return with_binary.mapInPandas(extract, FEATURES_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame index (posexplode of
    the frame range) — the shape a video pipeline needs downstream."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------- real codec: PPM ------
# The decode steps above are documented stand-ins (no image libraries in
# the environment). PPM (P6) needs none: the format is an ASCII header +
# raw RGB bytes, decodable with numpy alone — so for this format the
# pipeline is REAL end to end: real bytes in the binary column, a real
# parser, statistics computed from the decoded pixel buffer (and the
# synthesis rule is arithmetic, so a SQL oracle can reproduce the
# expected statistics independently).

PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def _ppm_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 16 + 4, doc_id % 12 + 4


def _ppm_encode(doc_id: int) -> bytes:
    """Deterministic REAL P6 image: pixel byte i of doc d is
    (d*7 + i) % 256 over a (d%16+4) x (d%12+4) RGB raster."""
    import numpy as np

    w, h = _ppm_dims(doc_id)
    pixels = (np.arange(w * h * 3, dtype=np.int64) * 1 + doc_id * 7) % 256
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def _ppm_decode(payload: bytes):
    """Parse a P6 payload: header (magic, dims, maxval) + raw RGB buffer.
    Raises ValueError on malformed input like any real decoder."""
    import numpy as np

    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = np.frombuffer(parts[3], dtype=np.uint8)
    if raster.size != w * h * 3:
        raise ValueError("raster size mismatch")
    return w, h, raster.reshape(h, w, 3)


def synth_ppm(df: DataFrame, id_col: str) -> DataFrame:
    """Attach a REAL P6 payload per row (mapInPandas; bytes built with
    numpy on executors — the payload never touches the driver)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_ppm_encode(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(synth, schema)


def decode_ppm_stats(with_ppm: DataFrame) -> DataFrame:
    """Really decode the P6 payloads and compute per-channel integer sums
    from the pixel buffer — Arrow-batched, no shuffle, exact integers so
    the result is hash-stable."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"width": [], "height": [], "sum_r": [], "sum_g": [], "sum_b": []}
            for payload in pdf["payload"]:
                w, h, px = _ppm_decode(payload)
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "sum_r": pd.array(rows["sum_r"], dtype="int64"),
                    "sum_g": pd.array(rows["sum_g"], dtype="int64"),
                    "sum_b": pd.array(rows["sum_b"], dtype="int64"),
                }
            )

    return with_ppm.mapInPandas(decode, PPM_STATS_SCHEMA)


# ---------------------------------------------------- real codec: WAV ------
WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_pcm", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def _wav_n_samples(doc_id: int) -> int:
    return doc_id % 500 + 100


def _wav_encode(doc_id: int, sample_rate: int = 16_000) -> bytes:
    """Deterministic REAL mono 16-bit PCM WAV: sample i of doc d is
    ((d*13 + i*37) % 65536) - 32768, little-endian, canonical 44-byte
    RIFF/fmt/data header layout."""
    import struct

    import numpy as np

    n = _wav_n_samples(doc_id)
    samples = (
        (np.arange(n, dtype=np.int64) * 37 + doc_id * 13) % 65536 - 32768
    ).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def _wav_decode(payload: bytes):
    """Parse a canonical PCM WAV: validate RIFF/WAVE magic, read the fmt
    chunk (PCM, mono, 16-bit enforced), slice the data chunk into an int16
    sample array. Raises ValueError on malformed input."""
    import struct

    import numpy as np

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    fmt_size, audio_fmt, channels, rate, _byte_rate, _align, bits = (
        struct.unpack("<IHHIIHH", payload[16:36])
    )
    if (fmt_size, audio_fmt, channels, bits) != (16, 1, 1, 16):
        raise ValueError("unsupported WAV layout (need canonical PCM mono 16)")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (data_len,) = struct.unpack("<I", payload[40:44])
    raw = payload[44 : 44 + data_len]
    if len(raw) != data_len:
        raise ValueError("truncated data chunk")
    return rate, np.frombuffer(raw, dtype="<i2")


def synth_wav(df: DataFrame, id_col: str) -> DataFrame:
    """Attach a REAL PCM WAV payload per row (executor-side numpy)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_wav_encode(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(synth, schema)


def decode_wav_stats(with_wav: DataFrame) -> DataFrame:
    """Really decode the WAV payloads: header fields + exact integer PCM
    statistics from the sample buffer (hash-stable)."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"sample_rate": [], "n_samples": [], "sum_pcm": [], "peak": []}
            for payload in pdf["payload"]:
                rate, pcm = _wav_decode(payload)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(int(pcm.size))
                rows["sum_pcm"].append(int(pcm.sum(dtype=np.int64)))
                rows["peak"].append(int(np.abs(pcm.astype(np.int64)).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.array(rows["sample_rate"], dtype="int32"),
                    "n_samples": pd.array(rows["n_samples"], dtype="int32"),
                    "sum_pcm": pd.array(rows["sum_pcm"], dtype="int64"),
                    "peak": pd.array(rows["peak"], dtype="int32"),
                }
            )

    return with_wav.mapInPandas(decode, WAV_STATS_SCHEMA)


def resize_ppm_stats(with_ppm: DataFrame, stride: int = 2) -> DataFrame:
    """REAL resize on the decoded raster: nearest-neighbor downsample by
    ``stride`` (every stride-th row/column of the actual pixel buffer),
    returning the downsampled dimensions and exact channel sums. The
    Python stays Arrow-batched and shuffle-free; at corpus scale this is
    the decode->transform template with a genuine transform."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"width": [], "height": [], "sum_r": [], "sum_g": [], "sum_b": []}
            for payload in pdf["payload"]:
                _w, _h, px = _ppm_decode(payload)
                small = px[::stride, ::stride, :]
                sums = small.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows["width"].append(small.shape[1])
                rows["height"].append(small.shape[0])
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "sum_r": pd.array(rows["sum_r"], dtype="int64"),
                    "sum_g": pd.array(rows["sum_g"], dtype="int64"),
                    "sum_b": pd.array(rows["sum_b"], dtype="int64"),
                }
            )

    return with_ppm.mapInPandas(resize, PPM_STATS_SCHEMA)


# ------------------------------------------- real codec: video container ---
VID_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_px", T.LongType()),
    ]
)


def _vid_shape(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, width, height) of doc's synthetic clip."""
    return doc_id % 6 + 2, doc_id % 8 + 4, doc_id % 5 + 3


def _vid_encode(doc_id: int) -> bytes:
    """Deterministic REAL multi-frame container: ASCII header
    ``VID\\n{n} {w} {h}\\n`` followed by n raw RGB frames; pixel byte i of
    the whole clip is (doc_id*7 + i) % 256 — so frame f starts at byte
    offset f*w*h*3 into the raster."""
    import numpy as np

    n, w, h = _vid_shape(doc_id)
    raster = (np.arange(n * w * h * 3, dtype=np.int64) + doc_id * 7) % 256
    return f"VID\n{n} {w} {h}\n".encode() + raster.astype(np.uint8).tobytes()


def _vid_decode(payload: bytes):
    """Parse the container: header + (n, w, h)-shaped frame array."""
    import numpy as np

    if payload is None or not payload.startswith(b"VID\n"):
        raise ValueError("not a VID container")
    parts = payload.split(b"\n", 2)
    if len(parts) < 3:
        raise ValueError("truncated VID header")
    n, w, h = (int(x) for x in parts[1].split())
    raster = np.frombuffer(parts[2], dtype=np.uint8)
    if raster.size != n * w * h * 3:
        raise ValueError("raster size mismatch")
    return n, w, h, raster.reshape(n, h, w, 3)


def synth_vid(df: DataFrame, id_col: str) -> DataFrame:
    """Attach a REAL multi-frame payload per row (executor-side numpy)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_vid_encode(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(synth, schema)


def sample_vid_frames(with_vid: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: decode the container, keep every
    ``every_n``-th frame of the actual raster, one output row per sampled
    frame with its exact pixel sum. The frame loop touches only the
    sampled frames' buffers — the shape a video pipeline needs (decode
    once, process a stride of frames)."""
    import numpy as np

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "width": [], "height": [],
                   "sum_px": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n, w, h, frames = _vid_decode(payload)
                for f in range(0, n, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_px"].append(
                        int(frames[f].sum(dtype=np.int64))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                    "width": pd.array(out["width"], dtype="int32"),
                    "height": pd.array(out["height"], dtype="int32"),
                    "sum_px": pd.array(out["sum_px"], dtype="int64"),
                }
            )

    return with_vid.mapInPandas(sample, VID_FRAME_SCHEMA)


WAV_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_in_window", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def wav_window_features(with_wav: DataFrame, window: int = 128) -> DataFrame:
    """REAL audio feature extraction: fixed-size windows over the decoded
    PCM buffer, exact integer energy (sum of squares) and peak per
    window — the framing step every audio pipeline (VAD, loudness
    normalization, spectrogram prep) starts with. One row per window,
    all arithmetic on the genuinely parsed samples."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "window_idx": [], "n_in_window": [],
                   "sum_sq": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, pcm = _wav_decode(payload)
                x = pcm.astype(np.int64)
                for wi in range(0, x.size, window):
                    seg = x[wi : wi + window]
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(wi // window)
                    out["n_in_window"].append(int(seg.size))
                    out["sum_sq"].append(int((seg * seg).sum()))
                    out["peak"].append(int(np.abs(seg).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "window_idx": pd.array(out["window_idx"], dtype="int32"),
                    "n_in_window": pd.array(out["n_in_window"], dtype="int32"),
                    "sum_sq": pd.array(out["sum_sq"], dtype="int64"),
                    "peak": pd.array(out["peak"], dtype="int32"),
                }
            )

    return with_wav.mapInPandas(feats, WAV_WINDOW_SCHEMA)
