"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The decode kernels are STUBS by design: PIL/ffmpeg/torchaudio are not in
this container, so ``decode_image``/``sample_frames`` run a clearly
marked deterministic fake (or raise NotImplementedError when
``strict=True``).  Everything Spark-side — schemas, batch iteration,
partitioning, output shapes — is real and tested; swapping the fake for
a real decoder changes ONE function body and no plan shape.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), False),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),  # 8-dim
    T.StructField("decoder", T.StringType(), False),
])

FRAME_SAMPLES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_no", T.IntegerType(), False),
    T.StructField("frame_sig", T.StringType(), False),
])

AUDIO_FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("rms", T.DoubleType(), False),
    T.StructField("zcr", T.DoubleType(), False),
    T.StructField("peak", T.DoubleType(), False),
    T.StructField("decoder", T.StringType(), False),
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE DECODER (container has no image/audio libs).
    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    the fake derives an 8-dim feature from payload bytes so tests pin
    exact values end-to-end."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (arr.reshape(8, 8).mean(axis=1) / 255.0).astype(np.float32)


def extract_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL/libvips — not in this container")
        for pdf in batches:
            feats = [_fake_decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feature": feats,
                "decoder": "fake-deterministic",
            })

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(_extract, schema=IMAGE_FEATURES))


def _fake_decode_audio(payload: bytes) -> tuple[float, float, float]:
    """DETERMINISTIC FAKE AUDIO DECODER (container has no torchaudio/
    ffmpeg).  A real implementation would decode PCM and compute these
    over the waveform; the fake treats the first 64 payload bytes
    (zero-padded) as unsigned samples so the DuckDB oracle can mirror
    the math bit-exactly in SQL:
      rms  = sqrt(mean(b²)) / 255       (loudness)
      zcr  = sign changes around 96 / 63    (zero-crossing rate;
             96, not 128, so ASCII text payloads — letters above,
             space/punct below — produce a non-degenerate rate)
      peak = max(b) / 255
    All math in float64 in the SAME association order as the SQL."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"),
                        dtype=np.uint8).astype(np.float64)
    rms = float(np.sqrt(float((arr * arr).sum()) / 64.0) / 255.0)
    sign = arr < 96.0
    zcr = float(np.count_nonzero(sign[1:] != sign[:-1])) / 63.0
    peak = float(arr.max()) / 255.0
    return rms, zcr, peak


def extract_audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Audio feature plumbing (round-3 verdict item 5: image and video
    had operators, audio did not) — same Arrow-batched ``mapInPandas``
    shape as ``extract_image_features``, per-clip scalar features."""
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real audio decode requires torchaudio/ffmpeg — not in "
                "this container")
        for pdf in batches:
            feats = [_fake_decode_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "duration_ms": pdf["duration_ms"],
                "rms": [round(f[0], 6) for f in feats],
                "zcr": [round(f[1], 6) for f in feats],
                "peak": [round(f[2], 6) for f in feats],
                "decoder": "fake-deterministic",
            })

    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "payload", "duration_ms")
            .mapInPandas(_extract, schema=AUDIO_FEATURES))


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  strict: bool = False) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame,
    frame signature = md5 of (lowercase-hex payload, '|', frame_no) — a
    stand-in for the decoded frame tensor.  Hex-string (not raw-byte)
    hashing so the DuckDB oracle can mirror it exactly: this duckdb
    build's md5() only accepts VARCHAR, and a BLOB→VARCHAR cast escapes
    non-ASCII bytes engine-specifically."""
    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        if strict:
            raise NotImplementedError("real frame decode requires ffmpeg")
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "frame_sig": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                n = max(1, int(dur or 0) // every_ms)
                hexp = bytes(payload).hex()
                for f in range(n):
                    rows["media_id"].append(int(mid))
                    rows["frame_no"].append(f)
                    rows["frame_sig"].append(hashlib.md5(
                        f"{hexp}|{f}".encode()).hexdigest())
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload", "duration_ms")
            .mapInPandas(_sample, schema=FRAME_SAMPLES))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 37 + j * 11) % 256 for j in range(128 + i % 64))
        rows.append((i, kind, payload, f"application/x-{kind}",
                     64 if kind == "image" else None,
                     48 if kind == "image" else None,
                     {"video": 3000, "audio": 2000}.get(kind)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
