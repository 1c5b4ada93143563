"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with typed
metadata extracted by Arrow-batched ``mapInPandas`` — the pattern a
100 TB multimodal pipeline uses (decode happens inside the UDF batch,
partitioned by file/row-group, never on the driver).

Real codecs aren't available in this container, so ``decode_image`` is
an explicitly marked stub; the Spark-side plumbing (binary schema,
mapInPandas batch shape, metadata extraction) is real and tested.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("header_hex", StringType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of the
    text; in production: the image/audio blob) plus a mime tag."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def _meta_pdf(batches):
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in payloads],
                "header_hex": [bytes(b[:4]).hex() for b in payloads],
            }
        )


def extract_meta(with_payload: DataFrame) -> DataFrame:
    """Typed metadata from the binary column via mapInPandas (Arrow
    batches; schema declared up front so Catalyst can prune)."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        _meta_pdf, META_SCHEMA
    )


def decode_image(payload: bytes) -> "object":
    """STUB: image decode requires codec libs not present in this
    container. The Spark-side contract (binary in, array out via
    mapInPandas) is exercised with fake_decode below."""
    raise NotImplementedError(
        "image decode requires PIL/ffmpeg, not available in this environment; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a decoder: derives (width, height,
    format) from the payload hash so plumbing tests are stable."""
    h = hashlib.sha256(payload).digest()
    return (h[0] % 64 + 1, h[1] % 64 + 1, "fake")


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("fmt", StringType()),
    ]
)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_header_hex", StringType()),
    ]
)


def frame_sample(with_payload: DataFrame, chunk: int = 64, every: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split the binary
    into fixed-size chunks ("frames"), keep every Nth — a ONE-TO-MANY
    mapInPandas (each input row yields multiple frame rows), which is
    the batch shape a real video sampler produces. The decode itself is
    byte slicing (codecs stubbed per environment)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                frames = [b[i : i + chunk] for i in range(0, len(b), chunk)]
                for idx in range(0, len(frames), every):
                    fb = frames[idx]
                    out.append((doc_id, idx, len(fb), fb[:4].hex()))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "frame_bytes", "frame_header_hex"],
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        gen, FRAME_SAMPLE_SCHEMA
    )


def decode_features(with_payload: DataFrame) -> DataFrame:
    """Feature-extraction plumbing over binary payloads (fake decoder)."""

    def gen(batches):
        for pdf in batches:
            rows = [fake_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "fmt": [r[2] for r in rows],
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(gen, FRAME_SCHEMA)


AUDIO_WIN = 64  # samples per analysis window
AUDIO_HOP = 32  # hop (50% overlap — the standard audio framing)

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("sum_sq", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_window_energy(
    with_payload: DataFrame, win: int = AUDIO_WIN, hop: int = AUDIO_HOP
) -> DataFrame:
    """Audio feature-extraction plumbing: the binary payload is decoded
    as unsigned 8-bit PCM (the environment's stand-in for a real
    pcm/flac decoder — same documented-stub convention as
    ``decode_image``) and framed into overlapping analysis windows;
    per window the operator emits the classic cheap features a speech/
    music curation pass filters on — absolute energy, sum of squares
    (RMS numerator) and zero-crossing count — as EXACT integers, so
    unlike a float RMS the whole frame table is value-hash-oracled.

    Shape: a one-to-many Arrow-batched ``mapInPandas`` (one payload →
    ~n/hop window rows) with numpy-vectorized window math inside the
    batch — the real audio batch shape; the binary never leaves its
    partition and nothing shuffles. Window w covers samples
    [w·hop, w·hop+win) truncated at the payload end."""
    import numpy as np

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = (
                    np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                        np.int64
                    )
                    - 128
                )
                n = len(s)
                for start in range(0, n, hop):
                    w = s[start : start + win]
                    sign = w >= 0
                    rows.append(
                        (
                            doc_id,
                            start // hop,
                            len(w),
                            int(np.abs(w).sum()),
                            int((w * w).sum()),
                            int((sign[1:] != sign[:-1]).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "win_idx",
                    "n_samples",
                    "energy",
                    "sum_sq",
                    "zero_crossings",
                ],
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        gen, AUDIO_SCHEMA
    )
