"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` columns next to typed metadata
structs; decode/resize/frame-sample run as Arrow-batched
``mapInPandas`` stages. Two kernel tiers:

- ``decode_image`` / ``feature_extract`` / ``audio_windows`` — REAL
  decoders (codecs.py): PIL/soundfile adapters when importable, a
  pure-Python tier always (PPM/PGM + uncompressed BMP pixel decode,
  PNG/JPEG/GIF header decode, PCM WAV via stdlib ``wave``), stub
  fallback for unrecognized payloads — every output row carries a
  ``decoder`` column naming the path, so real and fake rows are never
  silently mixed.
- the ``*_stub`` twins — deterministic fakes, kept for plumbing tests
  and formats with no in-container codec (jpeg pixels, video).

Scale notes: binary payloads dominate row size — keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small for wide media
rows, partition by content-date or modality, and never collect
payloads to the driver. Metadata-only queries must prune the binary
column (columnar parquet makes that free).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_binary_payload",
    "extract_binary_meta",
    "decode_image_stub",
    "resize_image_stub",
    "feature_extract_stub",
    "frame_sample_stub",
    "frame_embed_stub",
    "frame_embed_real",
    "audio_window_stub",
    "decode_image",
    "feature_extract",
    "audio_windows",
    "DECODED_IMAGE_SCHEMA",
    "DECODED_IMAGE_REAL_SCHEMA",
]

#: Output schema of the (stubbed) image decoder.
DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media column: UTF-8 bytes of ``text_col`` as payload
    plus a metadata struct (modality/codec/size)."""
    payload = F.encode(F.col(text_col), "UTF-8").cast(BinaryType())
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake/raw").alias("codec"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ),
    )


def extract_binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata over binary payloads (no decode):
    byte length + md5 content address."""
    p = F.col(payload_col)
    return df.withColumn("n_bytes", F.length(p).cast("bigint")).withColumn(
        "content_md5", F.md5(p)
    )


def decode_image_stub(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """'Decode' images via mapInPandas — STUB kernel.

    Real deployments replace ``_fake_decode`` with PIL/turbojpeg; the
    Arrow batch plumbing, schema, and partition behavior are identical.
    The fake derives deterministic dimensions from payload length.
    """

    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    # deterministic fake: not a real decode (no codec libs
                    # in this environment)
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "format": "fake/raw",
                    "n_bytes": n.astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _fake_decode, schema=DECODED_IMAGE_SCHEMA
    )


def resize_image_stub(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    target_width: int = 224,
    target_height: int = 224,
) -> DataFrame:
    """'Resize' stub: payload → payload row transform through
    mapInPandas (the shape of a real PIL/opencv resize: binary in,
    binary out, updated dimension metadata). The fake kernel truncates/
    pads the payload deterministically to w*h bytes."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    size = target_width * target_height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[id_col].to_frame(name="doc_id")
            out["payload"] = pdf["payload"].map(
                lambda b: bytes(b)[:size].ljust(size, b"\0")
            )
            out["width"] = pd.Series([target_width] * len(pdf), dtype="int32")
            out["height"] = pd.Series([target_height] * len(pdf), dtype="int32")
            yield out

    return df.select(id_col, "payload").mapInPandas(_resize, schema=schema)


def feature_extract_stub(
    df: DataFrame, *, id_col: str = "doc_id", dim: int = 16
) -> DataFrame:
    """'Feature extraction' stub: payload → fixed-dim float embedding
    via Arrow-batched mapInPandas — the encoder-model shape. The fake
    kernel hashes byte chunks into a deterministic unit-normalized
    vector, so the output plugs straight into the similarity operators
    (cosine_topk / ann_lsh_topk) for end-to-end pipeline tests."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                pad = (-len(arr)) % dim
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
                v = arr.reshape(-1, dim).sum(axis=0).astype(np.float64) + 1.0
                n = np.linalg.norm(v)
                vecs.append((v / n).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "embedding": vecs})

    return df.select(id_col, "payload").mapInPandas(_embed, schema=schema)


def frame_sample_stub(
    df: DataFrame, *, id_col: str = "doc_id", every_n_bytes: int = 64
) -> DataFrame:
    """'Frame sampling' stub: emits one row per sampled offset of the
    payload (video frame extraction shape: one input row → many output
    rows via mapInPandas)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("offset", LongType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "offset": []}
            for _, r in pdf.iterrows():
                ln = len(r["payload"])
                for i, off in enumerate(range(0, ln, every_n_bytes)):
                    rows["doc_id"].append(r[id_col])
                    rows["frame_idx"].append(i)
                    rows["offset"].append(off)
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(_sample, schema=schema)


def frame_embed_stub(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    dim: int = 16,
) -> DataFrame:
    """Video path end-to-end: payload → per-frame slices → per-frame
    embeddings, in ONE mapInPandas pass (the ffmpeg-decode +
    frame-encoder shape: one input row fans out to many embedded frame
    rows without ever materializing raw frames in a shuffle). STUB
    kernel — frames are fixed-size byte slices, the embedding is the
    same deterministic hash-fold as :func:`feature_extract_stub`, so
    frame vectors plug straight into the similarity/ANN operators for
    cross-modal "find similar frames" pipelines.

    Scale note: output rows ≈ payload_bytes / frame_bytes per video —
    the fan-out happens AFTER the binary column is pruned down to one
    task's batch, and only (id, frame_idx, dim floats) rows shuffle.
    """
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def _embed_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vecs = [], [], []
            for _, r in pdf.iterrows():
                raw = bytes(r["payload"])
                for i in range(0, max(len(raw), 1), frame_bytes):
                    chunk = np.frombuffer(
                        raw[i : i + frame_bytes], dtype=np.uint8
                    )
                    pad = (-len(chunk)) % dim
                    if pad or len(chunk) == 0:
                        chunk = np.concatenate(
                            [chunk, np.zeros(pad or dim, dtype=np.uint8)]
                        )
                    v = chunk.reshape(-1, dim).sum(axis=0).astype(np.float64) + 1.0
                    vecs.append((v / np.linalg.norm(v)).tolist())
                    ids.append(r[id_col])
                    idxs.append(i // frame_bytes)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "embedding": vecs}
            )

    return df.select(id_col, "payload").mapInPandas(
        _embed_frames, schema=schema
    )


def frame_embed_real(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    dim: int = 16,
) -> DataFrame:
    """REAL video-shaped path: payload = a concatenated binary-netpbm
    stream (back-to-back P5/P6 frames, the PPM analog of MJPEG) →
    per-frame REAL pixel decode (codecs._decode_pnm) → luminance
    grid-pool descriptors (codecs.grid_pool_features) — the same
    fan-out/schema contract as :func:`frame_embed_stub` but with no
    stub anywhere: frame boundaries come from each frame's own header
    (codecs.split_pnm_stream), features from actual luminance. The
    descriptors are resolution-invariant for uniformly upscaled frames
    (pinned in tests/test_media_codecs.py), so "find this shot at any
    encode size" works — the property hash-fold vectors can't have.

    Payloads that aren't a PNM stream yield zero rows (never a stub
    fallback — the honesty contract of the real tier). Scale shape as
    the stub: fan-out happens AFTER the binary column stops shuffling;
    only (id, frame_idx, dims, ``dim`` floats) rows move on.
    """
    from data_lakehouse_spark.multimodal import codecs

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("decoder", StringType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [],
                "frame_idx": [],
                "width": [],
                "height": [],
                "decoder": [],
                "embedding": [],
            }
            for _, r in pdf.iterrows():
                raw = bytes(r["payload"])
                for i, frame in enumerate(codecs.split_pnm_stream(raw)):
                    # the pure-Python netpbm decoder DIRECTLY (not the
                    # best-available facade): the stream splitter
                    # guarantees P5/P6 frames, and the PIL adapter —
                    # preferred by decode_image_bytes when Pillow is
                    # installed — labels rows 'pil', which would break
                    # the decoder=='pnm' gates on PIL-equipped hosts
                    dec = codecs._decode_pnm(frame)
                    if dec is None or "pixels" not in dec:
                        continue
                    rows["doc_id"].append(r[id_col])
                    rows["frame_idx"].append(i)
                    rows["width"].append(dec["width"])
                    rows["height"].append(dec["height"])
                    rows["decoder"].append(dec["decoder"])
                    rows["embedding"].append(
                        codecs.grid_pool_features(
                            dec["pixels"],
                            dec["width"],
                            dec["height"],
                            dec["channels"],
                            dim=dim,
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "frame_idx": pd.array(rows["frame_idx"], dtype="int32"),
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "decoder": rows["decoder"],
                    # object dtype: an EMPTY batch otherwise infers
                    # float64 and Arrow refuses ndarray→list<double>
                    "embedding": pd.Series(rows["embedding"], dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_embed, schema=schema)


def audio_window_stub(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    window_bytes: int = 128,
    hop_bytes: int = 64,
) -> DataFrame:
    """Audio analysis shape: payload → OVERLAPPING windows (hop <
    window, the STFT framing contract) with per-window energy features.
    STUB kernel — 'samples' are raw bytes, 'energy' is their RMS; a
    real deployment swaps in librosa/soundfile framing + real features
    with the same schema and fan-out behavior."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("window_idx", IntegerType()),
            StructField("start_byte", LongType()),
            StructField("rms", DoubleType()),
            StructField("peak", DoubleType()),
        ]
    )

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "window_idx": [], "start_byte": [],
                    "rms": [], "peak": []}
            for _, r in pdf.iterrows():
                raw = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
                for i, start in enumerate(range(0, max(len(raw), 1), hop_bytes)):
                    w = raw[start : start + window_bytes].astype(np.float64)
                    if len(w) == 0:
                        continue
                    rows["doc_id"].append(r[id_col])
                    rows["window_idx"].append(i)
                    rows["start_byte"].append(start)
                    rows["rms"].append(float(np.sqrt((w**2).mean())))
                    rows["peak"].append(float(w.max()))
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "window_idx": pd.array(rows["window_idx"], dtype="int32"),
                    "start_byte": rows["start_byte"],
                    "rms": rows["rms"],
                    "peak": rows["peak"],
                }
            )

    return df.select(id_col, "payload").mapInPandas(_windows, schema=schema)


# ---------------------------------------------------------------------------
# real-codec tier (codecs.py): best-available decode, stub fallback,
# every row labeled with the decoder that produced it
# ---------------------------------------------------------------------------

DECODED_IMAGE_REAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("decoder", StringType()),
    ]
)


def decode_image(
    df: DataFrame, *, id_col: str = "doc_id", allow_stub: bool = True
) -> DataFrame:
    """Decode images via mapInPandas, REAL codecs first: PIL when
    importable, else the pure-Python tier (full pixel decode for
    PPM/PGM/uncompressed BMP; header decode for PNG/JPEG/GIF — see
    codecs.py). Unrecognized payloads fall back to the deterministic
    stub geometry when ``allow_stub`` (labeled ``decoder='stub'``,
    never silently mixed) or are dropped when not. The ``decoder``
    column is the honesty contract: filter on it to keep only
    real-decoded rows."""
    from data_lakehouse_spark.multimodal import codecs

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "channels", "format",
                "n_bytes", "decoder",
            )}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                out = codecs.decode_image_bytes(raw)
                if out is None:
                    if not allow_stub:
                        continue
                    n = len(raw)
                    out = {
                        "width": n % 640 + 1,
                        "height": n % 480 + 1,
                        "channels": 3,
                        "format": "fake/raw",
                        "decoder": "stub",
                    }
                rows["doc_id"].append(did)
                rows["width"].append(out["width"])
                rows["height"].append(out["height"])
                rows["channels"].append(out["channels"])
                rows["format"].append(out["format"])
                rows["n_bytes"].append(len(raw))
                rows["decoder"].append(out["decoder"])
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "channels": pd.array(rows["channels"], dtype="int32"),
                    "format": rows["format"],
                    "n_bytes": pd.array(rows["n_bytes"], dtype="int64"),
                    "decoder": rows["decoder"],
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _decode, schema=DECODED_IMAGE_REAL_SCHEMA
    )


def feature_extract(
    df: DataFrame, *, id_col: str = "doc_id", dim: int = 16
) -> DataFrame:
    """Fixed-dim embedding per payload: REAL grid mean-pool luminance
    features for pixel-decodable payloads (codecs.grid_pool_features —
    resolution-invariant-ish, unlike a byte hash), the stub hash-fold
    for the rest; ``decoder`` column labels which."""
    import numpy as np

    from data_lakehouse_spark.multimodal import codecs

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
            StructField("decoder", StringType()),
        ]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs, decs = [], [], []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                out = codecs.decode_image_bytes(raw)
                if out is not None and out.get("pixels"):
                    v = codecs.grid_pool_features(
                        out["pixels"], out["width"], out["height"],
                        out["channels"], dim=dim,
                    )
                    decs.append(out["decoder"])
                else:
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    pad = (-len(arr)) % dim
                    if pad:
                        arr = np.concatenate(
                            [arr, np.zeros(pad, dtype=np.uint8)]
                        )
                    sv = arr.reshape(-1, dim).sum(axis=0).astype(np.float64) + 1.0
                    v = (sv / np.linalg.norm(sv)).tolist()
                    decs.append("stub")
                ids.append(did)
                vecs.append([float(x) for x in v])
            yield pd.DataFrame(
                {"doc_id": ids, "embedding": vecs, "decoder": decs}
            )

    return df.select(id_col, "payload").mapInPandas(_embed, schema=schema)


def audio_windows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    window_samples: int = 1024,
    hop_samples: int = 512,
) -> DataFrame:
    """Overlapping-window audio features over REAL decoded samples:
    payloads parse as PCM WAV (soundfile when importable, stdlib
    ``wave`` otherwise — codecs.decode_wav_bytes); undecodable payloads
    fall back to the byte-window stub framing. Windows are in SAMPLES
    with true ``start_sec`` timing for the real path; rms/peak computed
    on normalized [-1, 1] amplitudes either way."""
    import numpy as np

    from data_lakehouse_spark.multimodal import codecs

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("window_idx", IntegerType()),
            StructField("start_sec", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("peak", DoubleType()),
            StructField("decoder", StringType()),
        ]
    )

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "window_idx", "start_sec", "rms", "peak", "decoder",
            )}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                wav = codecs.decode_wav_bytes(raw)
                if wav is not None:
                    samples = np.asarray(wav["samples"], dtype=np.float64)
                    rate = wav["sample_rate"] * wav["channels"]
                    dec = wav["decoder"]
                else:
                    samples = (
                        np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                        - 128.0
                    ) / 128.0
                    rate = float(len(samples)) or 1.0  # whole payload = 1s
                    dec = "stub"
                for i, start in enumerate(
                    range(0, max(len(samples), 1), hop_samples)
                ):
                    w = samples[start : start + window_samples]
                    if len(w) == 0:
                        continue
                    rows["doc_id"].append(did)
                    rows["window_idx"].append(i)
                    rows["start_sec"].append(start / rate)
                    rows["rms"].append(float(np.sqrt((w**2).mean())))
                    rows["peak"].append(float(np.abs(w).max()))
                    rows["decoder"].append(dec)
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "window_idx": pd.array(rows["window_idx"], dtype="int32"),
                    "start_sec": rows["start_sec"],
                    "rms": rows["rms"],
                    "peak": rows["peak"],
                    "decoder": rows["decoder"],
                }
            )

    return df.select(id_col, "payload").mapInPandas(_windows, schema=schema)
