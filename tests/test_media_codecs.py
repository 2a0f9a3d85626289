"""Real media codecs (multimodal/codecs.py + the real-tier operators
in columns.py): pixel-true PPM/BMP decode, header-true PNG/JPEG/GIF,
sample-true PCM WAV — all pure Python/stdlib, so these tests run
identically with or without PIL/soundfile installed (the adapter mode
decodes the same payloads to the same values)."""

from __future__ import annotations

import io
import struct
import wave

from pyspark.sql import functions as F

from data_lakehouse_spark.multimodal import codecs, columns


def _ppm(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + bytes(rgb) * (w * h)


def _bmp(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal uncompressed 24-bit BMP (bottom-up, padded rows)."""
    r, g, b = rgb
    row = bytes((b, g, r)) * w
    row += b"\x00" * ((-len(row)) % 4)
    pixel_data = row * h
    header = b"BM" + struct.pack(
        "<IHHI", 54 + len(pixel_data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                    2835, 2835, 0, 0)
    return header + pixel_data


def _png_header(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def _wav(rate: int, samples: list[float]) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(
            struct.pack(
                f"<{len(samples)}h",
                *[int(max(-1.0, min(1.0, s)) * 32767) for s in samples],
            )
        )
    return buf.getvalue()


def test_pure_python_image_decoders():
    out = codecs.decode_image_bytes(_ppm(4, 3, (255, 0, 0)))
    assert (out["width"], out["height"], out["channels"]) == (4, 3, 3)
    assert out["decoder"] == "pnm" or out["decoder"] == "pil"
    assert out["pixels"][:3] == [255, 0, 0]

    out = codecs.decode_image_bytes(_bmp(5, 2, (0, 128, 255)))
    assert (out["width"], out["height"]) == (5, 2)
    assert out["pixels"][:3] == [0, 128, 255]  # BGR flipped back to RGB

    out = codecs.decode_image_bytes(_png_header(640, 480))
    assert (out["width"], out["height"], out["channels"]) == (640, 480, 3)

    assert codecs.decode_image_bytes(b"not an image at all") is None


def test_wav_decode_sample_true():
    sig = [0.0, 0.5, -0.5, 1.0, -1.0, 0.25]
    out = codecs.decode_wav_bytes(_wav(8000, sig))
    assert out["sample_rate"] == 8000 and out["channels"] == 1
    assert len(out["samples"]) == len(sig)
    for got, want in zip(out["samples"], sig):
        assert abs(got - want) < 2e-4  # 16-bit quantization
    assert codecs.decode_wav_bytes(b"RIFFgarbage") is None


def test_grid_pool_features_resolution_invariant():
    """The REAL descriptor's point: the same flat color at two
    resolutions pools to (nearly) the same vector; a byte-hash stub
    would not."""
    small = codecs.decode_image_bytes(_ppm(8, 8, (200, 10, 10)))
    big = codecs.decode_image_bytes(_ppm(32, 16, (200, 10, 10)))
    va = codecs.grid_pool_features(
        small["pixels"], 8, 8, 3, dim=16
    )
    vb = codecs.grid_pool_features(
        big["pixels"], 32, 16, 3, dim=16
    )
    assert max(abs(a - b) for a, b in zip(va, vb)) < 1e-9


def test_decode_image_operator_labels_paths(spark):
    rows = [
        (1, _ppm(6, 4, (1, 2, 3))),
        (2, _bmp(3, 3, (9, 9, 9))),
        (3, _png_header(100, 50)),
        (4, b"opaque blob with no codec"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in columns.decode_image(df).collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (6, 4)
    assert got[1]["decoder"] in ("pnm", "pil")
    assert (got[2]["width"], got[2]["height"]) == (3, 3)
    assert (got[3]["width"], got[3]["height"]) == (100, 50)
    assert got[4]["decoder"] == "stub"
    # strict mode drops what it can't really decode
    strict = columns.decode_image(df, allow_stub=False)
    assert sorted(r["doc_id"] for r in strict.collect()) == [1, 2, 3]


def test_audio_windows_operator_real_timing(spark):
    rate, n = 8000, 4096
    sig = [0.5 if (i // 512) % 2 == 0 else 0.0 for i in range(n)]
    df = spark.createDataFrame(
        [(1, _wav(rate, sig)), (2, b"not audio")],
        "doc_id long, payload binary",
    )
    out = columns.audio_windows(
        df, window_samples=512, hop_samples=512
    )
    real = out.filter(F.col("doc_id") == 1).orderBy("window_idx").collect()
    assert real[0]["decoder"] in ("wave", "soundfile")
    assert len(real) == n // 512
    # true second-based timing: window i starts at i*512/8000 s
    assert abs(real[1]["start_sec"] - 512 / rate) < 1e-9
    # alternating loud/silent 512-blocks -> alternating rms
    assert real[0]["rms"] > 0.4 and real[1]["rms"] < 1e-6
    assert out.filter(F.col("doc_id") == 2).first()["decoder"] == "stub"


def test_feature_extract_real_vs_stub_label(spark):
    df = spark.createDataFrame(
        [(1, _ppm(8, 8, (50, 100, 150))), (2, b"blob")],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in columns.feature_extract(df).collect()}
    assert got[1]["decoder"] in ("pnm", "pil")
    assert got[2]["decoder"] == "stub"
    # real features are normalized luminances in [0, 1]
    assert all(0.0 <= v <= 1.0 for v in got[1]["embedding"])
    lum = (0.299 * 50 + 0.587 * 100 + 0.114 * 150) / 255.0
    assert abs(got[1]["embedding"][0] - lum) < 1e-9


def _ppm_pattern(w: int, h: int, scale: int = 1) -> bytes:
    """Block pattern: pixel (x, y) = the base 8x8 checker-ish gradient
    nearest-neighbor upscaled by ``scale`` — the same IMAGE at a
    different resolution."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            sx, sy = x // scale, y // scale
            v = (sx * 31 + sy * 17) % 256
            px += bytes((v, 255 - v, (v * 3) % 256))
    return f"P6\n{w} {h}\n255\n".encode() + bytes(px)


def test_split_pnm_stream_exact_boundaries():
    f1 = _ppm(4, 3, (1, 2, 3))
    f2 = _ppm(8, 8, (9, 8, 7))
    f3 = _ppm_pattern(8, 8)
    stream = f1 + f2 + f3
    frames = codecs.split_pnm_stream(stream)
    assert frames == [f1, f2, f3]
    # trailing garbage: clean stop after the valid prefix
    assert codecs.split_pnm_stream(stream + b"not a frame") == [f1, f2, f3]
    # truncated final frame: dropped, earlier frames kept
    assert codecs.split_pnm_stream(f1 + f2[:-5]) == [f1]
    assert codecs.split_pnm_stream(b"") == []
    assert codecs.split_pnm_stream(b"P3\n1 1\n255\n0 0 0") == []  # ASCII: not a binary stream


def test_frame_embed_real_resolution_invariant_features(spark):
    """The per-frame descriptors are REAL and resolution-invariant: a
    video re-encoded at 2x resolution (nearest-neighbor upscale of
    every frame) produces IDENTICAL grid-pool embeddings — the property
    the hash-fold stub cannot have (its vectors change with any byte)."""
    base_frames = [_ppm_pattern(8, 8), _ppm(8, 8, (0, 255, 0)), _ppm_pattern(8, 8)]
    up_frames = [_ppm_pattern(16, 16, scale=2), _ppm(16, 16, (0, 255, 0)),
                 _ppm_pattern(16, 16, scale=2)]
    df = spark.createDataFrame(
        [(1, b"".join(base_frames)), (2, b"".join(up_frames)), (3, b"junk")],
        "doc_id long, payload binary",
    )
    out = columns.frame_embed_real(df, dim=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r
    # doc 3 is not a PNM stream: zero rows, never a stub fallback
    assert 3 not in by_doc
    assert set(by_doc[1]) == {0, 1, 2} and set(by_doc[2]) == {0, 1, 2}
    for i in range(3):
        a, b = by_doc[1][i], by_doc[2][i]
        assert a["decoder"] == b["decoder"] == "pnm"
        assert (a["width"], b["width"]) == (8, 16)
        # 2x nearest-neighbor upscale maps every pixel into the same
        # 4x4 grid cell -> identical means up to float summation order
        # (4 vs 16 addends per cell)
        assert max(
            abs(x - y) for x, y in zip(a["embedding"], b["embedding"])
        ) < 1e-12
    # distinct content -> distinct descriptors
    assert by_doc[1][0]["embedding"] != by_doc[1][1]["embedding"]
