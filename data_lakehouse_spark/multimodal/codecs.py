"""Real media decoders for the multimodal tier.

Three honesty levels, best available wins per payload:

1. **Library adapter** — PIL (images) / soundfile (audio) when
   importable (``pip install pillow soundfile`` in real deployments;
   not shipped in this container).
2. **Pure-Python codecs** (always available, stdlib only):
   - full PIXEL decode: PPM/PGM (P5/P6 binary, P2/P3 ASCII) and
     uncompressed 24/32-bit BMP;
   - header (dimensions/format) decode: PNG, JPEG (SOF scan), GIF;
   - full AUDIO decode: PCM WAV via the stdlib ``wave`` module.
3. **Deterministic stub** (columns.py) for anything else — loudly
   labeled, never silently mixed with real output: every decoded row
   carries a ``decoder`` column naming the path taken.

Features extracted from real pixels use grid mean-pooling (a real, if
simple, visual descriptor) — unlike the stub's hash fold, two images
of the same scene at different sizes pool to nearby vectors.
"""

from __future__ import annotations

import io
import struct

__all__ = [
    "decode_image_bytes",
    "decode_wav_bytes",
    "grid_pool_features",
    "split_pnm_stream",
    "HAVE_PIL",
    "HAVE_SOUNDFILE",
]

try:  # pragma: no cover - absent in this container
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

try:  # pragma: no cover - absent in this container
    import soundfile as _soundfile

    HAVE_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAVE_SOUNDFILE = False


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------


def _decode_pnm(data: bytes) -> dict | None:
    """PPM/PGM (netpbm): full pixel decode, pure Python."""
    if len(data) < 2 or data[:1] != b"P" or data[1:2] not in b"2356":
        return None
    kind = data[:2].decode()
    # header tokens: magic, width, height, maxval — # comments allowed
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            pos = data.find(b"\n", pos)
            if pos < 0:
                return None
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tokens.append(data[pos:end])
            pos = end
    if len(tokens) < 3:
        return None
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        return None  # 16-bit netpbm: out of scope
    pos += 1  # single whitespace after maxval
    channels = 3 if kind in ("P3", "P6") else 1
    n = w * h * channels
    if kind in ("P5", "P6"):
        pix = data[pos : pos + n]
        if len(pix) < n:
            return None
        pixels = list(pix)
    else:  # ASCII
        vals = data[pos:].split()
        if len(vals) < n:
            return None
        pixels = [int(v) for v in vals[:n]]
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "format": f"image/x-portable-{'pixmap' if channels == 3 else 'graymap'}",
        "pixels": pixels,
        "decoder": "pnm",
    }


def _decode_bmp(data: bytes) -> dict | None:
    """Uncompressed 24/32-bit BMP: full pixel decode (bottom-up rows,
    4-byte row padding, BGR order — the classic format quirks)."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32) or w <= 0:
        return None
    flip = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    row_stride = (w * bytes_pp + 3) & ~3
    pixels: list[int] = []
    for row in range(h):
        src_row = (h - 1 - row) if flip else row
        base = pix_off + src_row * row_stride
        if base + w * bytes_pp > len(data):
            return None
        for x in range(w):
            b_, g, r = data[base + x * bytes_pp : base + x * bytes_pp + 3]
            pixels.extend((r, g, b_))  # BGR -> RGB
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "format": "image/bmp",
        "pixels": pixels,
        "decoder": "bmp",
    }


def _decode_png_header(data: bytes) -> dict | None:
    if len(data) < 26 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", data, 16)
    color_type = data[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        return None
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "format": "image/png",
        "pixels": None,  # header-only (full decode needs defiltering)
        "decoder": "png-header",
    }


def _decode_jpeg_header(data: bytes) -> dict | None:
    """Walk JPEG markers to the SOF frame header for dimensions."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(data):
                return None
            h, w = struct.unpack_from(">HH", data, pos + 5)
            channels = data[pos + 9]
            return {
                "width": w,
                "height": h,
                "channels": channels,
                "format": "image/jpeg",
                "pixels": None,
                "decoder": "jpeg-header",
            }
        pos += 2 + seg_len
    return None


def _decode_gif_header(data: bytes) -> dict | None:
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack_from("<HH", data, 6)
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "format": "image/gif",
        "pixels": None,
        "decoder": "gif-header",
    }


def _decode_pil(data: bytes) -> dict | None:  # pragma: no cover - needs PIL
    try:
        img = _PILImage.open(io.BytesIO(data))
        img.load()
    except Exception:
        return None
    rgb = img.convert("RGB")
    return {
        "width": img.width,
        "height": img.height,
        "channels": len(img.getbands()),
        "format": f"image/{(img.format or 'unknown').lower()}",
        "pixels": [v for px in rgb.getdata() for v in px],
        "decoder": "pil",
    }


def decode_image_bytes(data: bytes) -> dict | None:
    """Best-available image decode; None if no codec recognizes the
    payload (caller decides whether to stub or drop)."""
    if HAVE_PIL:
        out = _decode_pil(data)
        if out is not None:
            return out
    for dec in (
        _decode_pnm,
        _decode_bmp,
        _decode_png_header,
        _decode_jpeg_header,
        _decode_gif_header,
    ):
        out = dec(data)
        if out is not None:
            return out
    return None


def split_pnm_stream(data: bytes, max_frames: int = 100_000) -> list[bytes]:
    """Split a concatenated binary-netpbm stream (back-to-back P5/P6
    frames — the PPM analog of an MJPEG stream) into one byte slice per
    frame. Each frame's length is computed from its own header
    (width·height·channels after maxval), so the split is exact with no
    delimiter scanning. Parsing stops cleanly at the first
    non-conforming byte — trailing garbage yields the frames before it,
    never an exception (decode robustness contract of this module)."""
    frames: list[bytes] = []
    off = 0
    while off < len(data) and len(frames) < max_frames:
        if data[off : off + 1] != b"P" or data[off + 1 : off + 2] not in b"56":
            break
        channels = 3 if data[off + 1 : off + 2] == b"6" else 1
        tokens: list[bytes] = []
        pos = off + 2
        ok = True
        while len(tokens) < 3 and pos < len(data):
            c = data[pos : pos + 1]
            if c == b"#":
                pos = data.find(b"\n", pos)
                if pos < 0:
                    ok = False
                    break
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(data) and not data[end : end + 1].isspace():
                    end += 1
                tokens.append(data[pos:end])
                pos = end
        if not ok or len(tokens) < 3:
            break
        try:
            w, h, maxval = (int(t) for t in tokens)
        except ValueError:
            break
        if w <= 0 or h <= 0 or maxval > 255:
            break
        end = pos + 1 + w * h * channels  # single whitespace after maxval
        if end > len(data):
            break
        frames.append(data[off:end])
        off = end
    return frames


def grid_pool_features(
    pixels: list[int], width: int, height: int, channels: int, dim: int = 16
) -> list[float]:
    """Real visual descriptor from decoded pixels: luminance grid
    mean-pool to a fixed ``dim`` vector (row-major grid of
    ceil(sqrt(dim))² cells, truncated). Values normalized to [0, 1]."""
    import math

    if not pixels or width <= 0 or height <= 0:
        return [0.0] * dim
    side = math.ceil(math.sqrt(dim))
    sums = [0.0] * (side * side)
    counts = [0] * (side * side)
    for y in range(height):
        cy = min(y * side // height, side - 1)
        row_base = y * width * channels
        for x in range(width):
            base = row_base + x * channels
            if channels >= 3:
                lum = (
                    0.299 * pixels[base]
                    + 0.587 * pixels[base + 1]
                    + 0.114 * pixels[base + 2]
                )
            else:
                lum = float(pixels[base])
            cell = cy * side + min(x * side // width, side - 1)
            sums[cell] += lum
            counts[cell] += 1
    return [
        (sums[i] / counts[i] / 255.0) if counts[i] else 0.0
        for i in range(dim)
    ]


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def decode_wav_bytes(data: bytes) -> dict | None:
    """PCM WAV decode via the stdlib ``wave`` module: sample rate,
    channel count, and samples normalized to [-1, 1] floats
    (16/8/32-bit PCM). soundfile handles everything else when
    importable."""
    if HAVE_SOUNDFILE:  # pragma: no cover - needs soundfile
        try:
            import numpy as np

            samples, rate = _soundfile.read(io.BytesIO(data))
            if samples.ndim > 1:
                n_ch = samples.shape[1]
                samples = samples.reshape(-1)
            else:
                n_ch = 1
            return {
                "sample_rate": int(rate),
                "channels": int(n_ch),
                "samples": [float(x) for x in np.asarray(samples)],
                "decoder": "soundfile",
            }
        except Exception:
            pass
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    if width == 2:
        vals = struct.unpack(f"<{len(frames) // 2}h", frames)
        samples = [v / 32768.0 for v in vals]
    elif width == 1:  # unsigned 8-bit
        samples = [(b - 128) / 128.0 for b in frames]
    elif width == 4:
        vals = struct.unpack(f"<{len(frames) // 4}i", frames)
        samples = [v / 2147483648.0 for v in vals]
    else:
        return None
    return {
        "sample_rate": rate,
        "channels": n_ch,
        "samples": samples,
        "decoder": "wave",
    }
