"""Delta Lake deletion vectors — sidecar codec + file I/O, from the
PUBLIC protocol spec only (delta-io PROTOCOL.md, "Deletion Vectors"
and "Deletion Vector Format" sections; RoaringBitmap portable format
per the RoaringFormatSpec, github.com/RoaringBitmap/RoaringFormatSpec).

A deletion vector (DV) marks ROW INDEXES of a data file as deleted
without rewriting the file — the modern Delta writer's MOR path. The
pieces, all spec-defined:

- **Descriptor** (in the ``add`` action JSON): ``storageType``
  (``"u"`` relative-with-uuid / ``"i"`` inline / ``"p"`` absolute
  path), ``pathOrInlineDv``, ``offset``, ``sizeInBytes``,
  ``cardinality``.
- **Z85 encoding** (ZeroMQ RFC 32 alphabet): the ``u`` storage type
  encodes a 16-byte UUID as 20 chars; ``i`` encodes the whole bitmap.
- **DV file layout**: 1-byte format version (=1), then per DV at its
  ``offset``: int32 big-endian data size, the serialized
  RoaringBitmapArray, int32 big-endian CRC-32 of the data.
- **RoaringBitmapArray "portable" format**: int32 LE magic
  1681511377, int64 LE bitmap count, then per 32-bit bitmap an int32
  LE key (the row index's high 32 bits) + a standard portable 32-bit
  RoaringBitmap (cookie 12346 array/bitmap containers or cookie
  12347 with run containers — all three container kinds decoded).

Scale note: DVs are per-file metadata sidecars (bounded by a file's
row count, typically KBs); the read path decodes them driver-side and
applies ONE broadcast anti-join on (file, row_index) — the same
row-index application Spark's own DV scanner performs, expressed with
``_metadata.row_index`` lineage so Catalyst keeps the scan vectorized.

Reference parity: mei-glow/data-lakehouse reads Delta through the
Delta runtime, which applies DVs natively; this module gives the
from-scratch log replayer (interop/delta.py) the same coverage.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from typing import Iterable

__all__ = [
    "z85_encode",
    "z85_decode",
    "serialize_roaring_bitmap_array",
    "deserialize_roaring_bitmap_array",
    "write_dv_file",
    "dv_indexes",
    "attach_dv",
]

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}

_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # run-cookie bitmaps with < 4 containers omit offsets


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: 4 bytes → 5 chars (len must be a multiple of 4)."""
    if len(data) % 4:
        raise ValueError("z85 requires length % 4 == 0")
    out = []
    for i in range(0, len(data), 4):
        n = struct.unpack(">I", data[i : i + 4])[0]
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 requires length % 5 == 0")
    out = bytearray()
    for i in range(0, len(s), 5):
        n = 0
        for c in s[i : i + 5]:
            n = n * 85 + _Z85_INV[c]
        out += struct.pack(">I", n)
    return bytes(out)


def _serialize_rb32(values: list[int], use_runs: bool) -> bytes:
    """One standard-portable 32-bit RoaringBitmap from SORTED unique
    values. Containers: run (when ``use_runs``), else array (≤4096
    values) or bitset."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    if use_runs:
        out += struct.pack("<I", _SERIAL_COOKIE_RUN | ((n - 1) << 16))
        out += bytes([0xFF] * ((n + 7) // 8))  # every container is a run
    else:
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    bodies = []
    for k in keys:
        vals = containers[k]
        if use_runs:
            runs = []
            start = prev = vals[0]
            for v in vals[1:]:
                if v == prev + 1:
                    prev = v
                    continue
                runs.append((start, prev - start))
                start = prev = v
            runs.append((start, prev - start))
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln) for s, ln in runs
            )
        elif len(vals) <= 4096:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            body = bytes(bits)
        bodies.append(body)
    write_offsets = (not use_runs) or n >= _NO_OFFSET_THRESHOLD
    if write_offsets:
        pos = len(out) + 4 * n
        for body in bodies:
            out += struct.pack("<I", pos)
            pos += len(body)
    for body in bodies:
        out += body
    return bytes(out)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard-portable 32-bit RoaringBitmap at ``pos`` →
    (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"roaring: unknown cookie {cookie}")
    keys_cards = [
        struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)
    ]
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential parse
    values: list[int] = []
    for i, (key, card_m1) in enumerate(keys_cards):
        card = card_m1 + 1
        base = key << 16
        is_run = bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + start + j for j in range(length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & -b
                    values.append(base + (byte_i << 3) + low.bit_length() - 1)
                    b ^= low
    return values, pos


def serialize_roaring_bitmap_array(
    indexes: Iterable[int], *, use_runs: bool = False
) -> bytes:
    """64-bit row-index set → the protocol's portable
    RoaringBitmapArray bytes (magic + count + per-high-32 bitmaps)."""
    by_high: dict[int, list[int]] = {}
    for i in sorted(set(indexes)):
        if i < 0:
            raise ValueError("row indexes must be >= 0")
        by_high.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Iq", _MAGIC, len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<I", high)
        out += _serialize_rb32(by_high[high], use_runs)
    return bytes(out)


def deserialize_roaring_bitmap_array(data: bytes) -> list[int]:
    """Portable RoaringBitmapArray bytes → sorted 64-bit row indexes."""
    magic, count = struct.unpack_from("<Iq", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"deletion vector: bad magic {magic}")
    pos = 12
    out: list[int] = []
    for _ in range(count):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = _deserialize_rb32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def write_dv_file(path: str, dv_datas: list[bytes]) -> list[int]:
    """Write one DV FILE holding the given serialized bitmaps in the
    spec layout (version byte, then per DV: int32 BE size + data +
    int32 BE CRC-32). Returns each DV's ``offset``."""
    offsets = []
    with open(path, "wb") as f:
        f.write(b"\x01")
        pos = 1
        for data in dv_datas:
            offsets.append(pos)
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            # raw 32 CRC bits, big endian — a signed-int writer (the
            # JVM's writeInt of (int) crc) produces the same bytes, so
            # masking the high bit would reject half of real files
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 8 + len(data)
    return offsets


def attach_dv(
    location: str,
    indexes: Iterable[int],
    *,
    storage: str = "u",
    prefix: str = "",
    use_runs: bool = False,
) -> dict:
    """Materialize a DV for ``indexes`` under a Delta table dir and
    return the protocol descriptor dict for the ``add`` action
    (the test/writer half; :func:`dv_indexes` is the read half)."""
    idx = sorted(set(indexes))
    data = serialize_roaring_bitmap_array(idx, use_runs=use_runs)
    if storage == "i":
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(_pad4(data)),
            "sizeInBytes": len(data),
            "cardinality": len(idx),
        }
    u = _uuid.uuid4()
    if storage == "u":
        dv_dir = os.path.join(location, prefix) if prefix else location
        os.makedirs(dv_dir, exist_ok=True)
        fpath = os.path.join(dv_dir, f"deletion_vector_{u}.bin")
        path_or = prefix + z85_encode(u.bytes)
    elif storage == "p":
        fpath = os.path.join(location, f"dv_abs_{u}.bin")
        path_or = fpath
    else:
        raise ValueError(f"unknown DV storage type {storage!r}")
    offset = write_dv_file(fpath, [data])[0]
    return {
        "storageType": storage,
        "pathOrInlineDv": path_or,
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(idx),
    }


def _pad4(data: bytes) -> bytes:
    # Z85 needs length % 4; the spec's inline DVs are padded by the
    # writer and bounded by sizeInBytes on read
    return data + b"\x00" * (-len(data) % 4)


def dv_indexes(location: str, dv: dict) -> list[int]:
    """Decode a deletion-vector DESCRIPTOR (from an ``add`` action) →
    sorted deleted row indexes. Handles all three storage types and
    verifies size + CRC for on-disk DVs."""
    st = dv["storageType"]
    if st == "i":
        raw = z85_decode(dv["pathOrInlineDv"])[: dv["sizeInBytes"]]
        return deserialize_roaring_bitmap_array(raw)
    if st == "u":
        por = dv["pathOrInlineDv"]
        # trailing 20 chars are the Z85 uuid; anything before is the
        # optional random prefix (a storage-sharding dir)
        prefix, enc = por[:-20], por[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc))
        fpath = os.path.join(location, prefix, f"deletion_vector_{u}.bin")
    elif st == "p":
        fpath = dv["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown DV storage type {st!r}")
    with open(fpath, "rb") as f:
        if f.read(1) != b"\x01":
            raise ValueError(f"{fpath}: unsupported DV format version")
        f.seek(dv["offset"])
        (size,) = struct.unpack(">i", f.read(4))
        if size != dv["sizeInBytes"]:
            raise ValueError(
                f"{fpath}: DV size {size} != descriptor "
                f"sizeInBytes {dv['sizeInBytes']}"
            )
        data = f.read(size)
        (crc,) = struct.unpack(">I", f.read(4))
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError(f"{fpath}: DV checksum mismatch")
    out = deserialize_roaring_bitmap_array(data)
    if len(out) != dv["cardinality"]:
        raise ValueError(
            f"{fpath}: DV cardinality {len(out)} != descriptor "
            f"{dv['cardinality']}"
        )
    return out
