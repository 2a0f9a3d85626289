"""Deletion-vector codec pins (no Spark needed): Z85, the portable
RoaringBitmapArray format (array/bitset/run containers, 64-bit
high/low split), the versioned DV file layout, descriptor storage
types, and the corruption checks. Format constants follow the public
Delta PROTOCOL.md + RoaringFormatSpec."""

from __future__ import annotations

import os
import random
import struct

import pytest

from data_lakehouse_spark.interop import dv


def test_z85_round_trip_and_alphabet():
    rng = random.Random(11)
    for n in (4, 16, 20, 40, 400):
        b = bytes(rng.randrange(256) for _ in range(n))
        enc = dv.z85_encode(b)
        assert len(enc) == n // 4 * 5
        assert dv.z85_decode(enc) == b
    with pytest.raises(ValueError, match="% 4"):
        dv.z85_encode(b"abc")
    # spec vector from ZeroMQ RFC 32: "HelloWorld" decodes to these bytes
    assert dv.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


@pytest.mark.parametrize("use_runs", [False, True])
def test_roaring_round_trip_all_container_kinds(use_runs):
    rng = random.Random(3)
    cases = [
        [],
        [0],
        [5, 7, 9],
        list(range(200)),                       # run-shaped
        rng.sample(range(70_000), 5000),        # arrays across containers
        list(range(60_000, 66_000)),            # dense bitset container
        sorted(rng.sample(range(66_000), 4097)) # just past the array cap
        + [2**32 + 5, 2**33 + 7],               # multiple high-32 buckets
    ]
    for c in cases:
        data = dv.serialize_roaring_bitmap_array(c, use_runs=use_runs)
        assert dv.deserialize_roaring_bitmap_array(data) == sorted(set(c))


def test_roaring_wire_layout_is_the_spec_shape():
    # magic 1681511377 LE, 8-byte LE bucket count, 4-byte LE bucket key
    data = dv.serialize_roaring_bitmap_array([1, 2, 2**32 + 9])
    magic, nmaps = struct.unpack_from("<Iq", data, 0)
    assert magic == 1681511377
    assert nmaps == 2
    (key0,) = struct.unpack_from("<I", data, 12)
    assert key0 == 0
    (cookie,) = struct.unpack_from("<I", data, 16)
    assert cookie == 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
    with pytest.raises(ValueError, match="magic"):
        dv.deserialize_roaring_bitmap_array(b"\x00" * 16)
    with pytest.raises(ValueError, match=">= 0"):
        dv.serialize_roaring_bitmap_array([-1])


def test_dv_file_round_trip_and_corruption_checks(tmp_path):
    loc = str(tmp_path)
    idx = [1, 3, 5, 4096, 70_000]
    for st in ("u", "i", "p"):
        d = dv.attach_dv(
            loc, idx, storage=st, prefix="ab/" if st == "u" else ""
        )
        assert d["cardinality"] == len(idx)
        assert dv.dv_indexes(loc, d) == idx

    # raw 32-bit CRC: find a payload whose checksum has the HIGH BIT
    # set — a signed-masked implementation would refuse real writers'
    # files on ~half of all payloads
    import zlib

    n = 0
    while True:
        data = dv.serialize_roaring_bitmap_array([n, n + 2])
        if zlib.crc32(data) >= 2**31:
            break
        n += 1
    path = os.path.join(loc, "crc.bin")
    (off,) = dv.write_dv_file(path, [data])
    desc = {
        "storageType": "p", "pathOrInlineDv": path, "offset": off,
        "sizeInBytes": len(data), "cardinality": 2,
    }
    assert dv.dv_indexes(loc, desc) == [n, n + 2]

    # corruption: flip one data byte → checksum mismatch
    with open(path, "r+b") as f:
        f.seek(off + 4 + 5)
        b = f.read(1)
        f.seek(off + 4 + 5)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum"):
        dv.dv_indexes(loc, desc)

    # descriptor size mismatch is caught before parsing
    bad = dict(desc, sizeInBytes=len(data) + 1)
    with pytest.raises(ValueError, match="size"):
        dv.dv_indexes(loc, bad)

    # cardinality mismatch is caught after parsing
    (off2,) = dv.write_dv_file(os.path.join(loc, "c2.bin"), [data])
    bad2 = {
        "storageType": "p", "pathOrInlineDv": os.path.join(loc, "c2.bin"),
        "offset": off2, "sizeInBytes": len(data), "cardinality": 99,
    }
    with pytest.raises(ValueError, match="cardinality"):
        dv.dv_indexes(loc, bad2)
