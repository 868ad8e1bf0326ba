"""TIFF codec: round-trips across strip sizes and compressions,
PackBits pinned against hand-computed runs, malformed-payload
totality."""

import numpy as np
import pytest

from cpg_ray.functions.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def test_packbits_known_vectors():
    # the TIFF 6.0 spec's worked example
    data = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA,
                  0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA,
                  0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
    enc = packbits_encode(data)
    assert packbits_decode(enc, len(data)) == data
    # repeat runs compress
    assert len(packbits_encode(b"\x00" * 100)) <= 4
    # pure literals cost one header byte per 128
    lit = bytes(range(100))
    assert packbits_decode(packbits_encode(lit), 100) == lit


def test_roundtrip_gray_and_rgb_all_compressions():
    rng = np.random.default_rng(6)
    gray = rng.integers(0, 256, (21, 13), dtype=np.uint8)
    rgb = rng.integers(0, 256, (17, 9, 3), dtype=np.uint8)
    flat = np.repeat(rng.integers(0, 4, (30, 5), dtype=np.uint8) * 60,
                     7, axis=1)  # runs → PackBits actually compresses
    for img in (gray, rgb, flat):
        for comp in ("none", "packbits"):
            for rps in (4, 16, 64):
                out = decode_tiff(encode_tiff(
                    img, compression=comp, rows_per_strip=rps))
                np.testing.assert_array_equal(out, img)
    assert len(encode_tiff(flat, compression="packbits")) < \
        len(encode_tiff(flat, compression="none"))


def test_big_endian_and_whiteiszero():
    # hand-build a 2×2 big-endian gray TIFF, WhiteIsZero photometric
    import struct

    px = bytes([0, 64, 128, 255])
    ifd = struct.pack(">H", 8)
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 0), (273, 4, 1, 8 + 2 + 8 * 12 + 4),
        (278, 3, 1, 2), (279, 4, 1, 4),
    ]
    body = b"".join(
        struct.pack(">HHI", t, ty, c)
        + (struct.pack(">HH", v, 0) if ty == 3 else struct.pack(">I", v))
        for t, ty, c, v in entries)
    blob = b"MM" + struct.pack(">HI", 42, 8) + ifd + body \
        + struct.pack(">I", 0) + px
    out = decode_tiff(blob)
    np.testing.assert_array_equal(out, 255 - np.frombuffer(
        px, np.uint8).reshape(2, 2))


def test_malformed_tiffs_raise():
    good = encode_tiff(np.full((6, 6), 7, np.uint8))
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00\x99\x00\x00\x00")
    with pytest.raises(ValueError):
        decode_tiff(good[:30])
    with pytest.raises((ValueError, NotImplementedError)):
        bad = bytearray(good)
        bad[22] ^= 0xFF
        decode_tiff(bytes(bad))


def test_builtin_image_decode_dispatches_tiff():
    from cpg_ray.functions.multimodal import builtin_image_decode

    img = np.full((4, 5, 3), 99, np.uint8)
    out = builtin_image_decode(encode_tiff(img), 0, 0)
    np.testing.assert_array_equal(out, img)


# ---- property: decode totality under mutation --------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(junk=st.binary(max_size=200), seed=st.integers(0, 1000),
       comp=st.sampled_from(["none", "packbits"]))
@settings(max_examples=80, deadline=None)
def test_tiff_decode_total_on_corrupted_payloads(junk, seed, comp):
    rng = np.random.default_rng(seed)
    base = bytearray(encode_tiff(
        rng.integers(0, 256, (9, 7, 3), dtype=np.uint8),
        compression=comp, rows_per_strip=4))
    if junk:
        at = seed % max(len(base) - len(junk), 1)
        base[at:at + len(junk)] = junk
    try:
        decode_tiff(bytes(base))
    except (ValueError, NotImplementedError):
        pass
