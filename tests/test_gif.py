"""GIF codec: round-trips (encoder dict-table LZW vs decoder
link-array LZW — independent representations, so equality is a real
cross-check), known-bytes pins, interlace, transparency compositing,
multi-frame disposal, and malformed-payload errors."""

import numpy as np
import pytest

from cpg_ray.functions.gif import (
    decode_gif,
    encode_gif,
    gif_n_frames,
)

# the canonical smallest GIF: 1×1, 2-entry GCT (white, black), one
# opaque pixel of palette index 0 (white) — widely published bytes
_ONE_PX = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
           b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b")


def test_known_one_pixel_gif():
    arr = decode_gif(_ONE_PX)
    assert arr.shape == (1, 1, 3)
    assert tuple(arr[0, 0]) == (255, 255, 255)
    assert gif_n_frames(_ONE_PX) == 1


def test_roundtrip_gray():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == (23, 31, 3)
    np.testing.assert_array_equal(out[..., 0], img)
    np.testing.assert_array_equal(out[..., 1], img)


def test_roundtrip_rgb_few_colors():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (11, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 11, (40, 33))]
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_256_colors_exercises_code_growth():
    rng = np.random.default_rng(9)
    pal = np.array(
        [[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)],
        dtype=np.uint8)
    img = pal[rng.integers(0, 256, (64, 64))]
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_interlaced():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 8, (29, 17), dtype=np.uint8) * 30
    np.testing.assert_array_equal(
        decode_gif(encode_gif(img, interlace=True)),
        decode_gif(encode_gif(img)))


def test_transparency_composites_to_background():
    img = np.zeros((4, 4, 3), np.uint8)
    img[1:3, 1:3] = (200, 10, 10)
    out = decode_gif(encode_gif(img, transparent_color=(0, 0, 0)))
    # transparent pixels fall through to the background (palette entry
    # 0 = the lexicographically-smallest color = black here)
    assert tuple(out[0, 0]) == (0, 0, 0)
    assert tuple(out[1, 1]) == (200, 10, 10)


def test_multi_frame_and_frame_indexing():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, 5, (3, 12, 9))]
    blob = encode_gif(frames)
    assert gif_n_frames(blob) == 3
    for t in range(3):
        np.testing.assert_array_equal(decode_gif(blob, t), frames[t])
    with pytest.raises(ValueError, match="out of range"):
        decode_gif(blob, 3)


def test_long_stream_deferred_clear():
    # > 4096 table entries forces the full-table path on both sides
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (120, 120), dtype=np.uint8)
    out = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(out[..., 2], img)


def test_malformed_payloads_raise_value_error():
    good = encode_gif(np.full((6, 6), 9, np.uint8))
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x01\x00")
    with pytest.raises(ValueError):
        decode_gif(good[:20])
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + good[6:])
    # corrupt an interior LZW byte → either a bad code or a bad pixel
    # count, never a crash class other than ValueError
    bad = bytearray(good)
    bad[-10] ^= 0xFF
    try:
        decode_gif(bytes(bad))
    except ValueError:
        pass


def test_builtin_image_decode_dispatches_gif():
    from cpg_ray.functions.multimodal import builtin_image_decode

    img = np.full((5, 7), 77, np.uint8)
    out = builtin_image_decode(encode_gif(img), 0, 0)
    assert out.shape == (5, 7, 3)
    assert int(out[0, 0, 0]) == 77


# ---- property: round-trip over arbitrary small images -----------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    ncolors=st.integers(1, 256), seed=st.integers(0, 10 ** 6),
    interlace=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_property(h, w, ncolors, seed, interlace):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncolors, (h, w))]
    out = decode_gif(encode_gif(img, interlace=interlace))
    np.testing.assert_array_equal(out, img)


@given(junk=st.binary(max_size=400), seed=st.integers(0, 1000))
@settings(max_examples=80, deadline=None)
def test_gif_decode_total_on_corrupted_payloads(junk, seed):
    """Mutation fuzz: a valid GIF with a corrupted interior never
    raises anything but ValueError / NotImplementedError — the stage
    contract (problem rows, never actor death)."""
    rng = np.random.default_rng(seed)
    base = bytearray(encode_gif(
        rng.integers(0, 256, (9, 11), dtype=np.uint8)))
    if junk:
        at = seed % max(len(base) - len(junk), 1)
        base[at:at + len(junk)] = junk
    try:
        decode_gif(bytes(base))
    except (ValueError, NotImplementedError):
        pass
