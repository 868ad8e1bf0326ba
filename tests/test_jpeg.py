"""Baseline JPEG codec: round-trip accuracy, restart markers, boundary
raises, and the builtin-tier e2e through the actor-pool decode stage."""

import numpy as np
import pytest


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        (xx + yy) * 255 // max(h + w - 2, 1),
    ], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_accuracy_all_modes():
    """Quality-75+ round trips stay within JPEG-typical error on smooth
    images, for 4:4:4 / 4:2:0 / grayscale and odd (non-MCU-multiple)
    dimensions."""
    from cpg_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _grad(61, 75)  # odd dims: exercises edge-replicate padding
    for sub in ("4:4:4", "4:2:0"):
        for q, tol in ((95, 8), (75, 14)):
            out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            assert out.shape == img.shape and out.dtype == np.uint8
            err = np.abs(out.astype(float) - img.astype(float))
            assert err.max() <= tol, (sub, q, err.max())

    g = _grad(40, 33)[..., 0]
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (40, 33, 3)
    assert (out[..., 0] == out[..., 1]).all()  # gray replicated
    assert np.abs(out[..., 0].astype(float) - g).max() <= 10

    # decode is deterministic
    data = encode_jpeg(img, quality=80)
    assert np.array_equal(decode_jpeg(data), decode_jpeg(data))


def test_jpeg_restart_markers_identical():
    """DRI/RSTn resynchronization decodes bit-identically to the
    marker-free stream (predictors reset per interval)."""
    from cpg_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _grad(64, 80)
    for sub in ("4:4:4", "4:2:0"):
        base = decode_jpeg(encode_jpeg(img, 85, sub))
        for ri in (1, 3, 7):
            out = decode_jpeg(encode_jpeg(img, 85, sub,
                                          restart_interval=ri))
            assert np.array_equal(out, base), (sub, ri)


def test_jpeg_boundary_raises():
    """Everything outside baseline sequential raises
    NotImplementedError (routes to problem rows), never a wrong
    image or an uncaught crash."""
    from cpg_ray.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(NotImplementedError):
        decode_jpeg(b"")
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\xff\xd8junk")  # marker desync
    data = bytearray(encode_jpeg(_grad(16, 16)))
    sof = data.find(b"\xff\xc0")
    # flip SOF0 → SOF9 (arithmetic coding): the declared boundary
    data[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    # flip SOF0 → SOF2 with a BASELINE scan header: a corrupt
    # progressive stream (Ss=0, Se=63 is an invalid DC band) — must
    # raise, never misdecode
    data[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    # truncated entropy data: the scan ends before every MCU decodes
    whole = encode_jpeg(_grad(64, 64), quality=95)
    with pytest.raises(NotImplementedError):
        decode_jpeg(whole[: len(whole) // 2])


def test_builtin_decode_mutation_fuzz_never_escapes():
    """Stage contract: for ANY corrupted payload the builtin decode
    either returns an image or raises NotImplementedError — no
    ValueError/IndexError/struct.error escapes to kill an actor
    batch.  Byte-level mutations of valid JPEG/PNG/BMP payloads."""
    from cpg_ray.functions.jpeg import encode_jpeg
    from cpg_ray.functions.multimodal import (builtin_image_decode,
                                              encode_bmp, encode_png)

    rng = np.random.default_rng(3)
    img = _grad(24, 24)
    bases = [encode_jpeg(img, 80), encode_png(img), encode_bmp(img)]
    for base in bases:
        b = bytearray(base)
        for _trial in range(60):
            mut = bytearray(b)
            for _ in range(rng.integers(1, 8)):
                mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
            try:
                out = builtin_image_decode(bytes(mut), 24, 24)
                assert out.dtype == np.uint8 and out.ndim == 3
            except NotImplementedError:
                pass  # the only permitted failure mode
        # truncations too
        for cut in (1, 7, len(b) // 3, len(b) - 2):
            try:
                builtin_image_decode(bytes(b[:cut]), 24, 24)
            except NotImplementedError:
                pass


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("PIL"),
    reason="PIL not installed — differential check needs a reference",
)
def test_jpeg_differential_vs_pil():
    """When PIL is present, our decoder must agree with it on our own
    encodings within IDCT rounding slack."""
    import io

    from PIL import Image

    from cpg_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _grad(48, 64)
    for sub in ("4:4:4", "4:2:0"):
        data = encode_jpeg(img, 85, sub)
        ours = decode_jpeg(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_jpeg_through_actor_stage_builtin_tier():
    """JPEG payloads — baseline AND progressive — decode genuinely
    through DecodeImage's builtin tier (fake=None, no PIL needed); a
    corrupt stream routes to a problem row."""
    import pyarrow as pa

    from cpg_ray.functions.jpeg import encode_jpeg, encode_jpeg_progressive
    from cpg_ray.functions.multimodal import DecodeImage

    img = _grad(24, 32)
    corrupt = bytearray(encode_jpeg(img))
    corrupt[corrupt.find(b"\xff\xc0") + 1] = 0xC9  # arithmetic coding
    batch = pa.Table.from_pydict({
        "media_id": ["jpg444", "jpg420", "jpgprog", "jpgbad"],
        "media": [encode_jpeg(img, 90, "4:4:4"),
                  encode_jpeg(img, 90, "4:2:0"),
                  encode_jpeg_progressive(img, 90, "4:2:0"),
                  bytes(corrupt)],
        "mime": ["image/jpeg"] * 4,
        "width": [32] * 4, "height": [24] * 4,
    })
    out = DecodeImage(fake=None)(batch).to_pandas().set_index("media_id")
    assert bool(out.ok.jpg444) and bool(out.ok.jpg420)
    assert bool(out.ok.jpgprog)
    assert not bool(out.ok.jpgbad)
    assert abs(out.px_mean.jpg444 - img.mean()) < 3.0
    assert abs(out.px_mean.jpg420 - img.mean()) < 3.0
    assert abs(out.px_mean.jpgprog - img.mean()) < 3.0


def test_jpeg_progressive_bit_identical_to_baseline():
    """The progressive scan script encodes the SAME quantized
    coefficients as the baseline encoder, so the two decode paths must
    reconstruct bit-identically — this pins DC first/refinement, AC
    first EOB runs, and AC refinement correction bits in one equality.
    Covers both subsamplings, grayscale, non-MCU-aligned dimensions,
    a flat image (maximal EOB runs) and pure noise (dense refinement
    traffic) across coarse and fine quantization."""
    from cpg_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                        encode_jpeg_progressive)

    rng = np.random.RandomState(7)
    cases = [
        (_grad(64, 64), "4:2:0", 75),
        (_grad(48, 56), "4:4:4", 75),
        (_grad(17, 23), "4:2:0", 92),
        (np.full((40, 40, 3), 130, np.uint8), "4:2:0", 75),  # flat
        (rng.randint(0, 256, (33, 41, 3)).astype(np.uint8), "4:4:4", 25),
        (rng.randint(0, 256, (30, 22)).astype(np.uint8), "4:4:4", 95),
    ]
    for img, sub, q in cases:
        base = decode_jpeg(encode_jpeg(img, q, sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, q, sub))
        assert np.array_equal(base, prog), (img.shape, sub, q)


def test_jpeg_progressive_differential_vs_pil():
    """When PIL is present it must agree with our progressive decode
    on our own progressive encodings within IDCT rounding slack."""
    import io

    Image = pytest.importorskip("PIL.Image")

    from cpg_ray.functions.jpeg import decode_jpeg, encode_jpeg_progressive

    img = _grad(48, 64)
    for sub in ("4:4:4", "4:2:0"):
        data = encode_jpeg_progressive(img, 85, sub)
        ours = decode_jpeg(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
