"""Built-in GIF codec: pure stdlib/numpy GIF87a/89a decode (variable-
code-size LZW, global/local color tables, interlacing, GCE transparency
and disposal, multi-frame) plus an encoder so round-trips are testable
library-free — the same genuine-tier contract as functions/jpeg.py and
the PNG path in functions/multimodal.py.  Format per the public GIF89a
specification (CompuServe 1990) and RFC-adjacent LZW literature; no
third-party codec involved.

Reference parity note: the reference repo treats binary payloads as
opaque frontend inputs (LanguageFrontend dispatch); this module is part
of the multimodal tier the north rule adds on top — decode runs inside
actor-pool map_batches stages and any parse failure becomes a problem
row (see stages using builtin_image_decode).

Encoder and decoder use INDEPENDENT LZW table representations (dict of
byte-strings vs prefix/suffix link arrays), so round-trip equality is a
real cross-check of both, not a shared-bug tautology.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODES = 4096  # 12-bit LZW ceiling fixed by the GIF spec


# ---- LZW ------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """Variable-code-size LZW (LSB-first bit packing) → npix palette
    indices.  Table as prefix/suffix link arrays, strings reconstructed
    by back-walking — O(output) total.  Deferred clear (full table,
    no CLEAR code) is legal and handled by simply not growing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    prefix = np.zeros(_MAX_CODES, np.int32)
    suffix = np.zeros(_MAX_CODES, np.uint8)
    out = np.empty(npix, np.uint8)
    oi = 0
    code_size = min_code_size + 1
    next_code = eoi + 1
    prev = -1
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while oi < npix:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("truncated LZW stream")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size
        if code == clear:
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev == -1:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-root code")
            out[oi] = code
            oi += 1
            prev = code
            continue
        if code < next_code:
            cc = code
        elif code == next_code:
            cc = prev  # KwKwK: string(prev) + first(string(prev))
        else:
            raise ValueError(f"LZW code {code} beyond table {next_code}")
        s = []
        while cc >= eoi + 1:
            s.append(suffix[cc])
            cc = int(prefix[cc])
        s.append(cc)
        s.reverse()
        if code == next_code:
            s.append(s[0])
        if next_code < _MAX_CODES:
            prefix[next_code] = prev
            suffix[next_code] = s[0]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        take = min(len(s), npix - oi)
        out[oi:oi + take] = s[:take]
        oi += take
        prev = code
    if oi < npix:
        raise ValueError(f"LZW stream ended at {oi}/{npix} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """LZW compress palette indices (dict-of-bytes table — deliberately
    a different representation from the decoder's link arrays).  Emits
    an initial CLEAR, grows code size in lockstep with the decoder,
    and defers clearing when the table fills (spec-legal)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    outbits = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            outbits.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for k in indices.astype(np.uint8).tobytes():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _MAX_CODES:
            table[wk] = next_code
            next_code += 1
            # the encoder grows ONE entry later than the decoder (">"
            # vs "=="): its adds run one code ahead of the decoder's,
            # and the max emittable code is next_code - 1
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        outbits.append(bitbuf & 0xFF)
    return bytes(outbits)


# ---- container --------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(buf):
            raise ValueError("truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(buf[pos:pos + n])
        if len(parts[-1]) != n:
            raise ValueError("truncated sub-block")
        pos += n


def decode_gif(payload: bytes, frame_idx: int = 0) -> np.ndarray:
    """Decode frame ``frame_idx`` of a GIF87a/89a payload to an
    (H, W, 3) uint8 RGB array COMPOSITED onto the logical screen:
    frames are drawn over the canvas (GCE-transparent pixels skipped),
    disposal 0/1 keeps the canvas, 2 restores the frame region to the
    background color; disposal 3 (restore-previous) raises
    NotImplementedError (declared boundary).  Raises ValueError on any
    malformed structure — the decode stages convert either into a
    problem row."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    width, height, packed, bg_idx, _aspect = struct.unpack(
        "<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos:pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_idx < len(gct):
        bg = gct[bg_idx]
    else:
        bg = np.zeros(3, np.uint8)
    canvas = np.empty((height, width, 3), np.uint8)
    canvas[:] = bg
    transparent: int | None = None
    disposal = 0
    frame_no = 0
    while True:
        if pos >= len(payload):
            raise ValueError("missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError(
                f"frame {frame_idx} out of range ({frame_no} frames)")
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 3:
                    raise ValueError("short graphic control extension")
                gpack = data[0]
                disposal = (gpack >> 2) & 0x07
                transparent = data[3] if (gpack & 1) and len(data) > 3 \
                    else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        left, top, w, h, ipack = struct.unpack("<HHHHB", payload[pos:pos + 9])
        pos += 9
        pal = gct
        if ipack & 0x80:
            n = 2 << (ipack & 0x07)
            pal = np.frombuffer(payload[pos:pos + 3 * n], np.uint8)
            if len(pal) != 3 * n:
                raise ValueError("truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image with neither global nor local palette")
        if pos >= len(payload):
            raise ValueError("missing LZW minimum code size")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        data, pos = _read_subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, w * h).reshape(h, w)
        if ipack & 0x40:  # interlaced: rows arrive in pass order
            rows = np.empty(h, np.int64)
            rows[_interlace_order(h)] = np.arange(h)
            idx = idx[rows]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        region = canvas[top:top + h, left:left + w]
        if region.shape[:2] != (h, w):
            raise ValueError("frame exceeds logical screen")
        rgb = pal[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        if frame_no == frame_idx:
            return canvas.copy()
        if disposal == 2:
            region[:] = bg
        elif disposal == 3:
            raise NotImplementedError(
                "GIF disposal 3 (restore previous) not implemented")
        transparent = None
        disposal = 0
        frame_no += 1


def gif_n_frames(payload: bytes) -> int:
    """Count image blocks without decoding pixel data (sub-block walk
    only) — the frame-sampling planner's cheap probe."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = payload[10]
    pos = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    count = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            return count
        if block == 0x21:
            pos += 1
            _, pos = _read_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        ipack = payload[pos + 8]
        pos += 9
        if ipack & 0x80:
            pos += 3 * (2 << (ipack & 0x07))
        pos += 1  # LZW min code size
        _, pos = _read_subblocks(payload, pos)
        count += 1
    raise ValueError("missing trailer")


def _build_palette(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact palette from the unique colors across all frames (sorted
    lexicographically — deterministic), plus per-pixel indices via
    packed-u32 searchsorted.  Raises on > 256 colors: this encoder is
    the round-trip test half, not a quantizer."""
    flat = frames.reshape(-1, 3).astype(np.uint32)
    key = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    uniq = np.unique(key)
    if len(uniq) > 256:
        raise ValueError(f"{len(uniq)} colors > 256; quantize first")
    idx = np.searchsorted(uniq, key).astype(np.uint8)
    pal = np.stack([(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF,
                    uniq & 0xFF], axis=1).astype(np.uint8)
    return pal, idx.reshape(frames.shape[:-1])


def encode_gif(arr: np.ndarray, *, interlace: bool = False,
               transparent_color: tuple[int, int, int] | None = None,
               delay_cs: int = 4) -> bytes:
    """Encode (H, W) uint8 gray, (H, W, 3) RGB, or (T, H, W, 3)
    multi-frame RGB as GIF89a with one exact global palette.  With
    ``transparent_color``, pixels of that color are written as
    GCE-transparent (decode composites them away against the
    background).  Gray input gets the full 256-gray palette."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        frames_idx = arr[None]
        h, w = arr.shape
    else:
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4 or arr.shape[-1] != 3:
            raise ValueError(f"unsupported shape {arr.shape}")
        pal, frames_idx = _build_palette(arr)
        h, w = arr.shape[1:3]
    # pad palette to a power of two ≥ 4 (min LZW code size is 2)
    n_pal = max(4, 1 << int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_full = np.zeros((n_pal, 3), np.uint8)
    pal_full[:len(pal)] = pal
    gct_bits = int(np.log2(n_pal))
    min_code = max(2, gct_bits)
    trans_idx: int | None = None
    if transparent_color is not None:
        key = ((pal[:, 0].astype(np.uint32) << 16)
               | (pal[:, 1].astype(np.uint32) << 8)
               | pal[:, 2].astype(np.uint32))
        want = ((transparent_color[0] << 16) | (transparent_color[1] << 8)
                | transparent_color[2])
        hitpos = np.flatnonzero(key == want)
        if len(hitpos) == 0:
            raise ValueError("transparent_color not present in the image")
        trans_idx = int(hitpos[0])
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 0x07), 0, 0)
    out += pal_full.tobytes()
    for fi in frames_idx:
        gpack = (1 << 2) | (1 if trans_idx is not None else 0)
        out += struct.pack("<BBBBHB", 0x21, 0xF9, 4, gpack,
                           delay_cs & 0xFFFF, trans_idx or 0)
        out += b"\x00"  # GCE terminator
        ipack = 0x40 if interlace else 0
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipack)
        rows = fi[_interlace_order(h)] if interlace else fi
        out += bytes([min_code])
        comp = _lzw_encode(rows.ravel(), min_code)
        for i in range(0, len(comp), 255):
            chunk = comp[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
