"""Built-in TIFF codec: pure stdlib/numpy baseline TIFF 6.0 decode
(both byte orders, gray/RGB, multi-strip, uncompressed or PackBits
RLE) plus an encoder for library-free round-trips — the same
genuine-tier contract as functions/gif.py / functions/jpeg.py.
Format per the public TIFF 6.0 specification (Adobe 1992); PackBits is
the public Apple RLE scheme the spec reproduces.

Boundary: LZW/JPEG/deflate-compressed TIFFs, tiled layout, planar
configuration 2, and bit depths other than 8 raise
NotImplementedError (the decode stages route that to problem rows).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTometric = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE: n in [0,127] → copy n+1 literals; n in
    [-127,-1] → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            if i + b + 1 > n:
                raise ValueError("PackBits literal run past end")
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:
            if i >= n:
                raise ValueError("PackBits repeat run past end")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    if len(out) < expected:
        raise ValueError(f"PackBits ended at {len(out)}/{expected}")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of ≥3 identical bytes become repeats,
    everything else literals (the spec's recommended strategy)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        start = i
        i += run
        while i < n and (i - start) < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        lit = data[start:min(i, start + 128)]
        i = start + len(lit)
        out += bytes([len(lit) - 1]) + lit
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """First IFD of a baseline TIFF → (H, W) or (H, W, 3) uint8."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    magic, ifd_off = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")

    def read_entry(pos: int):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, pos)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            return tag, None
        total = size * cnt
        if total <= 4:
            raw = payload[pos + 8: pos + 8 + total]
        else:
            (off,) = struct.unpack_from(bo + "I", payload, pos + 8)
            raw = payload[off: off + total]
            if len(raw) != total:
                raise ValueError(f"tag {tag} data out of bounds")
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = None
        return tag, vals

    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags = {}
    for k in range(n_entries):
        pos = ifd_off + 2 + 12 * k
        if pos + 12 > len(payload):
            raise ValueError("truncated IFD")
        tag, vals = read_entry(pos)
        if vals is not None:
            tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(_TAG_WIDTH)
    h = one(_TAG_HEIGHT)
    spp = one(_TAG_SPP, 1)
    comp = one(_TAG_COMPRESSION, 1)
    planar = one(_TAG_PLANAR, 1)
    bps = tags.get(_TAG_BPS, [8])
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"bits-per-sample {bps} unsupported")
    if spp not in (1, 3):
        raise NotImplementedError(f"{spp} samples per pixel unsupported")
    if planar != 1:
        raise NotImplementedError("planar configuration 2 unsupported")
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (only none/PackBits)")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    rows_per_strip = one(_TAG_ROWS_PER_STRIP, h)
    row_bytes = w * spp
    parts = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = payload[off: off + cnt]
        if len(raw) != cnt:
            raise ValueError("strip out of bounds")
        rows = min(rows_per_strip, h - si * rows_per_strip)
        if rows <= 0:
            raise ValueError("more strips than rows")
        want = rows * row_bytes
        parts.append(packbits_decode(raw, want) if comp == 32773
                     else raw[:want])
        if len(parts[-1]) != want:
            raise ValueError("strip shorter than geometry")
    flat = np.frombuffer(b"".join(parts), np.uint8)
    if len(flat) != h * row_bytes:
        raise ValueError("pixel data does not match geometry")
    img = flat.reshape(h, w, spp)
    photometric = one(_TAG_PHOTometric, 1)
    if spp == 1:
        img = img[..., 0]
        if photometric == 0:  # WhiteIsZero
            img = 255 - img
    return img


def encode_tiff(arr: np.ndarray, *, compression: str = "none",
                rows_per_strip: int = 16) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → little-endian baseline
    TIFF, multi-strip, compression "none" or "packbits"."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        spp = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        spp = 3
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    comp_code = {"none": 1, "packbits": 32773}[compression]
    flat = arr.reshape(h, -1)
    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = flat[r0:r0 + rows_per_strip].tobytes()
        strips.append(packbits_encode(raw) if comp_code == 32773 else raw)

    entries = []  # (tag, type, count, value-or-bytes)

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    n_tags = 10
    header = 8
    ifd_size = 2 + 12 * n_tags + 4
    # layout: header | IFD | bps array (3 shorts, RGB only) |
    #         strip offset/count arrays | strip data
    extra = ifd_size + header
    bps_off = extra
    if spp == 3:
        extra += 6
    n_strips = len(strips)
    off_arr_off = extra
    if n_strips > 1:
        extra += 4 * n_strips * 2
    data_off = extra
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    entry(_TAG_WIDTH, 3, [w])
    entry(_TAG_HEIGHT, 3, [h])
    if spp == 3:
        entry(_TAG_BPS, 3, None)  # pointer to bps_off
    else:
        entry(_TAG_BPS, 3, [8])
    entry(_TAG_COMPRESSION, 3, [comp_code])
    entry(_TAG_PHOTometric, 3, [2 if spp == 3 else 1])
    entry(_TAG_STRIP_OFFSETS, 4, offs)
    entry(_TAG_SPP, 3, [spp])
    entry(_TAG_ROWS_PER_STRIP, 3, [rows_per_strip])
    entry(_TAG_STRIP_COUNTS, 4, [len(s) for s in strips])
    entry(_TAG_PLANAR, 3, [1])
    entries.sort(key=lambda e: e[0])

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        if tag == _TAG_BPS and vals is None:
            out += struct.pack("<HHII", tag, typ, 3, bps_off)
            continue
        cnt = len(vals)
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            raw = struct.pack(f"<{cnt}{'H' if typ == 3 else 'I'}", *vals)
            out += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
        else:
            at = off_arr_off if tag == _TAG_STRIP_OFFSETS else \
                off_arr_off + 4 * n_strips
            out += struct.pack("<HHII", tag, typ, cnt, at)
    out += struct.pack("<I", 0)  # next IFD
    if spp == 3:
        out += struct.pack("<3H", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *offs)
        out += struct.pack(f"<{n_strips}I", *[len(s) for s in strips])
    for s in strips:
        out += s
    return bytes(out)
