"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages.

The codec boundary is an IMPORT-PROBE SEAM: each stage's ``__init__``
(once per actor, never per batch) probes for the real library —
PIL for images, soundfile for audio, PyAV for video — and uses it when
importable; otherwise a BUILT-IN pure-numpy/stdlib codec takes over
for the container formats it genuinely parses (uncompressed BMP,
netpbm P5/P6, RIFF/WAVE PCM via the stdlib ``wave`` module — all
round-trip-tested against the matching ``encode_*`` helpers), and only
payloads in formats neither path can parse (JPEG/PNG/MP3/MP4 without
the library) fall through: ``fake=True`` forces the deterministic
synthetic decoder (what the plumbing tests pin), ``fake=False``
demands genuine decode (library or builtin; per-payload
NotImplementedError for formats they reject routes to problem rows,
exactly as a real codec rejecting a container), ``fake=None`` (auto)
prefers library → builtin → stub.  Video has no stdlib container
parser, so its builtin tier is absent — PyAV or stub, the one
remaining declared boundary.

Scale notes: binary payloads are wide — callers should keep
``batch_size`` small (default 32) and never carry the binary column
past the feature stage (``drop_columns`` after decode; SURVEY.md §7.4.6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ---- built-in codecs (pure numpy/stdlib — genuinely parse the format) -----


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → 24-bit uncompressed BI_RGB bottom-up BMP."""
    import struct

    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    # bottom-up scanlines, BGR order, each row padded to 4 bytes
    padded = np.zeros((h, stride), np.uint8)
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    body = padded.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return bytes(header + info + body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP (bottom-up or top-down) →
    (H, W, 3) uint8.  Raises NotImplementedError on compressed or
    palette BMPs — the library tier handles those."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if compression != 0 or bpp not in (24, 32) or hdr_size < 40:
        raise NotImplementedError(
            f"unsupported BMP (bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    nchan = bpp // 8
    stride = (w * nchan + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        raise NotImplementedError("truncated BMP payload")
    rows = np.frombuffer(payload, np.uint8, stride * h, data_off)
    rows = rows.reshape(h, stride)[:, : w * nchan].reshape(h, w, nchan)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[..., 2::-1])  # BGR(A) → RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary netpbm → (H, W, 3) uint8: P6 (RGB) directly, P5 (gray)
    replicated across channels.  ASCII variants (P1-P3) and maxval>255
    raise — rare on the web, the library tier's job."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        raise NotImplementedError("not a binary netpbm payload")
    gray = payload[1:2] == b"5"
    # header tokens: magic, width, height, maxval — '#' comments legal
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if payload[pos: pos + 1] == b"#":
            while pos < len(payload) and payload[pos: pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos: pos + 1].isspace():
            pos += 1
        if start == pos:
            raise NotImplementedError("truncated netpbm header")
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm unsupported")
    nchan = 1 if gray else 3
    need = w * h * nchan
    if len(payload) - pos < need:
        raise NotImplementedError("truncated netpbm payload")
    arr = np.frombuffer(payload, np.uint8, need, pos).reshape(h, w, nchan)
    return np.ascontiguousarray(
        np.repeat(arr, 3, axis=2) if gray else arr
    )


def builtin_image_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Magic-sniffing built-in image decode (BMP / netpbm); the
    metadata width/height are advisory — the container wins."""
    if not payload:
        raise NotImplementedError("empty payload")
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:1] == b"P":
        return decode_netpbm(payload)
    raise NotImplementedError("no built-in codec for this image format")


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """mono float in [-1, 1] → 16-bit PCM RIFF/WAVE via stdlib wave."""
    import io
    import wave

    pcm = np.clip(np.asarray(samples, np.float64), -1, 1)
    pcm = (pcm * 32767.0).round().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def builtin_audio_decode(payload: bytes):
    """RIFF/WAVE PCM (8/16/32-bit int) → (mono float64 in [-1, 1],
    rate) via the stdlib wave module — a genuine container parse, no
    third-party library."""
    import io
    import wave

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch, sw, rate = (wf.getnchannels(), wf.getsampwidth(),
                             wf.getframerate())
            raw = wf.readframes(wf.getnframes())
    except wave.Error as e:  # compressed WAVE etc.
        raise NotImplementedError(f"wave module rejected payload: {e}")
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"sample width {sw} unsupported")
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x, int(rate)


def probe_image_codec():
    """Returns a PIL-backed ``decode(payload, w, h) -> (H,W,3) uint8``
    when PIL imports, else None (caller falls back to the stub)."""
    try:
        import io

        from PIL import Image
    except Exception:
        return None

    def decode(payload: bytes, width: int, height: int) -> np.ndarray:
        if not payload:
            raise NotImplementedError("empty payload")
        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)

    return decode


def probe_audio_codec():
    """Returns a soundfile-backed ``decode(payload) -> (samples, rate)``
    when soundfile imports, else None."""
    try:
        import io

        import soundfile
    except Exception:
        return None

    def decode(payload: bytes):
        if not payload:
            raise NotImplementedError("empty payload")
        samples, rate = soundfile.read(io.BytesIO(payload),
                                       dtype="float64", always_2d=False)
        if samples.ndim > 1:  # downmix to mono for the feature stage
            samples = samples.mean(axis=1)
        return samples, int(rate)

    return decode


def probe_video_codec():
    """Returns a PyAV-backed ``decode(payload, frame_idx) -> (H,W,3)``
    when av imports, else None.  Decodes sequentially to the requested
    frame — callers sample sparse frame plans, so a seek-per-frame
    container walk is the right per-actor granularity."""
    try:
        import io

        import av
    except Exception:
        return None

    def decode(payload: bytes, frame_idx: int) -> np.ndarray:
        if not payload:
            raise NotImplementedError("empty payload")
        with av.open(io.BytesIO(payload)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i == frame_idx:
                    return frame.to_ndarray(format="rgb24")
        raise NotImplementedError(f"frame {frame_idx} past end of stream")

    return decode


def _probe_or_raise(fake: bool | None, probe, what: str, builtin=None):
    """The seam policy shared by every stage: returns the genuine codec
    callable, or None meaning 'take the stub path'.  fake=True → stub
    unconditionally; fake=False/None → the probed library when
    importable, else the built-in pure-numpy codec when the modality
    has one (its per-payload NotImplementedError on formats it cannot
    parse routes to problem rows, as a real codec rejecting a container
    does).  fake=False with NO genuine tier at all (video without
    PyAV) raises; fake=None falls back to the stub."""
    if fake is True:
        return None
    real = probe() or builtin
    if real is None and fake is False:
        raise NotImplementedError(
            f"real {what} codec not importable in this environment; "
            "construct with fake=True (deterministic stub) or fake=None "
            "(auto fallback)"
        )
    return real

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synthesize_media(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests (payload =
    repeatable pseudo-bytes; sizes vary to exercise batch sizing)."""
    ids, blobs, mimes, ws, hs = [], [], [], [], []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        size = 500 + (i * 37) % 4000
        blobs.append((h * (size // len(h) + 1))[:size])
        ids.append(f"img{i:06d}")
        mimes.append("image/png" if i % 3 else "image/jpeg")
        ws.append(64 + (i % 8) * 32)
        hs.append(64 + (i % 5) * 32)
    return pa.Table.from_pydict(
        {"media_id": ids, "media": blobs, "mime": mimes, "width": ws, "height": hs},
        schema=MEDIA_SCHEMA,
    )


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode → (8,8,3) uint8 'thumbnail'.

    REAL-CODEC BOUNDARY: replace this function with PIL/ffmpeg decode.
    Raises NotImplementedError for mime types a real codec would
    reject; the stage routes those to problem rows.
    """
    if not payload:
        raise NotImplementedError("empty payload: real codec required")
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * 6)[:192], dtype=np.uint8).reshape(8, 8, 3)
    return arr


class DecodeImage:
    """Actor-pool stage: binary media → per-image features.  Codec
    probed/'loaded' once in __init__ (ST5 analog: heavyweight parser
    runtimes, GoLanguageFrontend.kt:40-105)."""

    def __init__(self, fake: bool | None = True):
        self.codec = (_probe_or_raise(fake, probe_image_codec, "image",
                                      builtin=builtin_image_decode)
                      or _decode_stub)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["media"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        out_id, mean_l, std_l, ok = [], [], [], []
        for i, p, w, h in zip(ids, payloads, ws, hs):
            out_id.append(i)
            try:
                img = self.codec(p, w, h)
                mean_l.append(float(img.mean()))
                std_l.append(float(img.std()))
                ok.append(True)
            except NotImplementedError:
                mean_l.append(None)
                std_l.append(None)
                ok.append(False)
        # binary column deliberately NOT carried forward
        return pa.table(
            {"media_id": out_id, "px_mean": mean_l, "px_std": std_l, "ok": ok}
        )


def decode_features(media_ds, *, concurrency=(1, 4), batch_size: int = 32):
    """media Dataset → features Dataset via the actor pool; small
    batch_size because rows are binary-wide."""
    return media_ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": True},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan (video analog; the decode of
    each frame is behind the same codec boundary)."""
    return list(range(0, n_frames, max(1, every)))


class ResizeImage:
    """Actor-pool resize stage: decode (stub) → nearest-neighbor resize
    to (target, target) → re-emit as a raw-bytes thumbnail column.
    The decoded intermediate never crosses the stage boundary — only
    the (small, fixed-size) thumbnail does (SURVEY.md §7.4.6: wide
    binaries stay inside one stage)."""

    def __init__(self, target: int = 4, fake: bool | None = True):
        self.codec = (_probe_or_raise(fake, probe_image_codec, "image",
                                      builtin=builtin_image_decode)
                      or _decode_stub)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        out_id, thumbs, ok = [], [], []
        for i, p, w, h in zip(ids, batch["media"].to_pylist(),
                              batch["width"].to_pylist(),
                              batch["height"].to_pylist()):
            out_id.append(i)
            try:
                img = self.codec(p, w, h)
                # per-axis indices: real decodes are (h, w, 3) and
                # rarely square — a single shape[0] index would IndexError
                # on wide images and crop tall ones
                yi = np.linspace(0, img.shape[0] - 1, self.target).astype(int)
                xi = np.linspace(0, img.shape[1] - 1, self.target).astype(int)
                small = img[yi][:, xi]  # nearest-neighbor
                thumbs.append(small.tobytes())
                ok.append(True)
            except NotImplementedError:
                thumbs.append(None)
                ok.append(False)
        return pa.table(
            {
                "media_id": out_id,
                "thumb": pa.array(thumbs, pa.binary()),
                "thumb_w": pa.array([self.target] * len(out_id), pa.int32()),
                "thumb_h": pa.array([self.target] * len(out_id), pa.int32()),
                "ok": ok,
            }
        )


VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media", pa.large_binary()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
    ]
)


def synthesize_video(n: int, seed: int = 9) -> pa.Table:
    """Deterministic fake video table (payload pseudo-bytes + frame
    counts) for the frame-sampling plumbing."""
    ids, blobs, frames, fps = [], [], [], []
    for i in range(n):
        h = hashlib.sha256(f"v{seed}:{i}".encode()).digest()
        size = 2000 + (i * 53) % 6000
        blobs.append((h * (size // len(h) + 1))[:size])
        ids.append(f"vid{i:06d}")
        frames.append(24 + (i * 7) % 240)
        fps.append(24.0)
    return pa.Table.from_pydict(
        {"media_id": ids, "media": blobs, "n_frames": frames, "fps": fps},
        schema=VIDEO_SCHEMA,
    )


class SampleVideoFrames:
    """Actor-pool frame-sample stage: one video row fans OUT to one row
    per sampled frame (flat-map shape), each with stub-decoded frame
    features.  The frame decode is seeded by (payload, frame_idx) so
    re-runs are deterministic; a real ffmpeg seek-and-decode replaces
    ``_decode_stub`` only."""

    def __init__(self, every: int = 10, fake: bool | None = True):
        self.every = every
        real = _probe_or_raise(fake, probe_video_codec, "video")
        # unify signatures: codec(payload, frame_idx) -> (H, W, 3);
        # the stub seeds the fake frame by (payload, frame_idx)
        self.codec = real if real is not None else (
            lambda p, fi: _decode_stub(p + fi.to_bytes(4, "little"), 8, 8)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, f_idx, f_mean, ok = [], [], [], []
        for i, p, n in zip(batch["media_id"].to_pylist(),
                           batch["media"].to_pylist(),
                           batch["n_frames"].to_pylist()):
            for fi in frame_sample_plan(n, self.every):
                out_id.append(i)
                f_idx.append(fi)
                try:
                    frame = self.codec(p, fi)
                    f_mean.append(float(frame.mean()))
                    ok.append(True)
                except NotImplementedError:
                    f_mean.append(None)
                    ok.append(False)
        return pa.table(
            {
                "media_id": out_id,
                "frame_idx": pa.array(f_idx, pa.int32()),
                "frame_mean": f_mean,
                "ok": ok,
            }
        )


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media", pa.large_binary()),
        ("sample_rate", pa.int32()),
    ]
)


def synthesize_audio(n: int, seed: int = 13) -> pa.Table:
    ids, blobs, rates = [], [], []
    for i in range(n):
        h = hashlib.sha256(f"a{seed}:{i}".encode()).digest()
        size = 800 + (i * 41) % 5000
        blobs.append((h * (size // len(h) + 1))[:size])
        ids.append(f"aud{i:06d}")
        rates.append(16000 if i % 2 else 44100)
    return pa.Table.from_pydict(
        {"media_id": ids, "media": blobs, "sample_rate": rates},
        schema=AUDIO_SCHEMA,
    )


class DecodeAudio:
    """Actor-pool audio feature stage: binary → (duration, rms).  The
    real path decodes via soundfile (probed once per actor) and trusts
    the container's sample rate; the stub interprets the bytes as int8
    PCM at the metadata rate."""

    def __init__(self, fake: bool | None = True):
        self.real = _probe_or_raise(fake, probe_audio_codec, "audio",
                                    builtin=builtin_audio_decode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, dur, rms, ok = [], [], [], []
        for i, p, sr in zip(batch["media_id"].to_pylist(),
                            batch["media"].to_pylist(),
                            batch["sample_rate"].to_pylist()):
            out_id.append(i)
            if not p:
                dur.append(None)
                rms.append(None)
                ok.append(False)
                continue
            try:
                if self.real is not None:
                    samples, sr = self.real(p)
                else:
                    samples = np.frombuffer(p, dtype=np.int8).astype(
                        np.float64
                    )
            except Exception:
                # a real codec rejecting the container is a per-row
                # problem, not a stage failure
                dur.append(None)
                rms.append(None)
                ok.append(False)
                continue
            dur.append(len(samples) / sr)
            rms.append(float(np.sqrt((samples ** 2).mean())))
            ok.append(True)
        return pa.table(
            {"media_id": out_id, "duration_s": dur, "rms": rms, "ok": ok}
        )
