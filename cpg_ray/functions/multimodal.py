"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages.

The codec boundary is an IMPORT-PROBE SEAM: each stage's ``__init__``
(once per actor, never per batch) probes for the real library —
PIL for images, soundfile for audio, PyAV for video — and uses it when
importable; otherwise the deterministic synthetic decoder (seeded by
the payload hash) stands in, keeping the Ray-side plumbing — schema,
batch sizing for large binary rows, actor ``__init__`` loading, output
layout — real and tested everywhere.  ``fake=True`` forces the stub
(what the deterministic tests pin), ``fake=False`` demands a real
codec (raises NotImplementedError when the probe comes back empty),
``fake=None`` (auto) takes whichever the environment offers.

Scale notes: binary payloads are wide — callers should keep
``batch_size`` small (default 32) and never carry the binary column
past the feature stage (``drop_columns`` after decode; SURVEY.md §7.4.6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


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


def _probe_or_raise(fake: bool | None, probe, what: str):
    """The seam policy shared by every stage: returns the real codec
    callable, or None meaning 'take the stub path'.  fake=True → stub
    unconditionally; fake=False → real or raise; fake=None → real when
    the probe finds one, stub otherwise."""
    if fake is True:
        return None
    real = probe()
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
        self.codec = (_probe_or_raise(fake, probe_image_codec, "image")
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
        self.codec = (_probe_or_raise(fake, probe_image_codec, "image")
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
        self.real = _probe_or_raise(fake, probe_audio_codec, "audio")

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
