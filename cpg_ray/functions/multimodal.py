"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the codec step is STUBBED: ``DecodeImage(fake=True)`` produces a
deterministic fake decode (seeded by the payload hash) with the real
Ray-side plumbing — schema, batch sizing for large binary rows, actor
``__init__`` loading, output layout — in place and tested.  Swapping in
a real codec means replacing ``_decode_stub`` only.

Scale notes: binary payloads are wide — callers should keep
``batch_size`` small (default 32) and never carry the binary column
past the feature stage (``drop_columns`` after decode; SURVEY.md §7.4.6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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
    'loaded' once in __init__ (ST5 analog: heavyweight parser runtimes,
    GoLanguageFrontend.kt:40-105)."""

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real image codec not available in this container; "
                "construct with fake=True for the deterministic stub"
            )
        self.codec = _decode_stub

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
