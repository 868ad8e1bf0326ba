"""Multimodal plumbing: resize, video frame-sampling (flat-map fan-out),
audio features — actor-pool stages around the marked codec boundary."""

from __future__ import annotations

import numpy as np
import ray.data as rd

from cpg_ray.functions.multimodal import (
    DecodeAudio,
    ResizeImage,
    SampleVideoFrames,
    frame_sample_plan,
    synthesize_audio,
    synthesize_media,
    synthesize_video,
)


def test_resize_emits_fixed_thumbnails_and_routes_failures():
    media = synthesize_media(40)
    ds = rd.from_arrow(media).map_batches(
        ResizeImage, fn_constructor_kwargs={"target": 4, "fake": True},
        batch_size=8, batch_format="pyarrow", concurrency=(1, 2),
    )
    df = ds.to_pandas()
    assert len(df) == 40
    okd = df[df.ok]
    assert len(okd) == 40
    assert all(len(t) == 4 * 4 * 3 for t in okd.thumb)  # fixed-size out
    # deterministic: same payload → same thumbnail
    df2 = rd.from_arrow(media).map_batches(
        ResizeImage, fn_constructor_kwargs={"target": 4, "fake": True},
        batch_size=16, batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    a = df.sort_values("media_id").reset_index(drop=True)
    b = df2.sort_values("media_id").reset_index(drop=True)
    assert all(x == y for x, y in zip(a.thumb, b.thumb))


def test_frame_sampling_fans_out_deterministically():
    vids = synthesize_video(12)
    ds = rd.from_arrow(vids).map_batches(
        SampleVideoFrames, fn_constructor_kwargs={"every": 10, "fake": True},
        batch_size=4, batch_format="pyarrow", concurrency=(1, 2),
    )
    df = ds.to_pandas()
    n_frames = dict(zip(vids["media_id"].to_pylist(),
                        vids["n_frames"].to_pylist()))
    for mid, sub in df.groupby("media_id"):
        plan = frame_sample_plan(n_frames[mid], 10)
        assert sorted(sub.frame_idx) == plan
    assert df.ok.all()
    # frame features differ across frames of the same video (seeded by idx)
    one = df[df.media_id == df.media_id.iloc[0]]
    assert one.frame_mean.nunique() > 1


def test_audio_features_and_empty_payload_problem():
    import pyarrow as pa

    aud = synthesize_audio(10)
    # inject an empty payload → must route to ok=False, never raise
    aud = pa.Table.from_pydict(
        {
            "media_id": aud["media_id"].to_pylist() + ["aud_empty"],
            "media": aud["media"].to_pylist() + [b""],
            "sample_rate": aud["sample_rate"].to_pylist() + [16000],
        },
        schema=aud.schema,
    )
    df = rd.from_arrow(aud).map_batches(
        DecodeAudio, fn_constructor_kwargs={"fake": True},
        batch_size=4, batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()
    assert len(df) == 11
    bad = df[~df.ok]
    assert list(bad.media_id) == ["aud_empty"]
    good = df[df.ok]
    assert (good.duration_s > 0).all()
    assert np.isfinite(good.rms).all()
