"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the DECODE kernels are stubbed
(deterministic fake decode of this module's own synthetic header format, or
``NotImplementedError`` for real formats) — but all the Ray-side plumbing is
real and tested: schemas, actor signatures, small-batch sizing for wide
binary rows, and the project-early pattern (metadata splits off before any
shuffle; bytes never pass through a groupby).

Synthetic payload format (``make_fake_image``):
    b"FAKEIMG1" + width:uint16 + height:uint16 + channels:uint8 + seed:uint32
Decoding derives a deterministic per-pixel mean without materializing pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG1"


def make_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    return MAGIC + struct.pack("<HHBI", width, height, channels, seed)


class ImageDecode:
    """Actor-pool stage: binary image -> (width, height, channels, mean_px).

    Real codecs would load in ``__init__`` (once per actor).  Non-synthetic
    payloads raise NotImplementedError — clearly marked stub, the Ray
    plumbing (pool sizing, batch size, output schema) is the deliverable.
    Use small ``batch_size`` (wide binary rows): batch x concurrency must fit
    worker heap."""

    def __init__(self):
        self.magic = MAGIC

    def __call__(self, b: pa.Table) -> pa.Table:
        blobs = b["image"].to_pylist()
        w, h, c, mean = [], [], [], []
        for blob in blobs:
            if blob is None or not blob.startswith(self.magic):
                raise NotImplementedError(
                    "real image codecs unavailable in this environment; "
                    "only the synthetic FAKEIMG1 format decodes")
            fw, fh, fc, seed = struct.unpack("<HHBI", blob[len(self.magic):])
            w.append(fw)
            h.append(fh)
            c.append(fc)
            # deterministic stand-in for mean pixel value
            mean.append(int((seed * 2654435761) % 256))
        return pa.table({
            "image_id": b["image_id"],
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "channels": pa.array(c, pa.int8()),
            "mean_px": pa.array(mean, pa.int32()),
        })


class ImageResize:
    """Stub resize stage: passes metadata through with the target size,
    emitting the same binary payload (a real kernel would re-encode).
    Demonstrates binary-in/binary-out streaming with bounded batches."""

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target

    def __call__(self, b: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": b["image_id"],
            "image": b["image"],
            "target_w": pa.array([self.target[0]] * b.num_rows, pa.int32()),
            "target_h": pa.array([self.target[1]] * b.num_rows, pa.int32()),
        })


class AudioFrameSample:
    """Stub audio frame sampler: binary audio -> every Nth frame index list,
    derived from a synthetic header (b'FAKEAUD1' + n_frames:uint32)."""

    MAGIC_A = b"FAKEAUD1"

    def __init__(self, every: int = 1000):
        self.every = every

    def __call__(self, b: pa.Table) -> pa.Table:
        blobs = b["audio"].to_pylist()
        frames = []
        for blob in blobs:
            if blob is None or not blob.startswith(self.MAGIC_A):
                raise NotImplementedError("only synthetic FAKEAUD1 decodes here")
            (n,) = struct.unpack("<I", blob[len(self.MAGIC_A):len(self.MAGIC_A) + 4])
            frames.append(list(range(0, n, self.every)))
        return pa.table({
            "audio_id": b["audio_id"],
            "frame_idx": pa.array(frames, pa.list_(pa.int32())),
        })


def fake_image_dataset(n: int, seed: int = 7):
    """Small deterministic image table for the plumbing tests."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    rows = pa.table({
        "image_id": pa.array(range(n), pa.int64()),
        "image": pa.array(
            [make_fake_image(int(rng.integers(64, 1024)),
                             int(rng.integers(64, 1024)), 3, int(rng.integers(1 << 31)))
             for _ in range(n)], pa.binary()),
    })
    return rd.from_arrow(rows)
