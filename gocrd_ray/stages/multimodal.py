"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The container has no image/audio libraries, so the DECODE KERNELS ARE
STUBS — ``FakeImageDecoder``/``FakeAudioFeaturizer`` produce
deterministic pseudo-metadata from the payload bytes, and
``StrictImageDecoder`` raises NotImplementedError where a real libjpeg /
ffmpeg call belongs. Everything AROUND the kernel is real and tested:
schemas, byte-bounded batch sizing, actor signatures, broadcast config,
and output layout — swapping in a real decoder changes one method body.

Scale notes: media payloads are large (MB, not KB), so these stages use
small ``batch_size`` (bytes, not rows, bound worker heap) and actor
pools (decoder init — codec tables, model weights — is per-actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime_type", pa.string()),
    ]
)

IMAGE_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("n_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sha1", pa.string()),
    ]
)

AUDIO_FEAT_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("n_bytes", pa.int64()),
        ("duration_ms", pa.int64()),
        ("features", pa.list_(pa.float32(), 16)),
    ]
)


class FakeImageDecoder:
    """Actor-pool image 'decode' stage with a deterministic fake kernel.

    Real deployment: __init__ loads codec/model state once per actor;
    __call__ decodes a batch. Here _decode derives (width, height,
    channels) from the payload hash — stable, testable plumbing.
    """

    def __init__(self, max_side: int = 4096):
        self.max_side = max_side  # real decoder: reject decompression bombs

    def _decode(self, payload: bytes) -> tuple[int, int, int]:
        # STUB — replace with PIL/libjpeg in a real deployment
        h = hashlib.sha1(payload).digest()
        return (
            1 + int.from_bytes(h[0:2], "big") % self.max_side,
            1 + int.from_bytes(h[2:4], "big") % self.max_side,
            3,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        dims = [self._decode(p or b"") for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": pc.cast(
                    pc.binary_length(batch.column("payload")), pa.int64()
                ),
                "width": pa.array([d[0] for d in dims], pa.int32()),
                "height": pa.array([d[1] for d in dims], pa.int32()),
                "channels": pa.array([d[2] for d in dims], pa.int32()),
                "sha1": pa.array(
                    [hashlib.sha1(p or b"").hexdigest() for p in payloads],
                    pa.string(),
                ),
            }
        ).cast(IMAGE_META_SCHEMA)


class StrictImageDecoder(FakeImageDecoder):
    """The honest variant: fails loudly where the real codec belongs."""

    def _decode(self, payload: bytes):
        raise NotImplementedError(
            "image decoding requires an image library (PIL/opencv) not "
            "present in this environment; use FakeImageDecoder for "
            "plumbing tests"
        )


class FakeAudioFeaturizer:
    """Actor-pool audio feature stage (deterministic fake kernel):
    payload → fixed 16-dim float feature vector + pseudo-duration."""

    DIM = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats, durs = [], []
        for p in payloads:
            p = p or b""
            h = hashlib.sha256(p).digest()
            v = np.frombuffer(h[: self.DIM * 2], dtype=np.uint16).astype(np.float32)
            feats.append((v / 65535.0).tolist())
            durs.append(len(p) * 8000 // max(1, 16000))  # fake: bytes→ms
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": pc.cast(
                    pc.binary_length(batch.column("payload")), pa.int64()
                ),
                "duration_ms": pa.array(durs, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32(), self.DIM)),
            }
        ).cast(AUDIO_FEAT_SCHEMA)


def decode_images(media_ds, *, batch_size: int = 16, concurrency=(1, 4),
                  strict: bool = False):
    """media Dataset → image metadata Dataset (actor pool; small batches
    because payload bytes, not row count, bound worker heap)."""
    cls = StrictImageDecoder if strict else FakeImageDecoder
    return media_ds.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def featurize_audio(media_ds, *, batch_size: int = 16, concurrency=(1, 4)):
    return media_ds.map_batches(
        FakeAudioFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_from_pages(pages_ds):
    """Adapter: reuse the pages table's binary ``html`` column as a media
    payload table, for exercising the multimodal plumbing on testdata."""

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": b.column("url"),
                "kind": pa.array(["image"] * len(b), pa.string()),
                "payload": b.column("html"),
                "mime_type": pa.array(["application/octet-stream"] * len(b)),
            }
        ).cast(MEDIA_SCHEMA)

    return pages_ds.map_batches(to_media, batch_format="pyarrow")
