"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

Two tiers of kernel:

* REAL, stdlib+numpy only — ``RealImageDecoder`` decodes binary PPM
  (P6) / PGM (P5) / uncompressed 24-bit BMP, resizes (nearest
  neighbor) and extracts per-channel statistics; ``WavFeaturizer``
  decodes PCM WAV via the stdlib ``wave`` module and computes
  duration / RMS / zero-crossings / a 16-bin FFT band spectrum.
* STUBBED where a codec library is required (JPEG/PNG/mp3/...):
  ``FakeImageDecoder`` produces deterministic pseudo-metadata and
  ``StrictImageDecoder`` raises NotImplementedError where the
  libjpeg/ffmpeg call belongs — swapping in PIL changes one method
  body; the schemas, batch sizing, actor signatures and output layout
  are shared with the real tier and fully tested.

Scale notes: media payloads are large (MB, not KB), so these stages use
small ``batch_size`` (bytes, not rows, bound worker heap) and actor
pools (decoder init — codec tables, model weights — is per-actor).
"""

from __future__ import annotations

import hashlib
import struct

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


# -- real codecs (stdlib + numpy only) --------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → (h, w, channels) uint8.

    Netpbm header: magic, whitespace/comment-separated width height
    maxval, ONE whitespace byte, then raw samples.
    """
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    pix = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return pix.reshape(h, w, ch)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (BI_RGB) bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    bgr = arr[:, :, ::-1]  # BMP stores BGR, bottom-up
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):
        rows += bgr[y].tobytes() + pad
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    header_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index striding — exact, fast)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return arr[ys][:, xs]


IMAGE_FEAT_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("n_bytes", pa.int64()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("channels", pa.int64()),
        ("mean_r", pa.float64()),
        ("mean_g", pa.float64()),
        ("mean_b", pa.float64()),
        ("thumb", pa.binary()),  # PPM-encoded nearest-neighbor thumbnail
        ("error", pa.string()),
    ]
)


class RealImageDecoder:
    """Actor-pool stage with REAL decode kernels for the formats this
    environment can decode without codec libraries (binary PPM/PGM,
    uncompressed 24-bit BMP). Per-row errors are captured as rows
    (poison-payload guarantee, same as the text path); JPEG/PNG etc.
    land in the error column until a codec library is available.
    """

    def __init__(self, thumb_side: int = 8, max_pixels: int = 64_000_000):
        self.thumb_side = thumb_side
        self.max_pixels = max_pixels  # decompression-bomb guard

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:2] in (b"P6", b"P5"):
            arr = decode_ppm(payload)
        elif payload[:2] == b"BM":
            arr = decode_bmp(payload)
        else:
            raise ValueError("unsupported image format (no codec library)")
        if arr.shape[0] * arr.shape[1] > self.max_pixels:
            raise ValueError("image exceeds max_pixels guard")
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in IMAGE_FEAT_SCHEMA.names}
        payloads = batch.column("payload").to_pylist()
        for mid, p in zip(batch.column("media_id").to_pylist(), payloads):
            p = p or b""
            out["media_id"].append(mid)
            out["n_bytes"].append(len(p))
            try:
                arr = self._decode(p)
            except Exception as e:
                for k in ("width", "height", "channels",
                          "mean_r", "mean_g", "mean_b", "thumb"):
                    out[k].append(None)
                out["error"].append(str(e))
                continue
            if arr.ndim == 2 or arr.shape[2] == 1:
                arr = np.repeat(arr.reshape(*arr.shape[:2], 1), 3, axis=2)
            h, w, _ = arr.shape
            means = arr.reshape(-1, 3).mean(axis=0)
            side = self.thumb_side
            thumb = resize_nearest(arr, min(side, w), min(side, h))
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(3)
            out["mean_r"].append(float(means[0]))
            out["mean_g"].append(float(means[1]))
            out["mean_b"].append(float(means[2]))
            out["thumb"].append(encode_ppm(np.ascontiguousarray(thumb)))
            out["error"].append(None)
        return pa.table(
            {f.name: pa.array(out[f.name], f.type) for f in IMAGE_FEAT_SCHEMA}
        )


WAV_FEAT_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("n_bytes", pa.int64()),
        ("n_samples", pa.int64()),
        ("sample_rate", pa.int64()),
        ("duration_ms", pa.int64()),
        ("rms", pa.float64()),
        ("zero_crossings", pa.int64()),
        ("spectrum", pa.list_(pa.float32(), 16)),
        ("error", pa.string()),
    ]
)


class WavFeaturizer:
    """REAL audio featurizer for PCM WAV (stdlib ``wave`` + numpy):
    duration, RMS, zero-crossing count, 16-band magnitude spectrum.
    Compressed formats (mp3/ogg) error per row until a codec exists."""

    BANDS = 16

    def _features(self, payload: bytes) -> dict:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as wf:
            rate = wf.getframerate()
            n = wf.getnframes()
            width = wf.getsampwidth()
            ch = wf.getnchannels()
            raw = wf.readframes(n)
        if width != 2:
            raise ValueError(f"only 16-bit PCM supported (got {8*width}-bit)")
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        n_samples = len(x)
        rms = float(np.sqrt((x ** 2).mean())) if n_samples else 0.0
        zc = int(((x[:-1] * x[1:]) < 0).sum()) if n_samples > 1 else 0
        spec = np.zeros(self.BANDS, dtype=np.float32)
        if n_samples:
            mag = np.abs(np.fft.rfft(x))
            bands = np.array_split(mag, self.BANDS)
            spec = np.array([b.mean() if len(b) else 0.0 for b in bands],
                            dtype=np.float32)
        return {
            "n_samples": n_samples,
            "sample_rate": rate,
            "duration_ms": n_samples * 1000 // max(1, rate),
            "rms": rms,
            "zero_crossings": zc,
            "spectrum": spec.tolist(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in WAV_FEAT_SCHEMA.names}
        for mid, p in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            p = p or b""
            out["media_id"].append(mid)
            out["n_bytes"].append(len(p))
            try:
                f = self._features(p)
            except Exception as e:
                for k in ("n_samples", "sample_rate", "duration_ms", "rms",
                          "zero_crossings", "spectrum"):
                    out[k].append(None)
                out["error"].append(str(e))
                continue
            for k, v in f.items():
                out[k].append(v)
            out["error"].append(None)
        return pa.table(
            {f.name: pa.array(out[f.name], f.type) for f in WAV_FEAT_SCHEMA}
        )


# -- stub tier (codec-library formats) --------------------------------------


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


def decode_images_real(media_ds, *, batch_size: int = 64, concurrency=(1, 4),
                       thumb_side: int = 8):
    """media Dataset → IMAGE_FEAT_SCHEMA via the REAL PPM/BMP kernels
    (per-row error capture for undecodable formats)."""
    return media_ds.map_batches(
        RealImageDecoder,
        fn_constructor_kwargs={"thumb_side": thumb_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def featurize_wav(media_ds, *, batch_size: int = 64, concurrency=(1, 4)):
    """media Dataset → WAV_FEAT_SCHEMA via the REAL PCM-WAV kernel."""
    return media_ds.map_batches(
        WavFeaturizer,
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
