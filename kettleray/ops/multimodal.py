"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata columns
alongside (format, width/height or sample_rate, duration). Decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages: heavy codec/model state belongs in ``__init__``, batches stay
SMALL (binary payloads are wide — see batch_size guidance below).

The decode kernels themselves are STUBBED in this container (no
PIL/ffmpeg/librosa): each stage tries the real library first and
otherwise either raises NotImplementedError (strict mode) or computes a
deterministic fake from the bytes (test mode) — the Ray-side plumbing
(schema, actor signature, batch sizing, output layout) is real and
tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# Media batches: payloads are typically 0.1-10 MB per row, so batch_size
# must be set by BYTES not rows; 32-64 rows keeps a batch under the
# object-store sweet spot even for 1 MB images.
DEFAULT_MEDIA_BATCH_SIZE = 32

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("format", pa.string()),          # png/jpg/wav/mp4/...
    ("payload", pa.large_binary()),
    ("meta_json", pa.string()),
])


def _fake_dims(payload: bytes) -> tuple[int, int, float]:
    """Deterministic pseudo-decode: dimensions + mean intensity derived
    from a hash of the bytes (stands in for a real decoder in tests)."""
    h = hashlib.blake2b(payload, digest_size=16).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    mean = h[2] / 255.0
    return w, ht, round(mean, 6)


class ImageFeatures:
    """≙ an image decode + feature-extract stage.

    Real path: PIL decode -> (width, height, mean pixel). Stub path
    (``mode='fake'``): deterministic hash-derived features. ``mode=
    'strict'`` raises NotImplementedError when PIL is unavailable."""

    def __init__(self, payload_col: str = "payload", mode: str = "fake"):
        self.payload_col = payload_col
        self.mode = mode
        try:
            from PIL import Image           # noqa: F401
            self.pil = Image
        except ImportError:
            self.pil = None
            if mode == "strict":
                raise NotImplementedError(
                    "image decode requires PIL, not present in this "
                    "container; use mode='fake' for plumbing tests")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        ws, hs, means = [], [], []
        for p in payloads:
            if self.pil is not None:
                import io
                img = self.pil.open(io.BytesIO(p))
                a = np.asarray(img, dtype=np.float64)
                ws.append(img.width)
                hs.append(img.height)
                means.append(round(float(a.mean()) / 255.0, 6))
            else:
                w, h, m = _fake_dims(p)
                ws.append(w)
                hs.append(h)
                means.append(m)
        batch = batch.append_column("width", pa.array(ws, type=pa.int32()))
        batch = batch.append_column("height", pa.array(hs, type=pa.int32()))
        return batch.append_column("mean_intensity",
                                   pa.array(means, type=pa.float64()))


class AudioFeatures:
    """≙ audio decode + feature stage: duration + rms (stubbed the same
    way; real path would use soundfile/librosa)."""

    def __init__(self, payload_col: str = "payload", mode: str = "fake"):
        self.payload_col = payload_col
        if mode == "strict":
            raise NotImplementedError("audio decode libs not present; "
                                      "use mode='fake'")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        dur, rms = [], []
        for p in payloads:
            h = hashlib.blake2b(p, digest_size=8).digest()
            dur.append(round(0.5 + h[0] / 16.0, 3))
            rms.append(round(h[1] / 255.0, 6))
        batch = batch.append_column("duration_s",
                                    pa.array(dur, type=pa.float64()))
        return batch.append_column("rms", pa.array(rms, type=pa.float64()))


def extract_image_features(ds, *, payload_col: str = "payload",
                           mode: str = "fake",
                           concurrency=(1, 4),
                           batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    """Actor-pool image feature extraction: decoder state per actor,
    small batches (payloads are wide), zero-copy binary columns."""
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency,
                          fn_constructor_args=(payload_col, mode))


def extract_audio_features(ds, *, payload_col: str = "payload",
                           mode: str = "fake",
                           concurrency=(1, 4),
                           batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency,
                          fn_constructor_args=(payload_col, mode))


_KIND_FORMAT = {"image": "png", "audio": "wav", "video": "mp4"}


def synthetic_media_table(n: int, *, seed: int = 42,
                          kinds: tuple = ("image", "audio")) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests (payload bytes
    depend only on (seed, row index), never on ``kinds``)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(128 + int(i) % 512) for i in range(n)]
    kind = [kinds[i % len(kinds)] for i in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kind, type=pa.string()),
        "format": pa.array([_KIND_FORMAT[k] for k in kind],
                           type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "meta_json": pa.array(["{}"] * n, type=pa.string()),
    })


class VideoFrameSample:
    """≙ a video frame-sampling stage (decode container -> sample k
    frames uniformly -> emit one ROW PER FRAME). The 1->N expansion
    shape matters for scale: output batches are frame rows, so the
    executor's backpressure sees the true (k x) volume instead of one
    opaque blob per video.

    Real path would use ffmpeg/imageio (absent in this container —
    ``mode='strict'`` raises NotImplementedError). ``mode='fake'``:
    frame count and frame bytes derived deterministically from the
    payload hash, plumbing (schema, expansion, batch sizing) real."""

    def __init__(self, payload_col: str = "payload", k: int = 4,
                 mode: str = "fake"):
        self.payload_col, self.k, self.mode = payload_col, k, mode
        try:
            import imageio_ffmpeg               # noqa: F401
            self.ffmpeg = imageio_ffmpeg
        except ImportError:
            self.ffmpeg = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.ffmpeg is None and self.mode == "strict":
            raise NotImplementedError(
                "no ffmpeg in this environment; use mode='fake' to "
                "exercise the pipeline plumbing")
        ids, fidx, ts, frames = [], [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(),
                                t[self.payload_col].to_pylist()):
            h = hashlib.blake2b(payload, digest_size=16).digest()
            n_frames = 8 + h[0] % 56          # fake container length
            fps = 8.0 + h[1] % 23
            step = max(n_frames // self.k, 1)
            for j, fr in enumerate(range(0, n_frames, step)[:self.k]):
                ids.append(mid)
                fidx.append(fr)
                ts.append(round(fr / fps, 4))
                frames.append(hashlib.blake2b(
                    payload + fr.to_bytes(4, "little"),
                    digest_size=32).digest())
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(fidx, type=pa.int64()),
            "ts_s": pa.array(ts, type=pa.float64()),
            "frame_payload": pa.array(frames, type=pa.large_binary()),
        })


def sample_video_frames(ds, *, payload_col: str = "payload", k: int = 4,
                        mode: str = "fake", concurrency=(1, 4),
                        batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    """Actor-pool frame sampling; byte-bounded batches (video payloads
    are the widest media rows — keep batch_size small)."""
    return ds.map_batches(VideoFrameSample, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency,
                          fn_constructor_args=(payload_col, k, mode))
