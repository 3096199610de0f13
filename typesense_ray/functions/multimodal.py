"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): each stage either raises ``NotImplementedError``
(``backend="real"``) or produces a deterministic fake derived from the
payload bytes (``backend="fake"``, the tested path). Everything around
the kernel — schema contract, small batch sizes for large payloads,
actor lifecycle, output layout — is real, so swapping in PIL/torchaudio
later only replaces the kernel body.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("meta_json", pa.string()),
    ]
)


def _fake_floats(payload: bytes, n: int, lo: float = 0.0, hi: float = 1.0) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.blake2b(payload or b"", digest_size=8).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, n)


class ImageDecode:
    """payload → (height, width, channels) + optional resize.

    Real backend would decode with PIL; batch sizes must stay small
    (large binary payloads — see DataContext.target_max_block_size note
    in the module docstring)."""

    def __init__(self, resize: tuple[int, int] | None = None, backend: str = "fake"):
        self.resize = resize
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "real":
            raise NotImplementedError(
                "image decode requires PIL/opencv (not in this environment)"
            )
        # fake dims are a pure function of the payload LENGTH so the
        # deterministic backend is oracle-checkable in SQL
        # (octet_length-based) while still proving the payload bytes flow
        # through the stage
        n = batch.num_rows
        if self.resize:
            hs = np.full(n, self.resize[0], np.int32)
            ws = np.full(n, self.resize[1], np.int32)
        else:
            import pyarrow.compute as pc

            lens = pc.binary_length(batch["payload"]).to_numpy().astype(np.int64)
            hs = (16 + (lens * 31) % 992).astype(np.int32)
            ws = (16 + (lens * 7919) % 992).astype(np.int32)
        out = batch.drop_columns(["payload"])
        out = out.append_column("height", pa.array(hs, pa.int32()))
        out = out.append_column("width", pa.array(ws, pa.int32()))
        return out.append_column(
            "channels", pa.array(np.full(n, 3, np.int32), pa.int32())
        )


class ImageEmbed:
    """payload → unit-norm feature vector (deterministic fake); the real
    backend would batch payloads through a vision model loaded once in
    ``__init__`` (the actor-pool contract)."""

    def __init__(self, dim: int = 64, backend: str = "fake"):
        self.dim = dim
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "real":
            raise NotImplementedError("vision model not available here")
        vecs = []
        for payload in batch["payload"].to_pylist():
            v = _fake_floats(payload, self.dim, -1, 1)
            v = v / (np.linalg.norm(v) or 1.0)
            vecs.append(v.astype(np.float32))
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "embedding", pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))
        )


class FrameSample:
    """video payload → N sampled frame descriptors (flat_map-shaped:
    one output row per sampled frame)."""

    def __init__(self, n_frames: int = 4, backend: str = "fake"):
        self.n_frames = n_frames
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "real":
            raise NotImplementedError("video decode not available here")
        mids, frames, ts = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            dur = float(_fake_floats(payload, 1, 1.0, 600.0)[0])
            for i in range(self.n_frames):
                mids.append(mid)
                frames.append(i)
                ts.append(round(dur * i / self.n_frames, 3))
        return pa.table(
            {"media_id": pa.array(mids, pa.int64()),
             "frame_idx": pa.array(frames, pa.int32()),
             "ts_s": pa.array(ts, pa.float64())}
        )


def make_fake_media_table(n: int = 32, kind: str = "image", seed: int = 5) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = [bytes(rng.integers(0, 256, int(rng.integers(64, 4096)), dtype=np.uint8)) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array([f"{kind}/fake"] * n),
            "meta_json": pa.array(["{}"] * n),
        }
    )
