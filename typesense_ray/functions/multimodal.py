"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Two backends per stage:

* ``backend="fake"`` (default) — deterministic payload-derived output,
  oracle-checkable in SQL (octet_length-based), proving the bytes flow
  through the stage. This is the benchmark/driver path.
* ``backend="real"`` — genuine decode of real formats that need no
  external codec library: BMP (24/32-bit uncompressed) and PPM (P6)
  images via pure numpy, WAV (PCM 8/16-bit) audio via the stdlib
  ``wave`` module with numpy-FFT spectral features, and PPM-stream
  video (concatenated P6 frames) for frame sampling. Bilinear resize
  and average-pool grayscale embeddings are real numpy kernels.
  Compression codecs (JPEG/PNG/MP3/H.264) are NOT implementable
  without PIL/ffmpeg and raise ``ValueError`` naming the supported
  formats — the honest boundary of a no-external-deps environment.

Everything around the kernels — schema contract, small batch sizes for
large payloads, actor lifecycle (decoders constructed once per actor in
``__init__``), output layout, payload dropped after decode — is shared
by both backends.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct

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


# ---------------------------------------------------------------------------
# Real kernels (pure numpy / stdlib — no codec libraries)
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a BMP (24/32-bit uncompressed, BITMAPINFOHEADER) or PPM
    (P6, maxval ≤255) payload to an (h, w, 3) uint8 array."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        img, _ = _decode_ppm(payload, 0)
        return img
    raise ValueError(
        "unsupported image format (magic %r): the real backend decodes "
        "uncompressed BMP and P6 PPM only; JPEG/PNG need PIL" % payload[:4]
    )


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off, = struct.unpack_from("<I", payload, 10)
    hdr_size, = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP header size %d" % hdr_size)
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression, = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            "only uncompressed 24/32-bit BMP supported "
            f"(bpp={bpp}, compression={compression})"
        )
    flipped = h > 0  # positive height = bottom-up row order
    h = abs(h)
    if w <= 0 or h == 0 or planes != 1:
        raise ValueError(f"malformed BMP dims (w={w}, h={h}, planes={planes})")
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4  # rows pad to 4-byte boundaries
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, np.uint8, stride * h, data_off)
    px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    rgb = px[..., 2::-1]  # BGR(A) → RGB
    if flipped:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _decode_ppm(payload: bytes, off: int) -> tuple[np.ndarray, int]:
    """Decode one P6 frame starting at ``off``; returns (img, next_off)
    so a concatenated PPM stream can be walked frame by frame."""

    def _token(o: int) -> tuple[bytes, int]:
        while o < len(payload):
            if payload[o : o + 1].isspace():
                o += 1
            elif payload[o : o + 1] == b"#":  # comment to end of line
                while o < len(payload) and payload[o : o + 1] != b"\n":
                    o += 1
            else:
                break
        s = o
        while o < len(payload) and not payload[o : o + 1].isspace():
            o += 1
        return payload[s:o], o

    magic, off = _token(off)
    if magic != b"P6":
        raise ValueError("not a P6 PPM frame at offset")
    wtok, off = _token(off)
    htok, off = _token(off)
    mtok, off = _token(off)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    off += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    if len(payload) < off + need:
        raise ValueError("truncated PPM pixel data")
    img = np.frombuffer(payload, np.uint8, need, off).reshape(h, w, 3)
    return img, off + need


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real bilinear resize (align-corners=False convention) over an
    (h, w, c) uint8 array — fully vectorized."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_embed_real(img: np.ndarray, dim: int) -> np.ndarray:
    """Real content-derived feature vector: grayscale → average-pool to
    a √dim × √dim grid → zero-mean, unit-norm. A classic perceptual
    fingerprint (the aHash/pHash precursor) — two images with the same
    byte LENGTH but different pixels embed differently, unlike the fake
    backend."""
    g = int(np.sqrt(dim))
    if g * g != dim:
        raise ValueError(f"dim must be a perfect square, got {dim}")
    gray = img.astype(np.float32).mean(axis=2)
    pooled = resize_bilinear(
        np.rint(gray).astype(np.uint8)[..., None], g, g
    )[..., 0].astype(np.float64)
    v = pooled.ravel() - pooled.mean()
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload → (mono float64 samples in [-1, 1],
    sample_rate). Canonical 44-byte-header PCM files (the layout most
    encoders emit) parse on a zero-copy numpy fast path; anything else
    (extra LIST/fact chunks, unusual chunk order) falls back to the
    stdlib ``wave`` module. Both paths return identical samples — the
    data chunk bytes are the same either way."""
    import wave

    if (
        len(payload) >= 44
        and payload[:4] == b"RIFF"
        and payload[8:16] == b"WAVEfmt "
        and payload[36:40] == b"data"
    ):
        fmt_size, audio_fmt, nch, rate, _br, _ba, bits = struct.unpack_from(
            "<IHHIIHH", payload, 16
        )
        if fmt_size == 16 and audio_fmt == 1 and bits in (8, 16) and nch >= 1:
            nbytes, = struct.unpack_from("<I", payload, 40)
            nbytes = min(nbytes, len(payload) - 44)
            if bits == 16:
                x = (
                    np.frombuffer(payload, "<i2", nbytes // 2, 44)
                    .astype(np.float64) / 32768.0
                )
            else:
                x = (
                    np.frombuffer(payload, np.uint8, nbytes, 44)
                    .astype(np.float64) - 128.0
                ) / 128.0
            if nch > 1:
                x = x[: (x.size // nch) * nch].reshape(-1, nch).mean(axis=1)
            return x, rate

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        # uniform per-record error type across the decode stages (BMP/PPM
        # raise ValueError); MP3/OGG payloads land here with a clear name
        raise ValueError(f"not a PCM WAV payload: {e}") from e
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"only 8/16-bit PCM WAV supported (width={width})")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


# ---------------------------------------------------------------------------
# Actor-pool stages
# ---------------------------------------------------------------------------


class ImageDecode:
    """payload → (height, width, channels) + optional resize.

    ``backend="real"`` decodes BMP/P6 bytes (numpy); batch sizes must
    stay small (large binary payloads — see DataContext block-size note
    in the module docstring)."""

    def __init__(self, resize: tuple[int, int] | None = None, backend: str = "fake"):
        self.resize = resize
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.backend == "real":
            hs = np.empty(n, np.int32)
            ws = np.empty(n, np.int32)
            for i, payload in enumerate(batch["payload"].to_pylist()):
                img = decode_image(payload)
                if self.resize:
                    img = resize_bilinear(img, *self.resize)
                hs[i], ws[i] = img.shape[0], img.shape[1]
        elif self.resize:
            hs = np.full(n, self.resize[0], np.int32)
            ws = np.full(n, self.resize[1], np.int32)
        else:
            # fake dims are a pure function of the payload LENGTH so the
            # deterministic backend is oracle-checkable in SQL
            # (octet_length-based) while still proving the payload bytes
            # flow through the stage
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
    """payload → unit-norm feature vector. ``backend="real"`` is a true
    content embedding (grayscale average-pool grid, the aHash family);
    a model-based embedding would load the model once in ``__init__``
    (the actor-pool contract) exactly where the decoder sits now."""

    def __init__(self, dim: int = 64, backend: str = "fake"):
        self.dim = dim
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for payload in batch["payload"].to_pylist():
            if self.backend == "real":
                v = image_embed_real(decode_image(payload), self.dim)
            else:
                v = _fake_floats(payload, self.dim, -1, 1)
                v = (v / (np.linalg.norm(v) or 1.0)).astype(np.float32)
            vecs.append(v)
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "embedding", pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))
        )


class FrameSample:
    """video payload → N sampled frame descriptors (flat_map-shaped:
    one output row per sampled frame). ``backend="real"`` walks a PPM
    stream (concatenated P6 frames — the no-codec real container) and
    emits evenly-spaced frames with timestamps from ``meta_json``'s
    ``fps`` (default 25)."""

    def __init__(self, n_frames: int = 4, backend: str = "fake"):
        self.n_frames = n_frames
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, frames, ts = [], [], []
        metas = (
            batch["meta_json"].to_pylist()
            if "meta_json" in batch.column_names
            else [None] * batch.num_rows
        )
        for mid, payload, meta in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(), metas
        ):
            if self.backend == "real":
                fps = float(json.loads(meta).get("fps", 25.0)) if meta else 25.0
                total = 0
                off = 0
                while off < len(payload):
                    _, off = _decode_ppm(payload, off)
                    total += 1
                take = min(self.n_frames, total)
                # evenly spaced over the real frame count
                idxs = np.unique(
                    (np.arange(take) * total // max(take, 1)).astype(np.int64)
                )
                for i in idxs:
                    mids.append(mid)
                    frames.append(int(i))
                    ts.append(round(i / fps, 3))
            else:
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


class AudioFeatures:
    """audio payload → (sample_rate, n_samples, duration_s, rms,
    spectral_centroid_hz, dominant_hz). ``backend="real"`` decodes PCM
    WAV with the stdlib ``wave`` module and computes genuine spectral
    features with ``np.fft.rfft`` — a 440 Hz sine really lands its
    dominant bin at 440 Hz."""

    def __init__(self, backend: str = "fake"):
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sr = np.empty(n, np.int32)
        ns = np.empty(n, np.int64)
        dur = np.empty(n, np.float64)
        rms = np.empty(n, np.float64)
        cent = np.empty(n, np.float64)
        dom = np.empty(n, np.float64)
        if self.backend == "real":
            # decode per row (stdlib wave), but run the numeric kernels
            # BATCHED: rows sharing (n_samples, rate) — the common case
            # for any uniform corpus — go through ONE matrix rfft instead
            # of one FFT call per row (pocketfft applies the same 1-D
            # transform per row, so results are unchanged; measured ~3×
            # on the sf1 audio_features op where per-row FFT-call
            # overhead dominated).
            xs: list[np.ndarray] = []
            for i, payload in enumerate(batch["payload"].to_pylist()):
                x, rate = decode_wav(payload)
                xs.append(x)
                sr[i] = rate
                ns[i] = x.size
                dur[i] = x.size / rate if rate else 0.0
            groups: dict[tuple[int, int], list[int]] = {}
            for i, x in enumerate(xs):
                groups.setdefault((x.size, int(sr[i])), []).append(i)
            for (size, rate), idxs in groups.items():
                ix = np.asarray(idxs, np.int64)
                if size == 0:
                    rms[ix] = cent[ix] = dom[ix] = 0.0
                    continue
                X = np.stack([xs[i] for i in idxs])
                rms[ix] = np.sqrt(np.mean(X * X, axis=1))
                if size >= 8:
                    spec = np.abs(np.fft.rfft(X, axis=1))
                    freqs = np.fft.rfftfreq(size, 1.0 / rate)
                    power = spec.sum(axis=1)
                    safe = np.where(power == 0.0, 1.0, power)
                    cent[ix] = np.where(
                        power == 0.0, 0.0, (spec @ freqs) / safe
                    )
                    dom[ix] = freqs[np.argmax(spec[:, 1:], axis=1) + 1]
                else:
                    cent[ix] = dom[ix] = 0.0
        else:
            for i, payload in enumerate(batch["payload"].to_pylist()):
                f = _fake_floats(payload, 4, 0.0, 1.0)
                sr[i] = 16000
                ns[i] = len(payload or b"")
                dur[i] = ns[i] / 16000.0
                rms[i], cent[i], dom[i] = f[0], f[1] * 8000, f[2] * 8000
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate", pa.array(sr, pa.int32()))
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("duration_s", pa.array(dur, pa.float64()))
        out = out.append_column("rms", pa.array(rms, pa.float64()))
        out = out.append_column(
            "spectral_centroid_hz", pa.array(cent, pa.float64())
        )
        return out.append_column("dominant_hz", pa.array(dom, pa.float64()))


class SynthToneWav:
    """doc_id → deterministic PCM WAV payload: a pure sine at
    ``base_hz + step_hz * (doc_id % n_tones)`` Hz, chosen to land
    EXACTLY on an FFT bin (``step_hz`` = sr / n_samples spacing), so
    the real :class:`AudioFeatures` pipeline over these payloads has a
    closed-form expected output (dominant_hz = the synthesized
    frequency, bit-exact — ``np.fft.rfftfreq`` bins at this sr/N are
    exact float64 integers). The benchmark/oracle source for the real
    audio path; synthesis is per-row only at the stdlib ``wave``
    writer (the sine itself is vectorized)."""

    def __init__(self, sr: int = 8000, n_samples: int = 4000,
                 amp: float = 0.5, base_hz: float = 100.0,
                 n_tones: int = 100, id_col: str = "doc_id"):
        self.sr = sr
        self.n = n_samples
        self.amp = amp
        self.base = base_hz
        self.n_tones = n_tones
        self.id_col = id_col
        self.step = sr / n_samples  # one FFT-bin spacing
        self.t = np.arange(n_samples) / sr

    def freq_of(self, doc_id: int) -> float:
        return self.base + self.step * (doc_id % self.n_tones)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        freqs = self.base + self.step * (ids.astype(np.int64) % self.n_tones)
        # one matrix sin() for the whole batch, one int16 quantization
        # pass; per-row work is just the 44-byte RIFF header + tobytes
        pcm = np.clip(
            np.rint(
                self.amp * np.sin(2 * np.pi * freqs[:, None] * self.t[None, :])
                * 32767
            ),
            -32768, 32767,
        ).astype("<i2")
        nb = self.n * 2
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + nb) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, self.sr, self.sr * 2, 2, 16)
            + b"data" + struct.pack("<I", nb)
        )  # canonical 44-byte PCM WAV header; stdlib wave reads it back
        payloads = [hdr + pcm[i].tobytes() for i in range(len(ids))]
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "kind": pa.array(["audio"] * len(ids)),
                "payload": pa.array(payloads, pa.large_binary()),
                "mime": pa.array(["audio/wav"] * len(ids)),
                "meta_json": pa.array(["{}"] * len(ids)),
            }
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


# --- real-format synthesizers (tests + demos; deterministic) ---------------


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (bottom-up rows)."""
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    pixels = np.zeros((h, stride), np.uint8)
    pixels[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # BGR bottom-up
    body = pixels.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """16-bit PCM mono WAV from float samples in [-1, 1] (stdlib wave)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            np.clip(np.rint(samples * 32767), -32768, 32767)
            .astype(np.int16)
            .tobytes()
        )
    return buf.getvalue()
