"""Real-kernel tests for the multimodal stages (``backend="real"``):
genuine BMP/PPM image decode, bilinear resize, content embeddings,
PPM-stream frame sampling, and WAV audio decode with numpy-FFT
spectral features — all pure numpy / stdlib, closing the round-4
"multimodal kernels stubbed" gap for every format that needs no
external codec. Compression codecs (JPEG/PNG/MP3) remain gated with a
clear error, asserted here too.

Stages run through the same Ray actor-pool ``map_batches`` plumbing the
fake backend uses (`test_roundtrip_through_ray` drives a real-BMP batch
through an actor pool end-to-end).
"""

import json

import numpy as np
import pyarrow as pa
import pytest

from typesense_ray.functions.multimodal import (
    AudioFeatures,
    FrameSample,
    ImageDecode,
    ImageEmbed,
    decode_image,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_embed_real,
    resize_bilinear,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# --- decoders --------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (7, 13)])
def test_bmp_roundtrip(h, w):
    img = _img(h, w, seed=h * 100 + w)
    out = decode_image(encode_bmp(img))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, img)  # stride padding + BGR flip undone


@pytest.mark.parametrize("h,w", [(1, 1), (4, 6), (11, 3)])
def test_ppm_roundtrip(h, w):
    img = _img(h, w, seed=h * 7 + w)
    out = decode_image(encode_ppm(img))
    assert np.array_equal(out, img)


def test_ppm_with_comment():
    img = _img(2, 2)
    raw = encode_ppm(img).replace(b"P6\n", b"P6\n# a comment line\n", 1)
    assert np.array_equal(decode_image(raw), img)


def test_unsupported_magic_is_clear_error():
    with pytest.raises(ValueError, match="BMP and P6"):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_truncated_bmp_rejected():
    img = _img(8, 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_image(encode_bmp(img)[:-10])


# --- resize ----------------------------------------------------------------


def test_resize_identity():
    img = _img(9, 9, seed=3)
    assert np.array_equal(resize_bilinear(img, 9, 9), img)


def test_resize_constant_image_stays_constant():
    img = np.full((5, 7, 3), 77, np.uint8)
    out = resize_bilinear(img, 13, 3)
    assert out.shape == (13, 3, 3)
    assert (out == 77).all()


def test_resize_2x_gradient():
    # doubling a horizontal two-pixel gradient interpolates midpoints
    img = np.zeros((1, 2, 1), np.uint8)
    img[0, 1, 0] = 100
    out = resize_bilinear(img, 1, 4)[0, :, 0]
    assert out[0] <= out[1] <= out[2] <= out[3]
    assert out[0] == 0 and out[3] == 100


# --- embeddings ------------------------------------------------------------


def test_embed_real_is_content_sensitive():
    # same byte LENGTH, different pixels → different embeddings (the
    # fake backend cannot distinguish these by construction)
    a = image_embed_real(_img(16, 16, seed=1), 64)
    b = image_embed_real(_img(16, 16, seed=2), 64)
    assert a.shape == (64,) and b.shape == (64,)
    assert np.isclose(np.linalg.norm(a), 1.0, atol=1e-5)
    assert not np.allclose(a, b)
    # deterministic
    assert np.array_equal(a, image_embed_real(_img(16, 16, seed=1), 64))


def test_embed_real_similar_images_closer_than_dissimilar():
    base = _img(32, 32, seed=9)
    noisy = np.clip(
        base.astype(np.int16)
        + np.random.default_rng(1).integers(-8, 9, base.shape),
        0, 255,
    ).astype(np.uint8)
    other = 255 - base  # inverted = maximally different structure
    e0 = image_embed_real(base, 64)
    e1 = image_embed_real(noisy, 64)
    e2 = image_embed_real(other, 64)
    assert float(e0 @ e1) > float(e0 @ e2)


def test_embed_dim_must_be_square():
    with pytest.raises(ValueError, match="perfect square"):
        image_embed_real(_img(4, 4), 50)


# --- audio -----------------------------------------------------------------


def test_wav_decode_and_spectral_features():
    sr = 16000
    t = np.arange(sr) / sr  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    x, rate = decode_wav(encode_wav(sine, sr))
    assert rate == sr and x.size == sr
    assert np.isclose(np.abs(x).max(), 0.5, atol=0.01)

    batch = pa.table(
        {"media_id": pa.array([1], pa.int64()),
         "payload": pa.array([encode_wav(sine, sr)], pa.large_binary())}
    )
    out = AudioFeatures(backend="real")(batch)
    row = out.to_pylist()[0]
    assert row["sample_rate"] == sr
    assert abs(row["duration_s"] - 1.0) < 1e-9
    assert abs(row["rms"] - 0.5 / np.sqrt(2)) < 0.01  # sine RMS = A/√2
    assert abs(row["dominant_hz"] - 440.0) < 1.0  # FFT really finds 440 Hz
    assert row["spectral_centroid_hz"] > 0


def test_wav_stereo_downmix():
    sr = 8000
    left = np.ones(100) * 0.25
    # interleave stereo manually through the encoder's mono path twice
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        inter = np.empty(200)
        inter[0::2] = 0.5  # L
        inter[1::2] = -0.5  # R
        w.writeframes(
            np.clip(np.rint(inter * 32767), -32768, 32767)
            .astype(np.int16).tobytes()
        )
    x, rate = decode_wav(buf.getvalue())
    assert rate == sr and x.size == 100
    assert np.abs(x).max() < 0.01  # L/R cancel in the mono downmix
    del left


# --- frame sampling --------------------------------------------------------


def test_frame_sample_real_ppm_stream():
    frames = [_img(4, 4, seed=i) for i in range(10)]
    stream = b"".join(encode_ppm(f) for f in frames)
    batch = pa.table(
        {"media_id": pa.array([7], pa.int64()),
         "payload": pa.array([stream], pa.large_binary()),
         "meta_json": pa.array([json.dumps({"fps": 5.0})])}
    )
    out = FrameSample(n_frames=4, backend="real")(batch).to_pylist()
    assert [r["frame_idx"] for r in out] == [0, 2, 5, 7]
    assert out[2]["ts_s"] == pytest.approx(5 / 5.0)  # frame 5 at 5 fps
    assert all(r["media_id"] == 7 for r in out)


def test_frame_sample_real_fewer_frames_than_requested():
    stream = encode_ppm(_img(2, 2)) + encode_ppm(_img(2, 2, seed=1))
    batch = pa.table(
        {"media_id": pa.array([1], pa.int64()),
         "payload": pa.array([stream], pa.large_binary()),
         "meta_json": pa.array(["{}"])}
    )
    out = FrameSample(n_frames=8, backend="real")(batch).to_pylist()
    assert [r["frame_idx"] for r in out] == [0, 1]


# --- through the Ray plumbing ----------------------------------------------


def test_roundtrip_through_ray(ray_session):
    import ray.data as rd

    imgs = [_img(8 + i, 6 + i, seed=i) for i in range(12)]
    tbl = pa.table(
        {"media_id": pa.array(range(12), pa.int64()),
         "kind": pa.array(["image"] * 12),
         "payload": pa.array([encode_bmp(im) for im in imgs],
                             pa.large_binary()),
         "mime": pa.array(["image/bmp"] * 12),
         "meta_json": pa.array(["{}"] * 12)}
    )
    ds = rd.from_arrow(tbl).map_batches(
        ImageDecode(backend="real"),
        batch_format="pyarrow", batch_size=4, concurrency=2,
    )
    rows = {r["media_id"]: r for r in ds.take_all()}
    for i, im in enumerate(imgs):
        assert rows[i]["height"] == im.shape[0]
        assert rows[i]["width"] == im.shape[1]
        assert rows[i]["channels"] == 3

    emb = rd.from_arrow(tbl).map_batches(
        ImageEmbed(dim=16, backend="real"),
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).take_all()
    for r in emb:
        v = np.asarray(r["embedding"])
        assert v.shape == (16,)
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-4)


def test_malformed_bmp_dims_rejected():
    import struct

    from typesense_ray.functions.multimodal import encode_bmp

    raw = bytearray(encode_bmp(_img(4, 4)))
    struct.pack_into("<i", raw, 18, -4)  # negative width
    with pytest.raises(ValueError, match="malformed BMP dims"):
        decode_image(bytes(raw))


def test_non_wav_payload_is_value_error():
    with pytest.raises(ValueError, match="not a PCM WAV"):
        decode_wav(b"ID3\x04\x00\x00\x00\x00\x00\x00not-actually-audio")


def test_wav_fast_path_equals_wave_module():
    # a WAV with an extra chunk between fmt and data takes the stdlib
    # fallback; the canonical layout takes the numpy fast path — both
    # must produce identical samples
    sr = 8000
    sine = 0.25 * np.sin(2 * np.pi * 100 * np.arange(800) / sr)
    canonical = encode_wav(sine, sr)
    x_fast, r_fast = decode_wav(canonical)
    # splice a LIST chunk in front of the data chunk
    hdr, data = canonical[:36], canonical[36:]
    extra = b"LIST" + (8).to_bytes(4, "little") + b"INFOgap!"
    import struct

    riff_size = struct.unpack_from("<I", canonical, 4)[0] + len(extra)
    noncanon = (b"RIFF" + struct.pack("<I", riff_size) + canonical[8:36]
                + extra + data)
    x_slow, r_slow = decode_wav(noncanon)
    assert r_fast == r_slow == sr
    assert np.array_equal(x_fast, x_slow)


def test_image_near_dup_composition(ray_session):
    """Composed multimodal × dedup pipeline, all real kernels: BMP
    payloads → real decode + pooled-grid embeddings (actor pool) →
    hyperplane-LSH cosine near-dup. Noisy copies of the same image are
    found as near-duplicate pairs; structurally different images are
    not. This is the 100 TB image-dedup shape end-to-end on real bytes."""
    import ray.data as rd

    from typesense_ray.functions.dedup import embedding_dup_pairs

    rng = np.random.default_rng(33)
    n_base = 10
    bases = [_img(24, 24, seed=100 + i) for i in range(n_base)]
    rows, truth = [], set()
    for i, im in enumerate(bases):
        rows.append((i, im))
        if i < 4:  # four images get a lightly-noised near-duplicate
            noisy = np.clip(
                im.astype(np.int16) + rng.integers(-4, 5, im.shape), 0, 255
            ).astype(np.uint8)
            rows.append((100 + i, noisy))
            truth.add((i, 100 + i))
    tbl = pa.table(
        {"media_id": pa.array([r[0] for r in rows], pa.int64()),
         "kind": pa.array(["image"] * len(rows)),
         "payload": pa.array([encode_bmp(r[1]) for r in rows],
                             pa.large_binary()),
         "mime": pa.array(["image/bmp"] * len(rows)),
         "meta_json": pa.array(["{}"] * len(rows))}
    )
    emb = rd.from_arrow(tbl).map_batches(
        ImageEmbed(dim=64, backend="real"),
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).select_columns(["media_id", "embedding"])
    pairs = embedding_dup_pairs(
        emb, vec_col="embedding", id_col="media_id", threshold=0.9,
        n_planes=8, seeds=[7, 11],
    )
    prows = pairs.take_all()
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in prows}
    assert truth <= got, f"missed near-dup pairs: {truth - got}"
    # no pair between two DIFFERENT base images
    for a, b in got:
        assert (a % 100) == (b % 100), f"false pair {(a, b)}"


# --- property tests over the real codecs ------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


@given(st.integers(1, 2000), st.sampled_from([8000, 16000, 44100]),
       st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, sr, seed):
    x = np.random.default_rng(seed).uniform(-1, 1, n)
    got, rate = decode_wav(encode_wav(x, sr))
    assert rate == sr and got.size == n
    # exact roundtrip identity: encode quantizes rint(x*32767) (clipped
    # to int16), decode divides by 32768
    expect = np.clip(np.rint(x * 32767), -32768, 32767) / 32768.0
    assert np.array_equal(got, expect)
