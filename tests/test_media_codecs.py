"""Dependency-free media codecs (operators/media_codecs.py): round
trips, filtered-PNG decoding, resize, feature shapes — all pure
numpy/stdlib, no Spark session needed."""

import struct
import zlib

import numpy as np
import pytest

from knowledge_harvest_from_lms_spark.operators import media_codecs as mc


def test_wav_round_trip():
    rng = np.random.default_rng(1)
    s = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    dec, rate = mc.decode_wav(mc.encode_wav(s, 16000))
    assert rate == 16000 and len(dec) == len(s)
    assert np.abs(dec - np.clip(s, -1, 1)).max() < 1e-3


def test_wav_stereo_averages_to_mono():
    import io
    import wave

    pcm = np.array([[1000, 3000], [-2000, 2000]], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    dec, rate = mc.decode_wav(buf.getvalue())
    assert rate == 8000
    np.testing.assert_allclose(dec, [2000 / 32767.0, 0.0], atol=1e-6)


def test_ppm_round_trip_and_comments():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(13, 17, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)
    # header comments are legal PPM
    withc = b"P6\n# a comment\n17 13\n255\n" + img.tobytes()
    assert np.array_equal(mc.decode_ppm(withc), img)


@pytest.mark.parametrize("shape", [(9, 7), (9, 7, 3), (5, 6, 4)])
def test_png_round_trip(shape):
    rng = np.random.default_rng(3)
    im = rng.integers(0, 255, size=shape, dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(im))
    want = im[:, :, None] if im.ndim == 2 else im
    assert np.array_equal(out, want)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_row_filters(ftype):
    """Decode PNGs whose rows use Sub/Up/Average/Paeth filters —
    encoders in the wild emit all of them."""
    rng = np.random.default_rng(40 + ftype)
    h, w, bpp = 6, 5, 3
    im = rng.integers(0, 255, size=(h, w, bpp), dtype=np.uint8).astype(np.int32)
    raw = b""
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        row = im[y].reshape(-1)
        filt = np.zeros_like(row)
        for x in range(len(row)):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (row[x] - pred) % 256
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
        prev = row

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        mc._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(png), im.astype(np.uint8))


def test_resize_nearest():
    img = np.arange(36, dtype=np.uint8).reshape(6, 6)
    r = mc.resize_nearest(img, 3, 3)
    assert r.shape == (3, 3)
    assert np.array_equal(r, img[[0, 2, 4]][:, [0, 2, 4]])


def test_feature_shapes_and_semantics():
    img = np.full((8, 16, 3), 128, dtype=np.uint8)
    f = mc.image_features(img)
    assert len(f) == 32
    assert abs(f[0] - 128 / 255) < 1e-6  # channel mean
    assert f[6] == 2.0  # aspect w/h

    rate = 8000
    t = np.arange(400, dtype=np.float32) / rate
    s = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    a = mc.audio_features(s, rate)
    assert len(a) == 32
    assert abs(a[0] - 0.05) < 1e-9            # duration
    assert abs(a[1] - 0.5 / np.sqrt(2)) < 0.01  # rms of a sine
    assert abs(a[3] - 440.0) < 30.0           # spectral centroid near f0


# ---------------------------------------------------------------------------
# video (optional `av` extra, r4)
# ---------------------------------------------------------------------------

def test_sample_frame_indices():
    assert mc.sample_frame_indices(0) == []
    assert mc.sample_frame_indices(3, 8) == [0, 1, 2]
    idx = mc.sample_frame_indices(100, 8)
    assert len(idx) == 8 and idx == sorted(set(idx))
    assert idx[0] == 0 and idx[-1] < 100


class _FakeFrame:
    def __init__(self, arr):
        self._arr = arr

    def to_ndarray(self, format):
        assert format == "rgb24"
        return self._arr


class _FakeContainer:
    def __init__(self, content: bytes):
        import types

        n = 3 + (content[0] if content else 0) % 4
        self._frames = [
            _FakeFrame(
                np.full((4, 6, 3), (i * 40) % 256, dtype=np.uint8)
            )
            for i in range(n)
        ]
        self.streams = types.SimpleNamespace(video=[object()])

    def decode(self, stream):
        return iter(self._frames)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _install_fake_av(monkeypatch):
    import sys
    import types

    fake = types.ModuleType("av")

    def _open(bio):
        return _FakeContainer(bio.read())

    fake.open = _open
    monkeypatch.setitem(sys.modules, "av", fake)


def test_video_decode_plumbing_with_fake_av(monkeypatch):
    """Executes the whole av code path (container open → frame decode
    → deterministic sampling → feature extraction → 'av-v1' tag)
    through an injected in-memory `av` module, so the plumbing is CI-
    tested even though the real native lib isn't installed here."""
    _install_fake_av(monkeypatch)
    from knowledge_harvest_from_lms_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_real,
    )

    payload = bytes([7]) + b"fakevideo"
    frames = mc.decode_video_av(payload)
    assert frames.shape == (3 + 7 % 4, 4, 6, 3)
    fv = mc.video_features(frames, FEATURE_DIM)
    assert len(fv) == FEATURE_DIM
    assert fv[-1] == float(len(frames))  # temporal-extent slot
    fv2, tag = decode_real(payload, "video")
    assert tag == "av-v1"
    np.testing.assert_allclose(fv2, np.asarray(fv, dtype=np.float32), rtol=1e-6)
    # deterministic
    assert decode_real(payload, "video")[0] == fv2


def test_video_gate_without_av():
    """Where `av` is genuinely absent the operator keeps the honest
    NotImplementedError gate (→ video_stub_ok / corrupt_ok paths)."""
    try:
        import av  # noqa: F401

        pytest.skip("real av installed; gate not reachable")
    except ImportError:
        pass
    from knowledge_harvest_from_lms_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError, match="av"):
        decode_real(b"\x00\x00\x00 ftypmp42", "video")


def test_video_integration_real_av(tmp_path):
    """Runs only where the optional `av` extra exists: encode a tiny
    real mp4, then decode through the SAME path the operator uses."""
    av = pytest.importorskip("av")
    p = str(tmp_path / "t.mp4")
    with av.open(p, "w") as container:
        stream = container.add_stream("mpeg4", rate=8)
        stream.width, stream.height, stream.pix_fmt = 32, 16, "yuv420p"
        for i in range(12):
            img = np.full((16, 32, 3), (i * 20) % 256, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    content = open(p, "rb").read()
    frames = mc.decode_video_av(content)
    assert frames.ndim == 4 and frames.shape[3] == 3
    from knowledge_harvest_from_lms_spark.operators.multimodal import decode_real

    fv, tag = decode_real(content, "video")
    assert tag == "av-v1" and len(fv) == 32


def test_wav_roundtrip_idempotent():
    """encode∘decode is byte-identity for 16-bit PCM at the symmetric
    ±32767 scale (q97's audio contract) — exhaustively over every
    representable sample value. −32768 is the one unrepresentable
    input (16-bit PCM's asymmetric extreme clips to −32767), excluded
    by construction in anything our encoder produced."""
    import io
    import wave

    pcm = np.arange(-32767, 32768, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    raw = buf.getvalue()
    x, r = mc.decode_wav(raw)
    assert mc.encode_wav(x, r) == raw
    # and the documented lossy extreme
    assert np.rint(np.clip(-32768 / 32767.0, -1, 1) * 32767.0) == -32767
