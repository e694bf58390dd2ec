"""Multimodal binary-column plumbing: schema, decode, features,
resize, frame sampling. Codec is the deterministic FAKE stub; the
Spark-side schemas/batching/UDF signatures are the real thing under
test."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial4n_spark.operators import multimodal as mm

N_MEDIA = 64


@pytest.fixture(scope="module")
def media(spark):
    df = mm.generate_media(spark, n=N_MEDIA).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def decoded(media):
    df = mm.decode_media(media).cache()
    df.count()
    return df


def test_media_schema_and_determinism(spark, media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == N_MEDIA
    # content is a pure function of the ref: regenerate and compare
    again = mm.generate_media(spark, n=N_MEDIA)
    a = {r.media_ref: bytes(r.content) for r in media.collect()}
    b = {r.media_ref: bytes(r.content) for r in again.collect()}
    assert a == b
    # typed metadata is consistent with the modality
    for r in media.collect():
        if r.modality == "image":
            assert r.meta.width and r.meta.height and r.meta.channels == 3
        elif r.modality == "audio":
            assert r.meta.sample_rate == 16000
        else:
            assert r.meta.n_frames >= 4


def test_decode_matches_local_oracle(media, decoded):
    assert decoded.count() == N_MEDIA
    raw = {r.media_ref: bytes(r.content) for r in media.collect()}
    for r in decoded.collect():
        _, want, dims = mm._decode_samples(raw[r.media_ref])
        got = np.asarray(r.samples, dtype=np.float32)
        assert np.array_equal(got, want), r.media_ref
        if r.modality == "image":
            assert len(r.samples) == r.width * r.height * r.channels
        assert got.min() >= 0.0 and got.max() < 1.0


def test_decode_rejects_unknown_format(spark):
    if mm._HAVE_PIL:
        pytest.skip("PIL present: real decode path active")
    df = spark.createDataFrame(
        [("x://1", "image", bytearray(b"\x89PNG----"),
          {"format": "png", "width": 1, "height": 1, "channels": 3,
           "sample_rate": None, "n_frames": None})],
        mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        mm.decode_media(df).collect()


def test_features_jvm_side_match_numpy(decoded):
    feats = mm.media_features(decoded)
    # no python UDF in the plan: features run in codegen
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    vals = {r.media_ref: r for r in feats.collect()}
    for r in decoded.collect():
        a = np.asarray(r.samples, dtype=np.float64)
        f = vals[r.media_ref]
        assert f.n_samples == len(a)
        assert f.sample_mean == pytest.approx(a.mean(), abs=1e-6)
        assert f.sample_std == pytest.approx(a.std(), abs=1e-6)
        assert f.sample_min == pytest.approx(a.min(), abs=1e-7)
        assert f.sample_max == pytest.approx(a.max(), abs=1e-7)


def test_resize_shape_and_values(decoded):
    out = mm.resize_images(decoded, 4, 4)
    rows = out.collect()
    assert rows and all(len(r.samples) == 4 * 4 * 3 for r in rows)
    # oracle: nearest-neighbor on the decoded grid
    src = {r.media_ref: r for r in
           decoded.where(F.col("modality") == "image").collect()}
    for r in rows:
        s = src[r.media_ref]
        # samples are row-major (height, width, channels)
        a = np.asarray(s.samples, dtype=np.float32).reshape(
            s.height, s.width, s.channels)
        hi = (np.arange(4) * s.height // 4)
        wi = (np.arange(4) * s.width // 4)
        want = a[np.ix_(hi, wi)].ravel()
        assert np.array_equal(np.asarray(r.samples, dtype=np.float32), want)


def test_frame_sampling_slices(decoded):
    frames = mm.sample_frames(decoded, every_n=2)
    rows = frames.collect()
    assert rows
    src = {r.media_ref: r for r in
           decoded.where(F.col("modality") == "video").collect()}
    by_ref: dict[str, list] = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert set(by_ref) == set(src)
    for ref, fr in by_ref.items():
        s = src[ref]
        n_frames = s.channels  # video packs frames in the channel dim
        assert sorted(r.frame_idx for r in fr) == list(range(0, n_frames, 2))
        px = s.width * s.height
        full = np.asarray(s.samples, dtype=np.float32)
        for r in fr:
            want = full[r.frame_idx * px:(r.frame_idx + 1) * px]
            assert np.array_equal(
                np.asarray(r.frame_samples, dtype=np.float32), want)


# ---------------------------------------------------------------------------
# round 5: real-codec dispatch (import-try gated) — mock module injection
# ---------------------------------------------------------------------------

def test_sniff_container_magic_bytes():
    assert mm._sniff_container(b"\x89PNG\r\n\x1a\n----") == "image"
    assert mm._sniff_container(b"\xff\xd8\xff\xe0rest") == "image"
    assert mm._sniff_container(b"RIFF????WAVEfmt ") == "audio"
    assert mm._sniff_container(b"fLaC----") == "audio"
    assert mm._sniff_container(b"OggS----") == "audio"
    assert mm._sniff_container(b"????ftypisom") == "video"
    assert mm._sniff_container(b"\x1aE\xdf\xa3----") == "video"
    assert mm._sniff_container(b"garbage") == "unknown"


def test_real_decode_raises_per_family_when_libs_absent(monkeypatch):
    monkeypatch.setattr(mm, "_HAVE_PIL", False)
    monkeypatch.setattr(mm, "_HAVE_SOUNDFILE", False)
    monkeypatch.setattr(mm, "_HAVE_AV", False)
    with pytest.raises(NotImplementedError, match="PIL"):
        mm._decode_real(b"\x89PNG\r\n\x1a\n----")
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm._decode_real(b"RIFF????WAVEfmt ")
    with pytest.raises(NotImplementedError, match="av/ffmpeg"):
        mm._decode_real(b"????ftypisom")
    with pytest.raises(NotImplementedError, match="unrecognized"):
        mm._decode_real(b"not-a-container")


def test_real_audio_decode_dispatches_to_mock_soundfile(monkeypatch):
    """Inject a fake soundfile module: the dispatch must route WAV
    payloads to it and normalize [-1,1] stereo to mono [0,1)."""
    class FakeSF:
        @staticmethod
        def read(fh, dtype="float32"):
            data = np.array([[-1.0, 1.0], [0.0, 0.5]], dtype=np.float32)
            return data, 16000
    monkeypatch.setattr(mm, "_HAVE_SOUNDFILE", True)
    monkeypatch.setattr(mm, "_soundfile", FakeSF, raising=False)
    code, samples, dims = mm._decode_real(b"RIFF????WAVEfmt payload")
    assert code == 1 and dims == (16000, 2, 1)
    assert samples == pytest.approx([0.5, 0.625])
    assert samples.max() < 1.0  # [0,1) contract like the FAKE codec


def test_real_image_decode_dispatches_to_mock_pil(monkeypatch):
    class FakeImg:
        width, height = 2, 1

        def getbands(self):
            return ("R", "G", "B")

        def __array__(self, dtype=None, copy=None):
            return np.arange(6, dtype=np.float32).reshape(1, 2, 3)
    class FakePIL:
        @staticmethod
        def open(fh):
            return FakeImg()
    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    monkeypatch.setattr(mm, "_PIL_Image", FakePIL, raising=False)
    code, samples, dims = mm._decode_real(b"\xff\xd8\xff\xe0jpegbody")
    assert code == 0 and dims == (2, 1, 3)
    assert samples == pytest.approx(np.arange(6) / 255.0)


def test_fake_codec_never_routes_to_real_path(monkeypatch):
    """FAKE-header payloads must decode identically with or without
    real codec libs present (flag flip cannot change results)."""
    _, payload, _ = mm._fake_payload("media://item/42")
    base = mm._decode_samples(payload)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    monkeypatch.setattr(mm, "_HAVE_SOUNDFILE", True)
    monkeypatch.setattr(mm, "_HAVE_AV", True)
    again = mm._decode_samples(payload)
    assert base[0] == again[0] and base[2] == again[2]
    assert np.array_equal(base[1], again[1])
