"""Multimodal binary-column plumbing: schema, metadata scan, Arrow decode
stub (deterministic fake path + explicit NotImplementedError gate)."""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from search_engine_spark.training_data import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark media bytes"), (3, "x" * 5000)],
        "doc_id long, text string",
    )
    return multimodal.synthesize_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "mime",
        "payload",
        "meta",
    ]
    rows = {r["media_id"]: r for r in media.collect()}
    assert bytes(rows[1]["payload"]) == b"hello world"
    assert rows[1]["meta"]["n_bytes"] == 11
    assert rows[1]["meta"]["sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_binary_metadata(media):
    rows = {r["media_id"]: r for r in multimodal.binary_metadata(media).collect()}
    assert rows[2]["n_bytes"] == len(b"spark media bytes")
    assert rows[2]["magic_hex"] == b"spar".hex()
    assert rows[2]["sha256"] == hashlib.sha256(b"spark media bytes").hexdigest()


def test_decode_features_fake_deterministic(media):
    a = {r["media_id"]: r for r in multimodal.decode_features(media, fake=True).collect()}
    b = {r["media_id"]: r for r in multimodal.decode_features(media, fake=True).collect()}
    assert set(a) == {1, 2, 3}
    for mid in a:
        assert a[mid]["width"] == b[mid]["width"]
        assert a[mid]["feature"] == b[mid]["feature"]
        assert len(a[mid]["feature"]) == 16
        assert abs(sum(a[mid]["feature"]) - 1.0) < 1e-6
    # pseudo-decode matches the documented formula
    assert a[1]["width"] == (11 % 640) + 1
    assert a[1]["height"] == ((11 // 7) % 480) + 1


def test_decode_features_stub_raises(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.decode_features(media, fake=False).collect()


def test_repartition_by_bytes(media):
    out = multimodal.repartition_by_bytes(media, target_batch_bytes=2000)
    # ~5k total bytes / 2k budget -> 3 partitions
    assert out.rdd.getNumPartitions() == 3
    assert out.count() == 3


# ---------------------------------------------------------------------------
# Real stdlib decoders: WAV (wave module) and binary PPM
# ---------------------------------------------------------------------------
def test_decode_wav_real(spark):
    rows = [
        (i, "audio/wav", multimodal.synthesize_wav(i), None) for i in (1, 2, 9)
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in multimodal.decode_features(media, fake=False, dim=8).collect()
    }
    for mid in (1, 2, 9):
        r = got[mid]
        assert r["n_frames"] == 2000
        assert r["width"] is None and r["height"] is None
        assert len(r["feature"]) == 8
        # a square wave's RMS equals its amplitude; amp = 8000 + 997*id % 20000
        amp = (8000 + (mid * 997) % 20000) / 32768.0
        assert all(abs(f - amp) < 0.02 for f in r["feature"]), (mid, r["feature"])


def test_decode_ppm_real(spark):
    rows = [(7, "image/x-portable-pixmap", multimodal.synthesize_ppm(7, 32, 24), None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    r = multimodal.decode_features(media, fake=False, dim=16).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (32, 24, 1)
    assert abs(sum(r["feature"]) - 1.0) < 1e-6
    # oracle: run the pure decoder directly on the same bytes
    w, h, n, feat = multimodal.decode_payload(multimodal.synthesize_ppm(7, 32, 24), 16)
    assert [round(x, 6) for x in r["feature"]] == [round(x, 6) for x in feat]


def test_decode_mixed_formats_one_pass(spark):
    """One decode pass over a mixed wav/ppm table: magic-byte dispatch."""
    rows = [
        (1, "audio/wav", multimodal.synthesize_wav(1, n_frames=800), None),
        (2, "image/x-portable-pixmap", multimodal.synthesize_ppm(2), None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in multimodal.decode_features(media, fake=False).collect()
    }
    assert got[1]["n_frames"] == 800 and got[1]["width"] is None
    assert got[2]["width"] == 32 and got[2]["n_frames"] == 1
