"""Multimodal plumbing: binary payloads, typed metadata, mapInPandas
decode/frame-sample kernels (schema, batch shape, determinism, the
NotImplementedError gate for the real codec path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.operators.multimodal import (
    DECODED_SCHEMA,
    attach_payload,
    decode_images,
    frame_sample,
)

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def payloads(spark):
    d = table(spark, SF_SMALL, "documents")
    return attach_payload(d, "doc_id", "text")


def test_payload_schema(payloads):
    assert dict(payloads.dtypes)["payload"] == "binary"
    meta = payloads.select("meta.*")
    assert set(meta.columns) == {"mime_type", "n_bytes", "sha256"}
    r = payloads.filter(F.col("doc_id") == 0).collect()[0]
    assert r.meta.n_bytes == len(r.payload) > 0


def test_decode_fake_schema_and_determinism(spark, payloads):
    out = decode_images(payloads, impl="fake")
    assert out.schema == DECODED_SCHEMA
    rows1 = {r.doc_id: (r.width, r.height, tuple(r.features)) for r in out.collect()}
    rows2 = {r.doc_id: (r.width, r.height, tuple(r.features)) for r in out.collect()}
    assert rows1 == rows2 and len(rows1) == 500
    w, h, feats = rows1[0]
    assert 1 <= w <= 64 and h >= 1 and len(feats) == 8


def test_decode_survives_repartition(spark, payloads):
    """Batch shape: kernel must be correct regardless of partitioning
    (multiple Arrow batches, uneven splits)."""
    out1 = decode_images(payloads.repartition(7), impl="fake")
    out2 = decode_images(payloads.coalesce(1), impl="fake")
    assert sorted(r.doc_id for r in out1.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_decode_real_raises(spark, payloads):
    with pytest.raises(Exception) as exc_info:
        decode_images(payloads.limit(1), impl="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


# ---------------------------------------------------------------------------
# Decode-impl CONTRACT (round-5 ask #8): every decode implementation —
# today's deterministic fake, any future real-codec integration — must
# pass the same checks. When a real codec lands, add its impl name to
# IMPLS and the contract holds it to the stub's guarantees; the
# NotImplementedError gate (test_decode_real_raises above) keeps the
# "real" slot honest until then.
# ---------------------------------------------------------------------------

IMPLS = ["fake"]  # + "real" once a codec is installed


@pytest.mark.parametrize("impl", IMPLS)
def test_decode_contract_schema_exact(spark, payloads, impl):
    out = decode_images(payloads, impl=impl)
    assert out.schema == DECODED_SCHEMA


@pytest.mark.parametrize("impl", IMPLS)
def test_decode_contract_row_preserving(spark, payloads, impl):
    """Exactly one output row per input row — no drops, no fanout —
    regardless of how Arrow batches the partitions."""
    n_in = payloads.count()
    for shaped in (payloads.repartition(11), payloads.coalesce(1)):
        out = decode_images(shaped, impl=impl)
        ids = [r.doc_id for r in out.collect()]
        assert len(ids) == n_in and len(set(ids)) == n_in


@pytest.mark.parametrize("impl", IMPLS)
def test_decode_contract_deterministic(spark, payloads, impl):
    """Same payload bytes → same decode output, across runs AND across
    partitionings (a codec with hidden per-task state fails here)."""
    a = {
        r.doc_id: (r.width, r.height, r.channels, tuple(r.features))
        for r in decode_images(payloads.repartition(5), impl=impl).collect()
    }
    b = {
        r.doc_id: (r.width, r.height, r.channels, tuple(r.features))
        for r in decode_images(payloads.coalesce(1), impl=impl).collect()
    }
    assert a == b


@pytest.mark.parametrize("impl", IMPLS)
def test_decode_contract_bounds_and_empty_payload(spark, payloads, impl):
    """Dims positive, feature vector bounded (≤8 dims, values in
    [0, 1]); a zero-byte payload must decode to a row, not a crash."""
    empty = spark.createDataFrame(
        [(999_999, bytearray(b""))], "doc_id long, payload binary"
    )
    out = decode_images(
        payloads.limit(20).select("doc_id", "payload").unionByName(empty), impl=impl
    ).collect()
    assert len(out) == 21
    for r in out:
        assert r.width >= 1 and r.height >= 1 and r.channels >= 1
        assert len(r.features) <= 8
        assert all(0.0 <= f <= 1.0 for f in r.features)
    empties = [r for r in out if r.doc_id == 999_999]
    assert len(empties) == 1 and empties[0].features == []


def test_frame_sample_fanout(spark, payloads):
    frames = frame_sample(payloads, frame_size=64, every_k=4)
    assert frames.count() > 500  # 1→N fanout happened
    r = frames.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    assert [f.frame_idx for f in r] == list(range(0, 4 * len(r), 4))
    assert all(f.frame_bytes <= 64 for f in r)


def test_image_header_dims_real_headers(spark):
    """X109: PNG/GIF/BMP dims parsed from real header bytes built
    with struct.pack; truncated and non-image payloads yield NULL
    dims; top-down (negative-height) BMP folds to the absolute
    value; the whole op is one shuffle-free projection."""
    import struct
    import zlib

    from poet_cloud_cost_etl_spark.operators.multimodal import image_header_dims

    def png(w, h):
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        return (
            b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6

    def bmp(w, h):
        return (
            b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
        )

    rows = [
        (1, bytearray(png(640, 480))),
        (2, bytearray(gif(320, 200))),
        (3, bytearray(bmp(1920, 1080))),
        (4, bytearray(bmp(100, -50))),  # top-down row order
        (5, bytearray(b"\x89PN")),  # truncated magic
        (6, bytearray(b"plain text bytes")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    out = {r["doc_id"]: r for r in image_header_dims(df, "doc_id", "payload").collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("png", 640, 480)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("gif", 320, 200)
    assert (out[3]["format"], out[3]["width"], out[3]["height"]) == ("bmp", 1920, 1080)
    assert (out[4]["width"], out[4]["height"]) == (100, 50)
    assert out[5]["format"] == "unknown" and out[5]["width"] is None
    assert out[6]["format"] == "unknown" and out[6]["height"] is None
    plan = (
        image_header_dims(df, "doc_id", "payload")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
