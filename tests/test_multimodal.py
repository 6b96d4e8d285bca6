"""Multimodal binary-column operators: container parse, byte features,
frame sampling, and the stubbed pixel decode (SURVEY §7 hard-parts: no
image libraries ship in this environment, so decode is a deterministic
fake behind the same Spark plumbing)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.multimodal import (
    HEADER_LEN,
    byte_features,
    decode_image,
    decode_metadata,
    frame_sample,
    synth_blob,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    return synth_media(ids, "doc_id").cache()


def _blob_bytes(media, mid):
    return bytes(
        media.filter(F.col("media_id") == mid).select("blob").collect()[0][0]
    )


def test_synth_blob_layout(media):
    raw = _blob_bytes(media, 7)
    assert raw[:4] == b"IMG1"
    assert int.from_bytes(raw[4:6], "big") == 7 % 64 + 1
    assert int.from_bytes(raw[6:8], "big") == 7 % 48 + 1
    assert raw[8] == 3
    payload = raw[HEADER_LEN:]
    assert len(payload) == 64
    assert payload == bytes.fromhex(
        "".join(hashlib.md5(f"7:{i}".encode()).hexdigest() for i in range(4))
    )


def test_decode_metadata_jvm_side(media):
    out = decode_metadata(media, "media_id", "blob")
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 50
    for mid, r in rows.items():
        assert r["is_valid"] is True
        assert r["width"] == mid % 64 + 1
        assert r["height"] == mid % 48 + 1
        assert r["channels"] == 3
        assert r["payload_bytes"] == 64
    # no Python in the plan: header parse must not contain Arrow/Python eval
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEval" not in plan


def test_decode_metadata_invalid_magic(spark):
    bad = spark.range(0, 3).select(
        F.col("id").alias("media_id"), F.unhex(F.lit("00112233445566778899")).alias("blob")
    )
    rows = decode_metadata(bad, "media_id", "blob").collect()
    for r in rows:
        assert r["is_valid"] is False
        assert r["width"] is None and r["height"] is None


def test_byte_features_matches_python(media):
    out = {r["media_id"]: r for r in byte_features(media, "media_id", "blob").collect()}
    for mid in (0, 13, 49):
        payload = _blob_bytes(media, mid)[HEADER_LEN:]
        r = out[mid]
        assert r["n_bytes"] == len(payload)
        assert r["byte_sum"] == sum(payload)
        assert r["byte_max"] == max(payload)
        assert r["n_zero"] == sum(1 for x in payload if x == 0)


def test_frame_sample_fanout_and_bytes(media):
    out = frame_sample(media, "media_id", "blob", frame_size=16, stride=2)
    rows = out.filter(F.col("media_id") == 3).orderBy("frame_no").collect()
    # 64-byte payload / 16 = 4 frames, stride 2 -> frames 0 and 2
    assert [r["frame_no"] for r in rows] == [0, 2]
    payload = _blob_bytes(media, 3)[HEADER_LEN:]
    for r in rows:
        frame = payload[r["frame_no"] * 16 : (r["frame_no"] + 1) * 16]
        assert r["frame_hex"] == frame.hex()
        assert r["frame_md5"] == hashlib.md5(frame).hexdigest()
        assert r["frame_len"] == 16


def test_decode_image_fake_deterministic(media):
    out = decode_image(media, "media_id", "blob", fake=True)
    r = {x["media_id"]: x for x in out.collect()}[5]
    payload = _blob_bytes(media, 5)[HEADER_LEN:]
    assert r["width"] == 5 % 64 + 1
    assert r["gray_mean_milli"] == sum(payload) * 1000 // len(payload)
    assert r["pixels_sampled"] == list(payload[:8])


def test_decode_image_real_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        decode_image(media, "media_id", "blob", fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_bmp_decode_real_semantics(spark):
    """decode_bmp honors bottom-up storage, 4-byte stride, and BGR order;
    malformed blobs degrade to is_valid=0 rows, never exceptions."""
    import struct

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.multimodal import (
        decode_bmp,
        parse_bmp,
        synth_bmp,
    )

    blobs = spark.range(0, 20).select(
        F.col("id").alias("doc_id"), synth_bmp(F.col("id")).alias("blob")
    )
    got = {r["media_id"]: r for r in decode_bmp(blobs, "doc_id", "blob").collect()}
    for i in range(20):
        r = got[i]
        assert r["is_valid"] == 1
        assert (r["width"], r["height"]) == (4 + i % 5, 4 + i % 4)
        # python reference: parse the same blob locally
        raw = bytes(
            blobs.filter(F.col("doc_id") == i).collect()[0]["blob"]
        )
        w, h, rows = parse_bmp(raw)
        sums = [0, 0, 0]
        for row in rows:
            for k, v in enumerate(row):
                sums[k % 3] += v
        assert r["mean_b_milli"] == sums[0] * 1000 // (w * h)
        assert (r["tl_b"], r["tl_g"], r["tl_r"]) == tuple(rows[0][:3])

    # top-down (negative height) variant parses without the row flip
    w, h = 2, 2
    stride = (3 * w + 3) // 4 * 4
    px = (bytes([1, 2, 3, 4, 5, 6]) + b"\x00" * (stride - 6)
          + bytes([7, 8, 9, 10, 11, 12]) + b"\x00" * (stride - 6))
    raw = (
        b"BM" + struct.pack("<I", 54 + stride * h) + b"\x00" * 4
        + struct.pack("<I", 54)
        + struct.pack("<IiiHHIIIIII", 40, w, -h, 1, 24, 0, stride * h, 0, 0, 0, 0)
        + px
    )
    pw, ph, rows = parse_bmp(raw)
    assert (pw, ph) == (2, 2) and rows[0][:3] == bytes([1, 2, 3])

    # malformed blobs -> is_valid=0, no exception
    bad = spark.createDataFrame(
        [(1, b"not a bmp"), (2, b"BM" + b"\x00" * 10)], "doc_id long, blob binary"
    )
    rows = decode_bmp(bad, "doc_id", "blob").collect()
    assert all(r["is_valid"] == 0 and r["width"] is None for r in rows)


def test_wav_decode_real_semantics(spark):
    """decode_wav walks RIFF chunks (tolerating extra chunks before
    'data'), parses signed little-endian samples, and degrades malformed
    blobs to is_valid=0."""
    import struct

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.multimodal import (
        decode_wav,
        parse_wav,
        synth_wav,
    )

    blobs = spark.range(0, 12).select(
        F.col("id").alias("doc_id"), synth_wav(F.col("id")).alias("blob")
    )
    got = {r["media_id"]: r for r in decode_wav(blobs, "doc_id", "blob").collect()}
    raws = {
        r["doc_id"]: bytes(r["blob"]) for r in blobs.collect()
    }
    for i in range(12):
        rate, samples = parse_wav(raws[i])
        r = got[i]
        assert r["is_valid"] == 1 and r["sample_rate"] == 8000
        assert r["n_samples"] == len(samples) == 16 + i % 17
        assert r["first_sample"] == samples[0]
        assert r["max_abs"] == max(abs(s) for s in samples)

    # extra chunk ('LIST') before 'data' must be skipped, including the
    # odd-size word-alignment pad
    samples = [100, -200, 300]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    listc = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + listc + \
           b"data" + struct.pack("<I", len(data)) + data
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, got_samples = parse_wav(raw)
    assert rate == 8000 and got_samples == samples

    bad = spark.createDataFrame(
        [(1, b"RIFFxxxx"), (2, b"nope")], "doc_id long, blob binary"
    )
    rows = decode_wav(bad, "doc_id", "blob").collect()
    assert all(r["is_valid"] == 0 for r in rows)


def test_png_roundtrip_all_variants():
    """Encoder->decoder identity for RGB and RGBA, every scanline filter
    type (h >= 5 ids exercise all five), CRC-checked chunk walk."""
    from pdf_extraction_spark.operators.multimodal import (
        _png_row_bytes,
        parse_png,
        synth_png_bytes,
    )

    for mid in range(24):
        w, h, ch = mid % 5 + 4, mid % 4 + 4, 3 + mid % 2
        parsed = parse_png(synth_png_bytes(mid))
        assert parsed is not None
        pw, ph, pch, rows = parsed
        assert (pw, ph, pch) == (w, h, ch)
        for j, row in enumerate(rows):
            assert row == _png_row_bytes(mid, j, w * ch), (mid, j)


def test_png_rejects_corruption():
    """A flipped pixel byte breaks that chunk's CRC -> None (not garbage
    pixels); truncation and wrong signature are also rejected."""
    from pdf_extraction_spark.operators.multimodal import parse_png, synth_png_bytes

    png = synth_png_bytes(7)
    assert parse_png(png) is not None
    # flip one byte inside the first IDAT body
    idat = png.index(b"IDAT")
    corrupt = bytearray(png)
    corrupt[idat + 8] ^= 0xFF
    assert parse_png(bytes(corrupt)) is None
    assert parse_png(png[:40]) is None
    assert parse_png(b"\x89PNJ" + png[4:]) is None
    assert parse_png(b"") is None


def test_png_decode_spark_matches_python(spark):
    """decode_png over synth_png blobs reproduces the raw md5 pixel
    formula's channel means, and tl_* prove top-down row order."""
    from pdf_extraction_spark.operators.multimodal import (
        _png_row_bytes,
        decode_png,
        synth_png,
    )

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    out = {
        r["media_id"]: r
        for r in decode_png(synth_png(ids, "doc_id"), "media_id", "blob").collect()
    }
    assert len(out) == 12
    for mid in range(12):
        w, h, ch = mid % 5 + 4, mid % 4 + 4, 3 + mid % 2
        rows = [_png_row_bytes(mid, j, w * ch) for j in range(h)]
        sums = [0, 0, 0, 0]
        for row in rows:
            for i, v in enumerate(row):
                sums[i % ch] += v
        r = out[mid]
        assert r["is_valid"] == 1
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["mean_r_milli"] == sums[0] * 1000 // (w * h)
        assert r["mean_b_milli"] == sums[2] * 1000 // (w * h)
        assert r["tl_r"] == rows[0][0]
        if ch == 4:
            assert r["mean_a_milli"] == sums[3] * 1000 // (w * h)
            assert r["tl_a"] == rows[0][3]
        else:
            assert r["mean_a_milli"] is None and r["tl_a"] is None
