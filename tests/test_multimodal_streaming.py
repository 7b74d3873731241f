"""Multimodal plumbing + Structured Streaming tests.

Streaming operators are driven with a file source + availableNow trigger
and asserted to converge to their batch twins — the strongest correctness
statement available without an unbounded source.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.functions import multimodal
from mapreducer_pi_cs4433_spark.queries.extensions import events_hourly_rollup
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming import staleness

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return multimodal.attach_payload(docs).cache()


def test_attach_payload_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "payload",
        "media_type",
        "n_bytes",
    ]
    r = media.filter(F.col("media_id") == 1).head()
    assert isinstance(r.payload, (bytes, bytearray))
    assert r.n_bytes == len(r.payload)


def test_extract_features_plumbing(media):
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        if r.n_bytes > 0:
            assert 64 <= r.width < 256 and 64 <= r.height < 256
            assert 0 <= r.byte_entropy_q <= 100
    # determinism: same payload -> same fake dims
    again = {r.media_id: (r.width, r.height) for r in feats.collect()}
    first = {r.media_id: (r.width, r.height) for r in rows}
    assert again == first


def test_real_decoder_is_import_gated():
    """Without a codec library decode_image must raise NotImplementedError;
    with PIL installed it must decode real header dimensions. Both sides of
    the gate are covered — whichever this environment has."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    assert multimodal.decode_image(buf.getvalue()) == (17, 9)


def test_sample_frames_bounded(media):
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=8)
    per_doc = frames.groupBy("media_id").count().agg(F.max("count")).head()[0]
    assert per_doc <= 8
    r = frames.filter(F.col("frame_no") == 0).head()
    assert len(r.frame_bytes) <= 64


def test_streaming_rollup_matches_batch(spark):
    """availableNow file-stream through windowed_rollup must equal the batch
    events_hourly_rollup at the same scale factor."""
    events = load_table(spark, SF_SMOKE, "events")
    tmp = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        events.write.mode("overwrite").parquet(tmp)
        stream = spark.readStream.schema(events.schema).parquet(tmp)
        rolled = staleness.windowed_rollup(stream, watermark="0 seconds")
        q = (
            rolled.writeStream.format("memory")
            .queryName("rollup_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.hour_bucket, r.event_type): (r.n_events, str(r.total_value))
            for r in spark.sql("select * from rollup_test").collect()
        }
        want = {
            (r.hour_bucket, r.event_type): (r.n_events, str(r.total_value))
            for r in events_hourly_rollup(spark, SF_SMOKE).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_last_access_and_staleness(spark):
    """Streaming last_access_state + batch staleness join must reproduce the
    task_g_stale_users batch query."""
    from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES

    events = load_table(spark, SF_SMOKE, "events")
    customer = load_table(spark, SF_SMOKE, "customer")
    tmp = tempfile.mkdtemp(prefix="stream_src2_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt2_")
    try:
        events.write.mode("overwrite").parquet(tmp)
        stream = spark.readStream.schema(events.schema).parquet(tmp)
        state = staleness.last_access_state(stream, watermark="0 seconds")
        q = (
            state.writeStream.format("memory")
            .queryName("last_state_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        state_tbl = spark.sql("select * from last_state_test")
        ref = events.agg(F.max("ts")).head()[0]
        snap = staleness.stale_users_snapshot(
            customer.select("c_custkey", "c_name"), state_tbl, ref, days=14
        )
        got = {r.c_custkey for r in snap.collect()}
        want = {r.c_custkey for r in QUERIES["task_g_stale_users"](spark, SF_SMOKE).collect()}
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _tiny_bmp(w: int, h: int) -> bytes:
    """Complete valid 24bpp bottom-up BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + padded pixel rows)."""
    import struct

    row = w * 3
    pad = (4 - row % 4) % 4
    pixels = (b"\x7f" * row + b"\x00" * pad) * h
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    file_h = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return file_h + info + pixels


def _tiny_ppm(w: int, h: int) -> bytes:
    """Valid binary PPM (P6) with a header comment — the tokenizer must
    skip it."""
    return (f"P6\n# generated test image\n{w} {h}\n255\n").encode() + (
        b"\x10\x20\x30" * (w * h)
    )


def _tiny_png(w: int, h: int) -> bytes:
    """Complete valid RGB8 PNG (signature + IHDR + IDAT + IEND, real
    CRCs, real zlib stream)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = (b"\x00" + b"\x40\x80\xc0" * w) * h  # filter 0 per scanline
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_gif(w: int, h: int) -> bytes:
    """GIF89a logical-screen header + trailer (dimensions live entirely
    in the fixed header)."""
    import struct

    return b"GIF89a" + struct.pack("<HHBBB", w, h, 0, 0, 0) + b"\x3b"


def test_pure_python_header_decode_real_images():
    """The real-decode branch runs in CI without PIL (r8 verdict ask #7):
    real generated BMP/PPM/PNG/GIF images yield their true dimensions
    through decode_image's dependency-free header layer. JPEG stays
    behind the codec gate (its dimensions sit in a variable-position SOF
    marker, not the header)."""
    cases = {
        "bmp": _tiny_bmp(13, 7),
        "ppm": _tiny_ppm(13, 7),
        "png": _tiny_png(13, 7),
        "gif": _tiny_gif(13, 7),
    }
    for fmt, payload in cases.items():
        assert multimodal.parse_image_header(payload) == (13, 7), fmt
        assert multimodal.decode_image(payload) == (13, 7), fmt
    # top-down DIB: negative height, magnitude is the dimension
    import struct

    bmp = bytearray(_tiny_bmp(13, 7))
    bmp[22:26] = struct.pack("<i", -7)
    assert multimodal.parse_image_header(bytes(bmp)) == (13, 7)
    # JPEG magic -> not header-decodable; pure layer must say so
    assert multimodal.parse_image_header(b"\xff\xd8\xff\xe0" + b"JFIF" * 8) is None
    assert multimodal.parse_image_header(b"P6 malformed") is None


def test_extract_features_with_real_decoder(spark):
    """The mapInPandas plumbing with decode_image as the decoder: real
    generated images flow through the Arrow batch path and come back
    with their true dimensions — the full real-decode branch, on Spark,
    in this container."""
    rows = [
        (1, _tiny_bmp(31, 17)),
        (2, _tiny_ppm(9, 23)),
        (3, _tiny_png(5, 3)),
        (4, _tiny_gif(300, 200)),
    ]
    media = spark.createDataFrame(
        [
            {
                "media_id": i,
                "payload": p,
                "media_type": "image/generated",
                "n_bytes": len(p),
            }
            for i, p in rows
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    feats = multimodal.extract_features(media, decoder=multimodal.decode_image)
    got = {r.media_id: (r.width, r.height) for r in feats.collect()}
    assert got == {1: (31, 17), 2: (9, 23), 3: (5, 3), 4: (300, 200)}


def test_header_parser_rejects_lookalike_containers():
    """Self-review r9 hardening: header-LOOKALIKE payloads that would
    have decoded to packed garbage must return None (codec territory) —
    an OS/2 BITMAPCOREHEADER BMP (uint16 dims, not int32), a BMP with a
    non-positive width, and a PNG signature whose first chunk is not
    IHDR."""
    import struct

    # OS/2 core-header BMP: 12-byte DIB, 100x50 uint16 dims at 18/20
    os2 = (
        struct.pack("<2sIHHI", b"BM", 26 + 6, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 100, 50, 1, 24)
        + b"\x00" * 8
    )
    assert multimodal.parse_image_header(os2) is None
    # negative width = corrupt (negative HEIGHT stays legal: top-down DIB)
    bad_w = bytearray(_tiny_bmp(13, 7))
    bad_w[18:22] = struct.pack("<i", -13)
    assert multimodal.parse_image_header(bytes(bad_w)) is None
    # PNG signature, tEXt first chunk: dims offsets hold chunk payload
    fake_png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"tEXt"
        + b"\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d"
        + b"\x00" * 4
    )
    assert multimodal.parse_image_header(fake_png) is None


def test_pil_probe_is_memoized():
    """The PIL availability probe runs once per process, not once per
    payload — a failed import is NOT cached by Python, so the per-call
    retry put a sys.path scan on the Arrow batch hot path."""
    probed = multimodal._pil_image_module()
    assert multimodal._PIL_IMAGE is not False  # probe resolved
    assert multimodal._pil_image_module() is probed  # and sticks


# ---------------------------------------------------------------------------
# Perceptual image near-dup: synthesize -> decode -> aHash (r10 candidate #2)
# ---------------------------------------------------------------------------


def _ref_ahash(payload: bytes) -> tuple[int, int]:
    """Independent pure-Python aHash reference: no numpy, no reuse of the
    production kernel — straight loops over the P6 bytes, so a bug in the
    vectorized reshape/packing can't hide in a shared implementation."""
    assert payload[:2] == b"P6"
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while payload[j : j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
    w, h, _maxval = vals
    i += 1  # single whitespace before the raster
    gray = [
        [
            (
                payload[i + 3 * (y * w + x)]
                + payload[i + 3 * (y * w + x) + 1]
                + payload[i + 3 * (y * w + x) + 2]
            )
            // 3
            for x in range(w)
        ]
        for y in range(h)
    ]
    total = sum(map(sum, gray))
    bh, bw = h // 8, w // 8
    bits = []
    for br in range(8):
        for bc in range(8):
            s = sum(
                gray[y][x]
                for y in range(br * bh, (br + 1) * bh)
                for x in range(bc * bw, (bc + 1) * bw)
            )
            bits.append(1 if s * 64 > total else 0)
    lo = sum(bits[b] << b for b in range(32))
    hi = sum(bits[32 + b] << b for b in range(32))
    return lo, hi


def test_ahash_matches_pure_python_reference(spark):
    """The vectorized mapInPandas kernel must agree with the loop-wise
    reference on every synthesized payload — the round trip through real
    P6 bytes is the part the oracle's analytic regeneration can't see
    in isolation."""
    docs = spark.range(24).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_ppm_corpus(docs)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    got = {
        r.media_id: (r.ahash_lo, r.ahash_hi)
        for r in multimodal.ahash_features(media).collect()
    }
    assert len(got) == 24
    assert got == {m: _ref_ahash(p) for m, p in payloads.items()}


def test_ahash_uniform_shift_invariant_groups(spark):
    """The planted-near-dup contract: one group's four payloads are
    byte-DIFFERENT (distinct md5s) yet hash-EQUAL — a uniform brightness
    shift moves every block sum and the global sum together, so no
    ``sum*64 > total`` comparison can flip. Across a group boundary the
    base image changes and the hashes separate (deterministic: the md5
    pixel values are fixed forever)."""
    import hashlib

    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_ppm_corpus(docs)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    hashes = {
        r.media_id: (r.ahash_lo, r.ahash_hi)
        for r in multimodal.ahash_features(media).collect()
    }
    assert len({hashlib.md5(payloads[i]).hexdigest() for i in range(4)}) == 4
    assert len({hashes[i] for i in range(4)}) == 1
    assert len({hashes[i] for i in range(4, 8)}) == 1
    assert hashes[0] != hashes[4]


def test_ahash_drops_malformed_and_honors_comments(spark):
    """Malformed payloads (wrong magic, truncated raster, maxval > 255,
    dimensions not divisible by 8) drop like the loader's malformed-row
    policy; a header COMMENT changes bytes but not the decoded image, so
    the hash is unchanged."""
    docs = spark.range(1).select(F.col("id").alias("doc_id"))
    good = bytes(
        spark_payload
        for r in multimodal.synthesize_ppm_corpus(docs).collect()
        for spark_payload in bytes(r.payload)
    )
    commented = good[:2] + b"\n# a comment\n" + good[2:]
    rows = [
        (0, good),
        (1, commented),
        (2, b"P5" + good[2:]),          # wrong magic (grayscale PGM)
        (3, good[:-10]),                 # truncated raster
        (4, good.replace(b"\n255\n", b"\n65535\n", 1)),  # 16-bit maxval
        (5, b"P6\n12 12\n255\n" + b"\x10" * (12 * 12 * 3)),  # 12 % 8 != 0
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = {
        r.media_id: (r.ahash_lo, r.ahash_hi)
        for r in multimodal.ahash_features(media).collect()
    }
    assert set(hashes) == {0, 1}
    assert hashes[0] == hashes[1]
