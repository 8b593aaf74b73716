"""The multimodal codec injection seam, exercised with a REAL codec
(VERDICT r4 action #7): a PNG header parser built on stdlib struct/zlib
is injected through extract_metadata's ``codec`` parameter and decodes
genuine PNG bytes inside the Arrow-batched mapInPandas plumbing — proving
the seam carries an arbitrary decoder to the executors, not just the
synthetic IMG1 stub. The unknown-codec guard (multimodal.py) is covered
both ways: default codec over PNG bytes fails loudly through the Spark
job, and the injected dispatcher decodes the same rows."""

from __future__ import annotations

import struct
import zlib

import pytest

from serverless_etl_aws_spark.operators.multimodal import (
    decode_payload,
    extract_metadata,
    resize_payloads,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_png(width: int, height: int) -> bytes:
    """A minimal, standards-correct PNG: signature + IHDR chunk (length,
    tag, 13-byte body, CRC32 over tag+body). No IDAT — header parsing is
    what the codec reads."""
    body = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + body
    return (
        PNG_SIG
        + struct.pack(">I", len(body))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def make_dispatching_codec():
    """Build the injected codec as a CLOSURE: cloudpickle serializes
    closures by value, so the PNG parser travels to the executors inside
    the task — exactly how a deployment ships a codec the workers'
    environment doesn't have importable (test modules aren't on the
    worker sys.path, so a module-level function here would fail with
    ModuleNotFoundError)."""
    sig = PNG_SIG

    def decode_png(payload: bytes) -> dict:
        # Real (if minimal) PNG codec: validate signature, check the
        # IHDR CRC, unpack width/height big-endian — stdlib only.
        import struct as _struct
        import zlib as _zlib

        if payload[:8] != sig:
            raise ValueError("not a PNG")
        length = _struct.unpack(">I", payload[8:12])[0]
        chunk = payload[12:16 + length]
        crc = _struct.unpack(">I", payload[16 + length:20 + length])[0]
        if chunk[:4] != b"IHDR" or _zlib.crc32(chunk) & 0xFFFFFFFF != crc:
            raise ValueError("corrupt IHDR")
        width, height = _struct.unpack(">II", chunk[4:12])
        return {
            "fmt": "PNG",
            "width": int(width),
            "height": int(height),
            "n_bytes": len(payload),
        }

    def dispatching_codec(payload: bytes) -> dict:
        # What a production deployment injects: sniff magic, dispatch.
        if payload[:8] == sig:
            return decode_png(payload)
        return decode_payload(payload)

    return dispatching_codec


dispatching_codec = make_dispatching_codec()


def payload_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary"
    )


def test_png_codec_decodes_through_the_injection_seam(spark):
    """Real PNG bytes decode to their true IHDR geometry inside the
    mapInPandas batch flow when the codec is injected."""
    df = payload_df(
        spark, [(1, make_png(640, 480)), (2, make_png(1920, 1080))]
    )
    got = {
        r["doc_id"]: (r["fmt"], r["width"], r["height"], r["n_bytes"])
        for r in extract_metadata(df, codec=dispatching_codec).collect()
    }
    assert got == {
        1: ("PNG", 640, 480, 33),
        2: ("PNG", 1920, 1080, 33),
    }


def test_mixed_formats_in_one_batch(spark):
    """The dispatcher handles IMG1 and PNG rows in the SAME Arrow batch —
    the heterogeneous-corpus shape a real media lake has."""
    df = payload_df(
        spark,
        [(1, b"IMG1" + b"0010" + b"x" * 25), (2, make_png(32, 16))],
    )
    got = {
        r["doc_id"]: (r["fmt"], r["width"], r["height"])
        for r in extract_metadata(df, codec=dispatching_codec).collect()
    }
    assert got == {1: ("IMG1", 10, 3), 2: ("PNG", 32, 16)}


def test_default_codec_guard_fires_through_the_spark_job(spark):
    """Without the injection, PNG bytes must hit the explicit
    unknown-codec guard — surfaced through the executor as a loud error,
    not silently mis-parsed geometry."""
    df = payload_df(spark, [(1, make_png(8, 8))])
    with pytest.raises(Exception, match="codec for magic"):
        extract_metadata(df).collect()


def test_resize_accepts_injected_codec(spark):
    """The second codec-consuming operator honors the same seam: resize
    geometry derives from the injected decoder's n_bytes."""
    png = make_png(100, 50)
    df = payload_df(spark, [(7, png)])
    row = resize_payloads(df, target_width=5, codec=dispatching_codec).collect()[0]
    body_len = len(png) - 8
    assert (row["doc_id"], row["width"], row["height"], row["n_bytes"]) == (
        7, 5, -(-body_len // 5), body_len + 8,
    )


# --------------------------------------------------------------------------
# Round-12 quarantine contract (VERDICT r11 directive #2c): truncated /
# empty / header-garbled payloads — the byte twin of the giant+empty
# documents axis. At 100 TB of media, truncated objects are a
# statistical certainty; one corrupt payload must never fail a stage.

CORRUPT_PAYLOADS = [
    (101, b""),                       # empty object
    (102, b"IMG"),                    # truncated mid-magic
    (103, b"IMG1004"),                # truncated mid-width-field
    (104, b"IMG1" + b"00ab" + b"xyz"),  # garbled width digits
    (105, b"IMG1" + b"0000" + b"xyz"),  # zero width
]

VALID_PAYLOADS = [
    (1, b"IMG1" + b"0004" + b"0123456789"),   # 10-byte body, width 4
    (2, b"IMG1" + b"0064"),                   # header-only: EMPTY body is
                                              # VALID media (0 bytes)
]


def test_corrupt_payloads_quarantine_in_metadata(spark):
    """extract_metadata keeps corrupt payloads VISIBLE: fmt/geometry
    NULL, n_bytes = the actual byte count — countable and routable, not
    a stage failure and not a silent drop."""
    df = payload_df(spark, VALID_PAYLOADS + CORRUPT_PAYLOADS)
    got = {
        r["doc_id"]: (r["fmt"], r["width"], r["height"], r["n_bytes"])
        for r in extract_metadata(df).collect()
    }
    assert got[1] == ("IMG1", 4, 3, 18)
    assert got[2] == ("IMG1", 64, 0, 8)
    for doc_id, payload in CORRUPT_PAYLOADS:
        assert got[doc_id] == (None, None, None, len(payload)), (
            f"doc {doc_id} did not quarantine: {got[doc_id]}"
        )


def test_corrupt_payloads_dropped_by_transforms(spark):
    """The transform passes (resize / frame / feature / audio / scene /
    phash) DROP corrupt payloads — no decodable media, nothing to
    transform — while valid rows in the same Arrow batch flow through
    untouched."""
    from serverless_etl_aws_spark.operators.multimodal import (
        audio_window,
        feature_extract,
        frame_sample,
        phash64,
        scene_cut,
    )

    df = payload_df(spark, VALID_PAYLOADS + CORRUPT_PAYLOADS)
    for op in (
        lambda d: resize_payloads(d, target_width=8),
        lambda d: frame_sample(d, frame_size=4, every=1),
        feature_extract,
        lambda d: audio_window(d, window=4),
        lambda d: scene_cut(d, frame=2),
        phash64,
    ):
        ids = {r["doc_id"] for r in op(df).collect()}
        assert ids <= {1, 2}, f"corrupt rows leaked through {op}: {ids}"
        assert 1 in ids  # the valid row is not collateral damage


def test_unknown_magic_still_raises_codec_gap(spark):
    """A COMPLETE header with an unknown magic is a deployment gap (the
    codec seam), not a data defect — it must stay loud, not quarantine."""
    df = payload_df(spark, [(1, b"WEBP" + b"0004" + b"abcd")])
    with pytest.raises(Exception, match="codec for magic"):
        extract_metadata(df).collect()


def test_null_payload_reports_null_n_bytes(spark):
    """A NULL payload is a MISSING object, not a zero-byte one (ADVICE
    r12): extract_metadata quarantines it with n_bytes NULL, while an
    empty b'' payload in the same batch reports n_bytes 0 — the two
    stay distinguishable for routing/accounting."""
    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b""))], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: (r["fmt"], r["width"], r["height"], r["n_bytes"])
        for r in extract_metadata(df).collect()
    }
    assert got[1] == (None, None, None, None)
    assert got[2] == (None, None, None, 0)


def test_truncated_foreign_magic_still_raises_codec_gap(spark):
    """'Unknown codec stays loud' holds at every length (ADVICE r12): a
    payload long enough to carry its magic (≥4 bytes) but shorter than
    the full header must raise the codec-gap error when the magic is
    foreign — only a <4-byte fragment (no identifiable format)
    quarantines without a verdict."""
    df = payload_df(spark, [(1, b"WEBPab")])  # 6 bytes, foreign magic
    with pytest.raises(Exception, match="codec for magic"):
        extract_metadata(df).collect()
    # sub-magic fragment: quarantine, not a raise
    assert decode_payload(b"WE") == {
        "fmt": None, "width": None, "height": None, "n_bytes": 2,
    }
