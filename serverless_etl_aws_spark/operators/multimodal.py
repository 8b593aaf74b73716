"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the 100 TB training-data brief): image/audio/video payloads are
``binary`` columns with typed metadata columns beside them; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas`` so each batch crosses the JVM↔Python
boundary once. The heavy decode libraries (PIL/ffmpeg/torchcodec) are NOT
in this container, so the codec step is stubbed deterministically behind
``decode_payload`` — the Spark-side plumbing (schema, batching, partition
flow) is real and tested.

Payload format used by the synthetic corpus builder:
``b"IMG1" + 4-ASCII-digit width + utf-8 payload bytes``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, fmt string, width int, height int, n_bytes long"
)

#: A codec maps raw payload bytes to {fmt, width, height, n_bytes}.
#: Injected per-operator-call (closure-captured, so cloudpickle ships a
#: test/production codec to executors by VALUE — a module-global registry
#: would be re-imported empty on each worker and silently fall back).
Codec = Callable[[bytes], dict]


def synthesize_payloads(docs: DataFrame) -> DataFrame:
    """Build a deterministic binary 'image' column from document text
    (stand-in for real stored media; schema is what matters)."""
    # A NULL text has no media to synthesize: concat(NULL) would emit a
    # NULL payload that every downstream decoder must special-case.
    # Dropping the row here mirrors "no object stored for this id", and
    # every mm oracle carries the same text IS NOT NULL predicate.
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        # pmod, not %: ids are arbitrary integers, and Spark % keeps the
        # dividend's sign — a negative doc_id would encode a negative
        # "width" that the header's fixed-width ASCII field garbles
        # ("0-51"); pmod keeps width in [1, 64] for ANY id (round-10
        # negative-ids sweep). Positive ids are unchanged.
        F.expr(
            "concat(encode('IMG1', 'utf-8'), "
            "encode(lpad(cast(pmod(doc_id, 64) + 1 as string), 4, '0'), "
            "'utf-8'), "
            "encode(text, 'utf-8'))"
        ).alias("payload"),
    )


#: Metadata row emitted for a payload with no parsable header — the
#: QUARANTINE posture (round 12): at 100 TB-of-media scale, truncated
#: objects are a statistical certainty, and one corrupt payload must
#: never take down a whole stage. Contract:
#:   * a payload too short to even carry a magic (<4 bytes), or an
#:     IMG1 payload that is header-truncated (4-7 bytes) or whose
#:     width field is non-numeric or zero → CORRUPT: extract_metadata
#:     emits the row with fmt/width/height NULL and the ACTUAL byte
#:     count (NULL payload → n_bytes NULL; so corrupt volume stays
#:     countable/routable); the transform passes
#:     (resize/frame/feature/audio/scene/phash) DROP the row — no
#:     decodable media, nothing to transform.
#:   * any payload ≥4 bytes whose magic is NOT a known format raises
#:     the loud codec-gap NotImplementedError — even when the rest of
#:     the header is truncated. That is the codec-injection seam, a
#:     deployment gap rather than a data defect; 'unknown codec stays
#:     loud' holds at every length that can be identified.
#: The registry's mm_* oracles are unaffected: synthesize_payloads only
#: emits well-formed headers, so the quarantine path is exercised by
#: the direct operator tests (tests/test_multimodal.py).
_CORRUPT = {"fmt": None, "width": None, "height": None}


def decode_payload(payload: bytes) -> dict:
    """Default codec: parse the synthetic IMG1 header. A real build
    injects the actual codec (PIL.Image.open etc.) via the ``codec``
    parameter of extract_metadata/resize_payloads; everything around it
    stays. tests/test_multimodal.py proves the seam with a real PNG
    header parser (stdlib struct) injected through the same parameter.

    Malformed payloads (truncated header, zero/garbled width) return
    the quarantine dict rather than raising — see ``_CORRUPT`` above.
    Distinctions the quarantine row preserves (ADVICE r12):

    * a NULL payload is a MISSING object, not a zero-byte one —
      n_bytes is NULL, where an empty ``b""`` payload reports 0;
    * any payload long enough to carry a magic (≥4 bytes) is checked
      against the known formats FIRST, so a truncated foreign-format
      object still raises the codec-gap error instead of silently
      quarantining — 'unknown codec stays loud' holds at every length.
      Only a payload too short to identify (<4 bytes) quarantines
      without a format verdict."""
    if payload is None:
        return {**_CORRUPT, "n_bytes": None}
    if len(payload) >= 4:
        magic = payload[:4].decode("ascii", errors="replace")
        if magic != "IMG1":
            raise NotImplementedError(
                f"codec for magic {magic!r} not available in this "
                "environment (stubbed: only the synthetic IMG1 format "
                "decodes here)"
            )
    if len(payload) < 8:
        return {**_CORRUPT, "n_bytes": len(payload)}
    width_field = payload[4:8]
    if not width_field.isdigit() or int(width_field) == 0:
        return {**_CORRUPT, "n_bytes": len(payload)}
    width = int(width_field)
    body = payload[8:]
    height = -(-len(body) // width)  # ceil-div: rows needed at this width
    return {
        "fmt": magic,
        "width": width,
        "height": height,
        "n_bytes": len(payload),
    }


def _body(payload: bytes) -> bytes | None:
    """Payload body for the transform passes, or None when the payload
    has no parsable header (the quarantine contract: transforms DROP
    corrupt payloads; extract_metadata is where they stay visible).
    An unknown magic with a complete header passes through — the byte
    transforms are format-agnostic; format validation is the decode
    seam's job (extract_metadata/resize)."""
    if payload is None or len(payload) < 8:
        return None
    if payload[:4] == b"IMG1" and (
        not payload[4:8].isdigit() or int(payload[4:8]) == 0
    ):
        return None  # IMG1 header with garbled/zero width: corrupt
    return payload[8:]


def extract_metadata(
    with_payloads: DataFrame, codec: Codec | None = None
) -> DataFrame:
    """Arrow-batched metadata extraction over mapInPandas. ``codec``
    swaps the payload parser (default: the synthetic IMG1 decoder) —
    the injection seam a real deployment uses for PIL/ffmpeg."""
    decode = decode_payload if codec is None else codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "fmt": [m["fmt"] for m in metas],
                    # nullable Int32 (not int32): quarantined payloads
                    # carry NULL geometry through the Arrow batch
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    # nullable Int64: a NULL payload reports n_bytes
                    # NULL (missing object ≠ zero-byte object)
                    "n_bytes": pd.array(
                        [m["n_bytes"] for m in metas], dtype="Int64"
                    ),
                }
            )

    return with_payloads.mapInPandas(run, schema=META_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, n_bytes long"


def resize_payloads(
    with_payloads: DataFrame, target_width: int, codec: Codec | None = None
) -> DataFrame:
    """'Resize' pass: re-wrap each payload at a new width (geometry-only —
    a real build swaps the body for PIL resize; batch flow identical).
    ``codec`` as in extract_metadata."""
    decode = decode_payload if codec is None else codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = decode(payload)
                if meta.get("width") is None:  # quarantine: drop
                    continue
                body_len = meta["n_bytes"] - 8
                rows.append(
                    (
                        doc_id,
                        target_width,
                        -(-body_len // target_width),
                        body_len + 8,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_bytes"]
            )

    return with_payloads.mapInPandas(run, schema=RESIZE_SCHEMA)


FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, n_space long, n_digit long, n_upper long"
)


def feature_extract(with_payloads: DataFrame) -> DataFrame:
    """Per-payload feature vector from the raw body bytes, computed
    vectorized in numpy per Arrow batch (a real build swaps the
    byte-class counts for CNN embeddings / MFCCs; the batch flow, schema
    and byte accounting stay).

    The chosen features are deliberately byte-exact under ANY utf-8
    content: 0x20/0x30-0x39/0x41-0x5A never occur inside multi-byte
    sequences, so byte-class counts equal character-class counts and the
    relational oracle can recompute them from the text."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = _body(payload)
                if body is None:  # quarantine: drop
                    continue
                b = np.frombuffer(body, dtype=np.uint8)
                rows.append(
                    (
                        doc_id,
                        int(b.size),
                        int((b == 0x20).sum()),
                        int(((b >= 0x30) & (b <= 0x39)).sum()),
                        int(((b >= 0x41) & (b <= 0x5A)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "n_space", "n_digit", "n_upper"],
            )

    return with_payloads.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_no int, frame_bytes long, frame_head string"
# frame_head is the first 8 frame BYTES hex-encoded (lowercase): byte-exact
# under any payload content. A decoded-text preview would split multi-byte
# utf-8 sequences at frame boundaries and diverge from any character-
# indexed relational recomputation.


def frame_sample(
    with_payloads: DataFrame, frame_size: int = 64, every: int = 4
) -> DataFrame:
    """'Video' frame sampling: treat the payload body as fixed-size frames,
    emit every k-th frame's offsets (one row per sampled frame). The stub
    emits frame geometry + a head preview instead of decoded pixels; the
    fan-out shape (1 payload → n frame rows) is the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = _body(payload)
                if body is None:  # quarantine: drop
                    continue
                n_frames = -(-len(body) // frame_size)
                for frame_no in range(0, n_frames, every):
                    chunk = body[
                        frame_no * frame_size: (frame_no + 1) * frame_size
                    ]
                    rows.append(
                        (
                            doc_id,
                            frame_no,
                            len(chunk),
                            chunk[:8].hex(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_no", "frame_bytes", "frame_head"],
            )

    return with_payloads.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, win_no int, n_samples int, sum_b long, sumsq_b long,"
    " max_b int"
)


def audio_window(
    with_payloads: DataFrame, window: int = 256
) -> DataFrame:
    """Audio-shaped windowed feature pass: treat the payload body as a
    u8 sample stream, frame it into fixed non-overlapping windows, and
    emit INTEGER energy statistics per window (count, Σv, Σv² — the
    sufficient statistics of RMS — and peak). A real build swaps the u8
    view for a PCM decode and the stats for MFCCs through the same
    batch flow; integer sums keep the stub exactly recomputable by the
    relational oracle from the text bytes (no float summation order to
    pin). Fan-out is 1 payload → ceil(bytes/window) rows — the same
    envelope as frame_sample."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = _body(payload)
                if body is None:  # quarantine: drop
                    continue
                b = np.frombuffer(body, dtype=np.uint8)
                for w in range(0, len(b), window):
                    c = b[w: w + window].astype(np.int64)
                    rows.append(
                        (
                            doc_id,
                            w // window,
                            int(c.size),
                            int(c.sum()),
                            int((c * c).sum()),
                            int(c.max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "win_no", "n_samples", "sum_b", "sumsq_b",
                    "max_b",
                ],
            )

    return with_payloads.mapInPandas(run, schema=AUDIO_SCHEMA)


SCENE_SCHEMA = "doc_id long, frame_no int, diff_sum long, is_cut boolean"

#: A frame-pair byte-delta above this is a scene cut. ASCII text bytes
#: average ~10 abs-delta per byte → ~640 per 64-byte frame; the value
#: only needs to be FIXED for the oracle, not tuned (a real build swaps
#: the metric for a perceptual distance through the same batch flow).
SCENE_CUT_THRESHOLD = 640


def scene_cut(
    with_payloads: DataFrame, frame: int = 64,
    threshold: int = SCENE_CUT_THRESHOLD,
) -> DataFrame:
    """Scene-change detection over frame sequences: consecutive
    ``frame``-byte frames are compared by summed per-byte absolute
    delta; a pair above ``threshold`` marks a cut. Emits one row per
    adjacent FULL-frame pair (trailing partial frames don't form a
    pair). Integer deltas keep the stub exactly recomputable by the
    relational oracle from the payload bytes — the same sufficient-
    statistics discipline as audio_window; a real build swaps the u8
    delta for a decoded-frame perceptual metric through the identical
    Arrow batch flow. Fan-out: 1 payload → (bytes // frame − 1) rows,
    O(bytes) work, no shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = _body(payload)
                if body is None:  # quarantine: drop
                    continue
                b = np.frombuffer(body, dtype=np.uint8)
                n_frames = len(b) // frame
                if n_frames < 2:
                    continue
                cur = b[: n_frames * frame].astype(np.int64).reshape(
                    n_frames, frame
                )
                diffs = np.abs(cur[1:] - cur[:-1]).sum(axis=1)
                for f, d in enumerate(diffs):
                    rows.append((doc_id, f, int(d), bool(d > threshold)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_no", "diff_sum", "is_cut"],
            )

    return with_payloads.mapInPandas(run, schema=SCENE_SCHEMA)


PHASH_SCHEMA = (
    "doc_id bigint, n_bytes int, mean_b int, phash bigint"
)


def phash64(
    with_payloads: DataFrame, width: int = 64
) -> DataFrame:
    """Perceptual average-hash over the payload body: the first
    ``width`` (≤64) body bytes are compared against the integer mean of
    that prefix; bit i is set when byte i exceeds the mean — the
    classic aHash reduced to its byte-domain skeleton. A real build
    decodes the image, resizes to 8×8 luma and thresholds against the
    mean through this IDENTICAL Arrow batch flow; the byte-domain stub
    keeps the hash exactly recomputable by the relational oracle from
    hex nibbles (integer compares only — no float, no resampling
    kernel to pin down).

    Fan-out: 1 payload → 1 row, O(width) work, no shuffle; downstream
    dup grouping is a hash-equality groupBy (a near-dup variant bands
    the 64 bits like SimHash — operators/dedup.py::simhash_pairs)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = _body(payload)
                if body is None:  # quarantine: drop
                    continue
                b = np.frombuffer(body, dtype=np.uint8)
                p = b[:width].astype(np.int64)
                if p.size == 0:
                    rows.append((doc_id, 0, 0, 0))
                    continue
                mean = int(p.sum()) // p.size  # integer floor mean
                h = 0
                for i, v in enumerate(p):
                    if int(v) > mean:
                        h |= 1 << i
                # keep the 64-bit pattern inside signed-long range the
                # same way both engines will: wrap at 2^63
                if h >= 1 << 63:
                    h -= 1 << 64
                rows.append((doc_id, int(p.size), mean, h))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "mean_b", "phash"]
            )

    return with_payloads.mapInPandas(run, schema=PHASH_SCHEMA)
