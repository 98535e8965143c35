"""Multimodal column plumbing for training-data pipelines (M6).

Beyond-reference capability (BASELINE.json north star): image/audio/
video payloads handled as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the DECODE step is
stubbed exactly as the task prescribes: ``decode_image`` raises
``NotImplementedError`` unless a real decoder (PIL) is importable,
while ``_fake_features`` is the deterministic stand-in the pipeline and
tests use. Everything AROUND the stub is real and tested: the binary
schema, the Arrow batch iteration, the output schema contract, and the
per-batch shape — swapping in a real decoder changes one function.

Scale posture (100 TB): mapInPandas streams Arrow record batches
through the Python worker — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size;
the binary column never materializes driver-side; feature extraction
parallelizes per-partition with zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from via_spark.session import load_table, spread

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_sha256 string, fake_width long, fake_height long"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, content binary, media struct) — the opaque
    payload column + typed metadata shape for multimodal tables."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col("text").cast("binary")).alias("n_bytes"),
        ).alias("media"),
    )


def decode_image(payload: bytes):
    """Real decode path — requires an image library the container lacks.

    STUB (clearly marked): raises unless PIL is importable; the
    deterministic fake below is used by the pipeline instead.
    """
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not present in this "
            "container — pipeline uses deterministic fake features"
        ) from exc


def _fake_features(doc_id: int, payload: bytes) -> tuple:
    """Deterministic decode stand-in: pure arithmetic on the bytes."""
    n = len(payload)
    return (
        doc_id,
        n,
        hashlib.sha256(payload).hexdigest(),
        n % 640 + 1,
        (n * 31) % 480 + 1,
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [_fake_features(int(i), bytes(c)) for i, c in zip(pdf["doc_id"], pdf["content"])]
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_bytes", "content_sha256", "fake_width", "fake_height"]
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched feature extraction (mapInPandas).

    Oracle-checked: the fake features are pure functions of the bytes,
    so DuckDB recomputes them from the text directly.
    """
    # gated spread to session parallelism: Spark reuses Python workers,
    # so the old fewer/larger-Arrow-batches tuning (spread to 8) lost at
    # BOTH scales when re-measured in r13 (sf0.1 dhash 0.73 -> 0.50 s,
    # 100x 9.3 -> 5.9 s); an already-parallel scan keeps its
    # partitioning either way
    d = spread(load_table(spark, sf_dir, "documents"))
    payloads = with_binary_payload(d).select("doc_id", "content")
    return payloads.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def sample_frame_indices(n_bytes: int, n_frames: int = 4) -> list[int]:
    """Video frame-sampling stub: evenly spaced indices over a fake
    duration derived from the payload size (deterministic)."""
    duration = n_bytes % 120 + 1
    k = min(n_frames, duration)
    return [i * duration // k for i in range(k)]


FRAME_SCHEMA = "doc_id long, frame_index long, frame_offset long, n_frames long"


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for i, c in zip(pdf["doc_id"], pdf["content"]):
            offsets = sample_frame_indices(len(bytes(c)))
            out.extend(
                (int(i), j, off, len(offsets)) for j, off in enumerate(offsets)
            )
        yield pd.DataFrame(
            out, columns=["doc_id", "frame_index", "frame_offset", "n_frames"]
        )


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as an N:M Arrow stage: each 'video' payload
    explodes into one row per sampled frame (evenly spaced offsets over
    the payload's fake duration) — the mapInPandas shape where output
    rows ≠ input rows, which ``explode`` alone cannot express when the
    per-row fan-out needs imperative decode logic.

    The real decoder would read container metadata and emit frame
    bytes; the stub derives offsets arithmetically from the payload
    size, so the oracle recomputes the exact rows in SQL. The Spark
    plumbing (binary column in, Arrow batches through the Python
    worker, typed multi-row output) is the production path unchanged.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    payloads = with_binary_payload(d).select("doc_id", "content")
    return payloads.mapInPandas(_frame_batches, schema=FRAME_SCHEMA)


THUMB_BOX = 64


def multimodal_resize_plan(
    spark: SparkSession, sf_dir: str, box: int = THUMB_BOX
) -> DataFrame:
    """Aspect-fit RESIZE planning over the decoded dimensions — the
    thumbnail box computation every image pipeline runs before the
    pixel op. The pixel resample itself sits behind the same decode
    stub as decode_image (no image library in this container); the
    Spark-side plumbing is the real contract: payload → Arrow-batched
    decode (mapInPandas, same stage as multimodal_features) → pure
    integer aspect-fit arithmetic in native columns.

    new_dim = max(1, (dim · box) div max(width, height)) — the longest
    side lands exactly on ``box``, aspect ratio preserved, all 64-bit
    integer division (no float scale factor to diverge on).
    """
    feats = multimodal_features(spark, sf_dir).select(
        "doc_id", "fake_width", "fake_height"
    )
    longest = F.greatest("fake_width", "fake_height")
    return feats.select(
        "doc_id",
        "fake_width",
        "fake_height",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(fake_width * {int(box)}L) div greatest(fake_width, fake_height)"),
        ).alias("thumb_width"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(fake_height * {int(box)}L) div greatest(fake_width, fake_height)"),
        ).alias("thumb_height"),
    )


DHASH_GRID_ROWS = 8    # dHash reads an 8x9 grayscale grid -> 64 gradient bits
DHASH_GRID_COLS = 9
PHASH_MAX_HAMMING = 3  # 4x16-bit blocks are pigeonhole-complete to Hamming 3


def dhash64(payload: bytes) -> int:
    """Difference-hash over the deterministic decode stand-in.

    Real pipeline: decode → grayscale → resize to 9×8 → bit(r,c) =
    1 iff pixel(r,c+1) > pixel(r,c) (the standard dHash). Container has
    no image library, so the "grayscale grid" is the same class of
    decode stub as ``_fake_features``: cell j = sum of payload bytes in
    the j-th of 72 equal byte ranges — pure arithmetic the oracle can
    recompute, with real dHash's structure (adjacent-cell gradients)
    preserved so near-identical payloads land within small Hamming
    distance. Swapping in PIL changes only the grid source.
    """
    n = len(payload)
    cells = [
        sum(payload[j * n // 72 : (j + 1) * n // 72])
        for j in range(DHASH_GRID_ROWS * DHASH_GRID_COLS)
    ]
    h = 0
    for r in range(DHASH_GRID_ROWS):
        for c in range(DHASH_GRID_COLS - 1):
            h = (h << 1) | (1 if cells[r * 9 + c + 1] > cells[r * 9 + c] else 0)
    return h - (1 << 64) if h >= (1 << 63) else h  # wrap to signed i64


DHASH_SCHEMA = "doc_id long, dhash long"


def _dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "dhash": [dhash64(bytes(c)) for c in pdf["content"]],
            }
        )


def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash per payload: binary column → Arrow-batched dHash
    (same mapInPandas decode stage as ``multimodal_features``)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    payloads = with_binary_payload(d).select("doc_id", "content")
    return payloads.mapInPandas(_dhash_batches, schema=DHASH_SCHEMA)


def phash_dup_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Perceptual-hash image dedup (oracle ✔): document pairs whose
    64-bit dHash fingerprints sit within Hamming ``max_hamming`` —
    the byte-payload completion of the multimodal story (near-identical
    images re-encoded, resized, or lightly edited hash to nearby
    fingerprints; text payloads stand in for pixels here exactly as in
    ``multimodal_features``).

    Candidate generation reuses the SimHash machinery's generalized
    pigeonhole (``dedup.hamming_block_keys``, r11): any pair within
    Hamming 3 leaves ≥ 3 of 6 blocks intact, so an equi-join on every
    triple-of-blocks key is EXACTLY complete — never an all-pairs
    product. Verify = one xor + popcount on the packed 64-bit hash.
    (The previous 4×16-bit single-block join was equally complete but
    its key space was FIXED — per-key occupancy grew with the corpus
    and the r11 100× store probe measured the resulting quadratic
    candidate volume; the ~32-bit triple keys keep occupancy ≪ 1.)

    Scale posture (100 TB): the expensive stage (decode + hash) is one
    linear Arrow pass; candidates are a 20-probe explode + equi-join a
    shuffle-on-key join AQE can skew-split; the hash frame is cached
    because both join sides reuse it (at cluster scale: a persisted
    fingerprint table, computed once).
    """
    hashed = image_dhash(spark, sf_dir).cache()
    return phash_pairs_over(hashed, max_hamming)


def phash_pairs_over(
    hashed: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """:func:`phash_dup_pairs` over a caller-supplied (doc_id, dhash)
    frame — the cluster-store builder passes its exact-duplicate-
    collapsed representative set through the identical plan
    (graph.phash_clusters_compute). Exactly-once emission via the
    canonical-triple filter (``dedup.hamming_pairs_over``) — no
    post-join distinct shuffle."""
    from via_spark.operators.dedup import hamming_pairs_over

    return hamming_pairs_over(hashed, "dhash", max_hamming)


AUDIO_WIN_MS = 400     # analysis window
AUDIO_HOP_MS = 200     # 50% overlap
AUDIO_SEG_SCHEMA = (
    "doc_id long, seg_index long, start_ms long, end_ms long, n_segments long"
)


def audio_duration_ms(n_bytes: int) -> int:
    """Audio decode stub (same class as ``_fake_features`` /
    ``sample_frame_indices``): deterministic fake duration derived from
    the payload size — a real decoder reads the container header. Kept
    a named function so swapping in a real probe changes one place."""
    return n_bytes * 7 % 9000 + 500  # 0.5 .. 9.5 s


def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for i, c in zip(pdf["doc_id"], pdf["content"]):
            dur = audio_duration_ms(len(bytes(c)))
            # hop-spaced windows, clamped at the tail (standard STFT
            # framing with a final partial window when any audio remains)
            n = max(1, (dur - 1) // AUDIO_HOP_MS + 1)
            starts = [j * AUDIO_HOP_MS for j in range(n) if j * AUDIO_HOP_MS < dur]
            out.extend(
                (int(i), j, st, min(st + AUDIO_WIN_MS, dur), len(starts))
                for j, st in enumerate(starts)
            )
        yield pd.DataFrame(
            out, columns=["doc_id", "seg_index", "start_ms", "end_ms", "n_segments"]
        )


def audio_segment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation as an N:M Arrow stage (oracle ✔) — the third
    modality next to ``multimodal_features`` (image) and
    ``video_frame_sample`` (video): each 'audio' payload explodes into
    hop-spaced overlapping analysis windows (400 ms window, 200 ms hop,
    tail window clamped to the clip) — the framing every downstream
    feature extractor (fbank, VAD, diarization) consumes. The decode
    stub derives the duration arithmetically from the payload so the
    oracle recomputes the exact rows; the Spark plumbing (binary column
    in, Arrow batches through the Python worker, typed multi-row
    output) is the production path unchanged.

    Scale posture: one linear mapInPandas pass, output rows bounded by
    duration/hop per clip, zero shuffle.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    payloads = with_binary_payload(d).select("doc_id", "content")
    return payloads.mapInPandas(_segment_batches, schema=AUDIO_SEG_SCHEMA)
