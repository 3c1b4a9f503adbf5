"""Multimodal column plumbing: opaque binary payloads + typed metadata.

LLM-data-pipeline surface for image/audio/video columns (absent from the
reference repo). The *Spark-side* contract is fully real — binary
columns, explicit schemas, Arrow-batched ``mapInPandas`` with 1→1 and
1→N row shapes, partition-preserving plans. Dimension extraction is
REAL for real image bytes: ``_decode_real`` parses PNG IHDR / JPEG SOF
headers in pure Python (no image libraries needed). Full pixel decode
(which genuinely requires libjpeg/PIL, absent from this container)
falls back to a clearly-marked deterministic fake (md5-derived
dimensions) for non-image payloads such as the synthetic corpus; a
later PIL swap-in changes one function, not the plumbing.

Design for 100 TB: decode is the expensive step, so it runs inside
``mapInPandas`` (Arrow batch transfer, one Python worker per core, no
driver involvement); everything before/after stays JVM-side. Payload
rows are wide → keep ``spark.sql.files.maxPartitionBytes`` modest so a
batch of decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_etl_pipeline_spark.plans.registry import register, table

if TYPE_CHECKING:
    import pandas as pd

FRAME_BYTES = 64  # fixed "frame" size for the sampler

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload: binary, mime): the multimodal shape.

    Stands in for reading real image/audio bytes; the binary column and
    typed metadata are exactly what a production table would carry.
    NULL-source rows (no bytes to decode — a guaranteed row class at
    100-TB ingest, surfaced by the round-8 null-injection sweep) are
    dropped HERE, the family's single ingest gate, so every downstream
    worker sees a non-null payload and every oracle mirrors the same
    absent-row semantics with a ``text IS NOT NULL``-equivalent guard.
    A no-op on clean corpora. The Arrow workers still guard
    ``payload is None`` defensively — the operators stay total for
    callers that bypass this gate.
    """
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: JPEG start-of-frame markers (baseline/extended/progressive/lossless
#: and their arithmetic variants) — NOT 0xC4 (DHT), 0xC8 (JPG ext),
#: 0xCC (DAC), which share the 0xC0 block but carry no dimensions.
JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _decode_real(payload: bytes) -> tuple[int, int]:
    """REAL image-dimension decode, pure Python, zero dependencies:
    parses the PNG IHDR chunk or walks JPEG marker segments to the SOF
    frame header. No pixel decode (that genuinely needs libjpeg/zlib) —
    but width/height extraction, the common metadata pass of a
    multimodal pipeline, is exact for real image bytes.

    Raises ``ValueError`` for anything that is not a PNG/JPEG stream;
    callers fall back to the deterministic fake for synthetic payloads.
    """
    if (
        payload.startswith(PNG_SIGNATURE)
        and len(payload) >= 24
        and payload[12:16] == b"IHDR"
    ):
        # 8-byte signature, 4-byte chunk length, 'IHDR', then
        # big-endian 4-byte width and height (PNG spec 11.2.2)
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        return width, height
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i, n = 2, len(payload)
        while i + 1 < n and payload[i] == 0xFF:
            # Runs of 0xFF are legal fill/padding before a marker
            # (ITU T.81 B.1.1.2) — skip them before classifying, or a
            # pad byte reads as a marker and the next two bytes as a
            # bogus segment length.
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI mid-stream: terminator, no SOF
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            if marker in JPEG_SOF_MARKERS:
                if i + 9 > n:
                    break  # truncated SOF segment
                # segment: len(2) precision(1) height(2) width(2)
                height = int.from_bytes(payload[i + 5 : i + 7], "big")
                width = int.from_bytes(payload[i + 7 : i + 9], "big")
                return width, height
            if i + 4 > n:
                break  # truncated segment header
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        raise ValueError("JPEG stream without a SOF frame header")
    raise ValueError("not a PNG or JPEG payload")


def _decode(payload: bytes) -> tuple[int, int]:
    """Real header parse when the payload IS an image; deterministic
    fake otherwise (the synthetic corpus carries utf-8 text payloads)."""
    try:
        return _decode_real(payload)
    except ValueError:
        return _decode_fake(payload)


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic FAKE decode: dimensions derived from content md5.

    Marked fake on purpose — it keeps the full Arrow/mapInPandas path
    executable and oracle-checkable without native decoders. The hash
    is taken over the UPPERCASE HEX rendering of the bytes (2 chars
    per byte — the ``mm_audio_window`` contract): a 1:1 encoding of
    the payload, chosen because DuckDB's md5 cannot hash BLOBs, so
    the oracle mirrors it with ``md5(hex(encode(text)))``. With real
    decoders this whole function is replaced anyway.
    """
    h = hashlib.md5(payload.hex().upper().encode()).hexdigest()
    return int(h[:2], 16) % 512 + 16, int(h[2:4], 16) % 512 + 16


def decode_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched 1→1 decode: one feature row per payload row."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                w, h = _decode(data)
                rows.append(
                    (
                        int(doc_id),
                        len(data),
                        data[0] if data else None,
                        # hash-the-hex contract (see _decode_fake)
                        hashlib.md5(
                            data.hex().upper().encode()
                        ).hexdigest(),
                        w,
                        h,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])

    return payloads.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(payloads: DataFrame) -> DataFrame:
    """Arrow-batched 1→N frame sampler: fixed-size chunks per payload.

    The video-pipeline shape: each input row fans out to ceil(n/64)
    frame rows inside the worker — no explode shuffle, no driver data.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for i in range(0, len(data), FRAME_BYTES):
                    frame = data[i : i + FRAME_BYTES]
                    rows.append(
                        (
                            int(doc_id),
                            i // FRAME_BYTES,
                            # hash-the-hex contract (see _decode_fake)
                            hashlib.md5(
                                frame.hex().upper().encode()
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return payloads.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_TARGET_BYTES = 96  # "thumbnail" size for the fake resizer

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_payload(payloads: DataFrame) -> DataFrame:
    """Arrow-batched 1→1 resize: downsample each payload to ≤ TARGET
    bytes by taking every ``stride``-th byte (stride = ceil(n/target)).

    The real-world twin is thumbnailing / audio downsampling: payload
    in, smaller payload out, same row count. Byte-stride subsampling is
    the deterministic stand-in (the fake-decoder policy documented in
    the module docstring); swapping in PIL's ``Image.resize`` changes
    only the loop body — schema, batching, and partitioning stay.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                stride = max(1, -(-len(data) // RESIZE_TARGET_BYTES))
                small = data[::stride]
                rows.append(
                    (
                        int(doc_id),
                        len(data),
                        len(small),
                        # hash-the-hex contract (see _decode_fake)
                        hashlib.md5(
                            small.hex().upper().encode()
                        ).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return payloads.mapInPandas(batches, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Registered queries. Every oracle does TRUE BYTE math over
# hex(encode(text)) — 2 hex chars per byte — never char math over the
# text: on non-ASCII corpora (the round-8 unicode sweep) character
# offsets and byte offsets diverge, and the payloads ARE bytes.
# ---------------------------------------------------------------------------


@register(
    "mm_decode_features",
    oracle="""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           TRY_CAST(('0x' || substr(hx, 1, 2)) AS INTEGER) AS first_byte,
           md5(hx) AS content_md5,
           CAST(('0x' || substr(md5(hx), 1, 2)) AS INTEGER) % 512 + 16 AS width,
           CAST(('0x' || substr(md5(hx), 3, 2)) AS INTEGER) % 512 + 16 AS height
    FROM p
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → decoded feature row via mapInPandas (fake
    decoder; real plumbing — schema, Arrow batches, partition-local)."""
    docs = table(spark, sf_dir, "documents")
    return decode_features(attach_payload(docs))


#: Byte-true frame decomposition shared by ``mm_frame_sample`` and
#: ``mm_frame_dedup`` (one definition, so the two oracles cannot drift):
#: every payload split into {FRAME_BYTES}-byte frames, each frame
#: hashed via the hex contract.
#: Frame chunks come from ``regexp_extract_all(hx, '.{{1,N}}')`` —
#: one linear pass per payload — NOT from positional
#: ``substr(hx, frame_idx*N + 1, N)``: DuckDB's VARCHAR substr is
#: CHARACTER-indexed (an O(position) UTF-8 boundary scan per call),
#: which makes per-index extraction over a megabyte hex rendering
#: superlinear (and outright quadratic at byte grain — the ``giant``
#: hostile corpus measured it as a hang in the impurity oracle).
#: ``p`` is ``AS MATERIALIZED`` so the hex rendering itself is
#: computed once per document, not re-inlined per consumer.
_FRAMES_HEX_CTE = f"""
    WITH p AS MATERIALIZED (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               regexp_extract_all(hx, '.{{1,{2 * FRAME_BYTES}}}')
                   AS chunks
        FROM p WHERE n > 0
    ),
    h AS (
        SELECT doc_id,
               generate_subscripts(chunks, 1) - 1 AS frame_idx,
               md5(unnest(chunks)) AS frame_md5
        FROM f
    )
"""


@register(
    "mm_frame_sample",
    oracle=f"""
    {_FRAMES_HEX_CTE}
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, frame_md5
    FROM h
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → fixed-size frame rows (1→N mapInPandas fan-out)."""
    docs = table(spark, sf_dir, "documents")
    return frame_sample(attach_payload(docs))


@register(
    "mm_resize",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               greatest(CAST(ceil(octet_length(encode(text))
                   / {RESIZE_TARGET_BYTES}.0) AS BIGINT), 1) AS stride
        FROM documents WHERE text IS NOT NULL
    ),
    r AS (
        -- COALESCE: a ZERO-byte payload (empty text cell) makes the
        -- upper bound -1 and DuckDB's generate_series yields NULL, so
        -- small_hx went NULL — NULL resized_bytes/md5 where the engine
        -- resizes an empty payload to an empty payload (0 bytes, md5
        -- of ''). Found by the random-corpus fuzzer
        -- (tools/stage_random.py seed 1); the driver corpus has no
        -- empty text cells.
        SELECT doc_id, n, stride,
               COALESCE(array_to_string(list_transform(
                   generate_series(0, CAST(ceil(n / CAST(stride AS DOUBLE)) AS BIGINT) - 1),
                   i -> substr(hx, CAST(i * stride AS INTEGER) * 2 + 1, 2)),
                   ''), '') AS small_hx
        FROM s
    )
    SELECT doc_id, n AS orig_bytes,
           CAST(length(small_hx) // 2 AS BIGINT) AS resized_bytes,
           md5(small_hx) AS resized_md5
    FROM r
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload resize/thumbnail (1→1 mapInPandas): each binary payload
    downsampled to ≤ {RESIZE_TARGET_BYTES} bytes by byte-stride (deterministic fake for
    an image resize — real plumbing, see ``resize_payload``)."""
    docs = table(spark, sf_dir, "documents")
    return resize_payload(attach_payload(docs))


# ---------------------------------------------------------------------------
# Audio-style fixed-window framing (1→N, overlap)
# ---------------------------------------------------------------------------

WINDOW_BYTES = 32
HOP_BYTES = 16

AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("win_md5", StringType()),
    ]
)


def audio_windows(payloads: DataFrame) -> DataFrame:
    """Overlapping fixed-size byte windows per payload — the audio
    framing primitive (spectrogram frames, VAD chunks) as a 1→N
    ``mapInPandas``: window size 32 bytes, hop 16 (50% overlap), only
    full windows emitted. Real audio swaps the md5 for an FFT/feature
    call; the Arrow batch shape, schema, and window arithmetic are the
    production plumbing. Zero shuffle — framing happens inside the scan
    partition.
    """

    def slice_windows(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                n = len(b)
                if n < WINDOW_BYTES:
                    continue
                for i in range((n - WINDOW_BYTES) // HOP_BYTES + 1):
                    w = b[i * HOP_BYTES : i * HOP_BYTES + WINDOW_BYTES]
                    ids.append(did)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(w.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "win_idx": idxs, "win_md5": hashes}
            )

    return payloads.mapInPandas(slice_windows, AUDIO_WINDOW_SCHEMA)


@register(
    "mm_audio_window",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    w AS (
        SELECT doc_id, hx,
               unnest(generate_series(0,
                   CAST((n - {WINDOW_BYTES}) // {HOP_BYTES} AS INT))) AS win_idx
        FROM p WHERE n >= {WINDOW_BYTES}
    )
    SELECT doc_id,
           CAST(win_idx AS INT) AS win_idx,
           md5(substr(hx, win_idx * {2 * HOP_BYTES} + 1,
               {2 * WINDOW_BYTES})) AS win_md5
    FROM w
    """,
)
def mm_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing over the synthetic payloads, hash-verified per
    window. The oracle frames the identical bytes by slicing the hex
    encoding (2 hex chars per byte — ASCII-safe under any text
    encoding), so every (doc, window) md5 must agree bit-for-bit with
    the Python-side slice — pinning window arithmetic, hop overlap,
    and the partial-window drop rule across engines.
    """
    docs = table(spark, sf_dir, "documents")
    return audio_windows(attach_payload(docs))


# ---------------------------------------------------------------------------
# Perceptual hashing (dHash) over binary payloads
# ---------------------------------------------------------------------------

#: 57 stride-samples -> 56 adjacent-gradient bits (fits signed bigint).
PHASH_SAMPLES = 57

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash(payloads: DataFrame) -> DataFrame:
    """Difference-hash (dHash) per payload: stride-sample
    ``PHASH_SAMPLES`` bytes, set bit i when sample i > sample i+1.

    The byte-domain stand-in for image dHash (which downscales to a
    9x8 grid and compares adjacent PIXELS — with real decode available,
    swap the sampler for the pixel grid and keep everything else): the
    hash survives local edits that leave most of the payload's coarse
    "gradient profile" intact, which cryptographic hashes by design do
    not. Arrow-batched ``mapInPandas``, partition-preserving, one pass.
    """

    def hash_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    continue
                stride = max(-(-n // PHASH_SAMPLES), 1)
                vals = [
                    b[min(i * stride, n - 1)] for i in range(PHASH_SAMPLES)
                ]
                ph = 0
                for i in range(PHASH_SAMPLES - 1):
                    if vals[i] > vals[i + 1]:
                        ph |= 1 << i
                ids.append(doc_id)
                hashes.append(ph)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return payloads.mapInPandas(hash_batches, PHASH_SCHEMA)


_PHASH_ORACLE = f"""
    WITH s AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               greatest(CAST(ceil(octet_length(encode(text))
                   / {PHASH_SAMPLES}.0) AS BIGINT), 1) AS stride
        FROM documents WHERE octet_length(encode(text)) > 0
    ),
    v AS (
        SELECT doc_id,
               list_transform(generate_series(0, {PHASH_SAMPLES - 1}),
                   i -> CAST(('0x' || substr(hx,
                       CAST(least(i * stride, n - 1) AS INTEGER) * 2 + 1, 2))
                       AS INTEGER)) AS vals
        FROM s
    ),
    h AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, {PHASH_SAMPLES - 1}),
                       i -> CASE WHEN vals[i] > vals[i + 1]
                                 THEN CAST(1 AS BIGINT) << (i - 1)
                                 ELSE CAST(0 AS BIGINT) END)),
                   (a, x) -> a | x) AS phash
        FROM v
    )
    SELECT doc_id, phash,
           COUNT(*) OVER (PARTITION BY phash) AS n_bucket
    FROM h
    """


@register("mm_phash_buckets", oracle=_PHASH_ORACLE)
def mm_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash table over the payload corpus, each row tagged
    with its hash-bucket population — the blocking stage of multimodal
    near-dup detection (identical dHash = re-encoded/trivially-edited
    copy candidate; hamming-close = near-dup, handled downstream
    exactly like :func:`~...dedup.dedup_simhash_pairs` byte-bands).

    Python computes ONLY the per-row hash (Arrow-batched, no shuffle);
    bucket sizes come from a JVM groupBy + broadcast join-back — the
    same no-Window shape the hyperplane-LSH bucket sizing uses (a
    corpus-wide count window would single-partition nothing here, but
    at 100 TB the join-back form lets AQE size each side honestly).
    """
    docs = table(spark, sf_dir, "documents")
    hashed = perceptual_hash(attach_payload(docs))
    buckets = hashed.groupBy("phash").agg(F.count(F.lit(1)).alias("n_bucket"))
    # No broadcast hint: near-unique hashes make the bucket table
    # corpus-sized, so AQE must pick the strategy (a forced broadcast
    # would collect the corpus to the driver at scale).
    return hashed.join(buckets, "phash").select("doc_id", "phash", "n_bucket")


# ---------------------------------------------------------------------------
# Byte-impurity corruption probe (log-free entropy proxy)
# ---------------------------------------------------------------------------

IMPURITY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("distinct_bytes", LongType()),
        StructField("impurity", DoubleType()),
    ]
)


def payload_impurity(payloads: DataFrame) -> DataFrame:
    """Arrow-batched 1→1 byte-level Gini impurity: 1 − Σ (c_b/n)².

    The corruption / padding / truncation probe of a multimodal ingest:
    well-compressed media bytes look near-uniform (impurity → 1),
    zero-padded or constant-filled payloads collapse toward 0 —
    a one-pass screen before expensive decode. Gini impurity is the
    LOG-FREE diversity measure (Shannon entropy's ln() is not
    bit-portable across libms; the ranking is equivalent), computed
    from EXACT integer byte counts with one double division on
    identical operands — hash-comparable across engines.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                n = len(data)
                if n == 0:
                    continue
                counts = np.bincount(
                    np.frombuffer(data, dtype=np.uint8), minlength=256
                )
                sumsq = int((counts.astype(np.int64) ** 2).sum())
                nd = float(n)
                rows.append(
                    (
                        int(doc_id),
                        n,
                        int((counts > 0).sum()),
                        1.0 - (float(sumsq) / (nd * nd)),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMPURITY_SCHEMA])

    return payloads.mapInPandas(batches, IMPURITY_SCHEMA)


@register(
    "mm_payload_impurity",
    oracle="""
    WITH s AS MATERIALIZED (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents WHERE octet_length(encode(text)) > 0
    ),
    -- bytes come from regexp_extract_all(hx, '..'), NOT from
    -- substr(hx, i*2+1, 2) in a per-index lateral: DuckDB's VARCHAR
    -- substr is CHARACTER-indexed, an O(position) UTF-8 boundary scan
    -- per call, which makes the per-byte explode O(len^2) — a
    -- measured hang on the giant hostile corpus's megabyte payloads.
    -- The regex pair-split is one linear pass per document.
    b AS (
        SELECT doc_id, unnest(regexp_extract_all(hx, '..')) AS byte
        FROM s
    ),
    c AS (
        SELECT doc_id, byte, COUNT(*) AS cnt
        FROM b GROUP BY doc_id, byte
    )
    SELECT c.doc_id,
           CAST(s.n AS BIGINT) AS n_bytes,
           CAST(COUNT(*) AS BIGINT) AS distinct_bytes,
           1.0 - (CAST(SUM(c.cnt * c.cnt) AS DOUBLE)
                  / (CAST(s.n AS DOUBLE) * CAST(s.n AS DOUBLE)))
               AS impurity
    FROM c JOIN s ON s.doc_id = c.doc_id
    GROUP BY c.doc_id, s.n
    """,
)
def mm_payload_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-impurity screen over the payload corpus (see
    :func:`payload_impurity`): Python computes only the per-row byte
    histogram inside Arrow batches — no shuffle, no driver data; the
    oracle replays the histogram byte-for-byte from the hex rendering
    of the same payload bytes, so the whole mapInPandas path is
    value-verified. At 100 TB this runs as a map-only pass colocated
    with the payload scan.
    """
    docs = table(spark, sf_dir, "documents")
    return payload_impurity(attach_payload(docs))


# ---------------------------------------------------------------------------
# Cross-document frame dedup (shared-segment detection)
# ---------------------------------------------------------------------------


@register(
    "mm_frame_dedup",
    oracle=f"""
    {_FRAMES_HEX_CTE}
    SELECT frame_md5,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM h
    GROUP BY frame_md5
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frames shared ACROSS documents (same {FRAME_BYTES}-byte content
    hash in >1 distinct payloads): the shared-segment detector — in a
    video corpus these are the repeated intros/outros/watermark
    sequences a storage dedup or a training pipeline should collapse
    once instead of learning N times. Composes the 1→N frame sampler
    (:func:`frame_sample`, Arrow mapInPandas) with one JVM hash
    aggregate on the frame hash; frames that never repeat drop in the
    HAVING, so the output is duplication-bounded, not corpus-bounded.
    """
    docs = table(spark, sf_dir, "documents")
    frames = frame_sample(attach_payload(docs))
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
    )
