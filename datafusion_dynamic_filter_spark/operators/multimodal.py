"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (documented stub) — but everything Spark-side is real
and tested: binary column construction, schema, batch iteration, UDF
signatures, partitioning.  Swapping ``_fake_decode`` for PIL/librosa is a
one-function change that does not touch the distributed plumbing.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from ..functions import fan_out
from ..registry import query, tables


def _fake_decode(payload: bytes) -> dict:
    """STUB decode: derives deterministic pseudo-metadata from the payload
    bytes (stands in for an image decoder; see module docstring)."""
    digest = hashlib.md5(payload).hexdigest()
    return {
        "width": 64 + (ord(digest[0]) % 16),
        "height": 64 + (ord(digest[1]) % 16),
        "channels": 3,
    }


def binary_documents(spark, sf_dir):
    """documents.text re-encoded as an opaque binary payload column +
    typed metadata — the shape of a real multimodal table."""
    t = tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("language"),
            F.octet_length("text").alias("n_bytes"),
        ).alias("meta"),
    )


@query(
    "multimodal_decode_stats",
    oracle="""
    SELECT doc_id,
    CAST(strlen(text) AS BIGINT) AS n_bytes,
    CAST(64 + (ascii(substr(md5(text), 1, 1)) % 16) AS BIGINT) AS width,
    CAST(64 + (ascii(substr(md5(text), 2, 1)) % 16) AS BIGINT) AS height
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_decode_stats(spark, sf_dir):
    """Decode-stub pipeline: binary payloads -> mapInPandas batches ->
    per-item metadata.  The oracle reproduces the deterministic fake decode
    arithmetic, validating the whole Arrow round-trip."""
    bin_docs = binary_documents(spark, sf_dir)

    def decode(batches):
        for pdf in batches:
            meta = pdf["payload"].map(lambda b: _fake_decode(bytes(b)))
            out = pd.DataFrame()
            out["doc_id"] = pdf["doc_id"]
            out["n_bytes"] = pdf["payload"].map(len)
            out["width"] = meta.map(lambda m: m["width"])
            out["height"] = meta.map(lambda m: m["height"])
            yield out

    return (
        bin_docs.select("doc_id", "payload")
        .mapInPandas(decode, "doc_id long, n_bytes long, width long, height long")
        .orderBy("doc_id")
    )


@query(
    "multimodal_resize_batch",
    oracle="""
    SELECT doc_id, 32 AS target_w, 32 AS target_h,
    md5('32:' || text) AS checksum
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_resize_batch(spark, sf_dir, *, target: int = 32):
    """Resize/feature-extract stage shape: batch in, batch out with new
    metadata; the pixel work is stubbed (no codec in container), the
    partition/batch mechanics are real."""
    bin_docs = binary_documents(spark, sf_dir)

    def resize(batches):
        for pdf in batches:
            out = pd.DataFrame()
            out["doc_id"] = pdf["doc_id"]
            out["target_w"] = target
            out["target_h"] = target
            # Stub: a real implementation decodes payload, resizes, and
            # re-encodes; we keep a deterministic checksum of the would-be
            # output so downstream joins/tests have a stable value.
            out["checksum"] = pdf["payload"].map(
                lambda b: hashlib.md5(b"%d:" % target + bytes(b)).hexdigest()
            )
            yield out

    return (
        fan_out(bin_docs.select("doc_id", "payload"))
        .mapInPandas(resize, "doc_id long, target_w int, target_h int, checksum string")
        .orderBy("doc_id")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH frames AS (
    SELECT doc_id, unnest(range(0, CAST(floor(strlen(text) / 50) AS BIGINT))) AS frame_idx
    FROM documents
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
    CAST(min(frame_idx) AS BIGINT) AS first_frame,
    CAST(max(frame_idx) AS BIGINT) AS last_frame
    FROM frames
    GROUP BY doc_id
    HAVING count(*) > 0
    ORDER BY doc_id
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling shape for video payloads: one row per sampled frame
    (here: one pseudo-frame per 50 payload bytes), then per-item stats.
    Demonstrates the explode-from-binary-metadata pattern that a real
    frame sampler (ffmpeg-backed) would follow."""
    bin_docs = binary_documents(spark, sf_dir)
    # Guard: Spark's sequence(0, -1) would generate a DESCENDING sequence
    # for sub-50-byte payloads; filter them out (oracle's HAVING does too).
    frames = bin_docs.filter(F.col("meta.n_bytes") >= 50).select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor(F.col("meta.n_bytes") / 50).cast("long") - 1,
            )
        ).alias("frame_idx"),
    )
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min("frame_idx").alias("first_frame"),
            F.max("frame_idx").alias("last_frame"),
        )
        .orderBy("doc_id")
    )


#: minimum distinct shingle features for a signature — the analog of a
#: decoder rejecting a sub-thumbnail image: with fewer features most pixel
#: buckets are empty and two unrelated sparse grids sit trivially close.
PHASH_MIN_FEATURES = 12
_PHASH_PX = 60  # pixel-grid cells == signature bits


def _phash_oracle(max_hamming: int = 3) -> str:
    from ..functions import (
        HASH_P,
        SHINGLE_K1,
        SHINGLE_K2,
        SHINGLE_K3,
        SIMHASH_CHUNK_BITS,
        SIMHASH_CHUNKS,
    )

    mask = (1 << SIMHASH_CHUNK_BITS) - 1
    px_cols = ", ".join(
        f"SUM(CASE WHEN hs % {_PHASH_PX} = {j} THEN hs % 256 ELSE 0 END) AS px{j}"
        for j in range(_PHASH_PX)
    )
    tot = " + ".join(f"px{j}" for j in range(_PHASH_PX))
    sig = " + ".join(
        f"(CASE WHEN px{j} * {_PHASH_PX} > tot THEN (1::BIGINT << {j}) "
        f"ELSE 0::BIGINT END)"
        for j in range(_PHASH_PX)
    )
    return f"""
    WITH tok AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk FROM documents
    ), hw AS (
    SELECT doc_id,
    list_transform(tk, w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {HASH_P}) AS hws
    FROM tok WHERE len(tk) >= 3
    ), sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(hws) - 1),
    i -> xor(xor(hws[i] * {SHINGLE_K1}, hws[i+1] * {SHINGLE_K2}),
    hws[i+2] * {SHINGLE_K3})))) AS hs
    FROM hw
    ), px AS (
    SELECT doc_id, count(*) AS n_sh, {px_cols} FROM sh GROUP BY doc_id
    ), f AS (
    SELECT *, ({tot}) AS tot FROM px WHERE n_sh >= {PHASH_MIN_FEATURES}
    ), sigs AS (
    SELECT doc_id, ({sig}) AS sig FROM f
    ), chunks AS (
    SELECT doc_id, sig, r.c AS chunk_idx,
    (sig >> ({SIMHASH_CHUNK_BITS} * r.c)) & {mask} AS chunk
    FROM sigs CROSS JOIN range({SIMHASH_CHUNKS}) r(c)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    ORDER BY doc_a, doc_b
    """


@query("multimodal_phash_dedup", oracle=_phash_oracle())
def multimodal_phash_dedup(spark, sf_dir, *, max_hamming: int = 3):
    """Image near-dup by perceptual hash — the standard image-dedup stage
    of a multimodal training pipeline: decode, downsample to a tiny
    grayscale grid (60 cells), average-hash it (bit i = pixel i above the
    image mean, computed integer-exact as px_i * 60 > sum(px)), then pair
    images whose 60-bit signatures sit within Hamming distance 3 via the
    same chunk-pigeonhole equi-join the text SimHash uses (any pair within
    distance 3 shares one of 4 15-bit chunks).

    The DECODE is the documented stub (no codecs in this container), but a
    LOCALITY-SENSITIVE one: 'pixels' are a 60-bucket histogram of the
    payload's distinct word-3-gram shingle hashes (bucket = hash % 60,
    intensity = sum of hash % 256) — near-identical payloads share most
    shingles, hence most pixels, hence land within small Hamming distance,
    exactly the property a real decoder + downsample gives near-identical
    images.  The r5 scheme (pixels = md5 bytes of the WHOLE payload)
    destroyed that locality — only byte-exact payloads ever paired, which
    made the sf0.01 parity gate vacuous (0 rows on both engines, r5
    verdict).  Measured now: the corpus Hamming distribution is cleanly
    bimodal (near-dups at 0-3, unrelated mass at 11+), giving 24 pairs at
    sf0.01 and 235 at sf0.1 — non-vacuous and output-bounded.  Signatures
    need >= PHASH_MIN_FEATURES distinct shingles (a decoder rejecting
    sub-thumbnail inputs): sparse grids would make unrelated docs
    trivially close.  Swapping in a real decoder + DCT (pHash proper)
    changes only the pixel source.

    Scale shape (r13 rework): the signature is computed MAP-SIDE by the
    md5-exact Arrow kernel (functions.md5_phash_kernel_udf — same
    per-word md5 via hashlib, same shingle mix, same integer histogram
    and bit rule, memoized per unique word), so the whole decode ->
    downsample -> average-hash front end is one pass with NO shuffle;
    the 1-long-per-doc signature relation is persisted and feeds BOTH
    sides of the chunk-pigeonhole equi-join.  The r12 form paid two
    word/shingle-level doc_id exchanges (positional word collect, then
    the 60-column conditional-sum histogram aggregation) and — because
    the self-join recomputes each side — paid them TWICE per run
    (measured 4.6 s at sf0.1; the executed plan showed the full
    signature subtree duplicated under the candidate join's broadcast
    side).  Candidate generation is unchanged: the chunk equi-join with
    exact Hamming riding in the join condition.  No all-pairs anywhere."""
    from ..functions import (
        SIMHASH_CHUNK_BITS,
        SIMHASH_CHUNKS,
        first_equal_chunk,
        hamming64,
        md5_phash_kernel_udf,
        tokens,
    )
    from ..registry import track_persist

    t = tables(spark, sf_dir)
    toked = fan_out(t["documents"]).select(
        "doc_id", tokens("text").alias("tok")
    )
    # asNondeterministic: the isNotNull filter on the kernel's output
    # column otherwise makes the optimizer evaluate the UDF twice — once
    # below the pushed-down filter and once in the surviving projection
    # (two ArrowEvalPython nodes in the executed plan; the function is in
    # fact deterministic, the marker only pins it in place).
    kern = md5_phash_kernel_udf(_PHASH_PX, PHASH_MIN_FEATURES).asNondeterministic()
    sigs = track_persist(
        toked.select("doc_id", kern("tok").alias("sig")).where(
            F.col("sig").isNotNull()
        )
    )
    mask = (1 << SIMHASH_CHUNK_BITS) - 1
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", SIMHASH_CHUNK_BITS * c)
                    .bitwiseAND(F.lit(mask).cast("long"))
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = hamming64(F.col("a.sig"), F.col("b.sig"))
    # r13: pairs are distinct by construction — each pair is kept exactly
    # at its FIRST shared chunk (first_equal_chunk in the join condition),
    # replacing the dropDuplicates exchange over the pair relation
    # (same-session A/B at sf0.1: min 0.83 -> 0.77 s, 235 rows byte-equal;
    # the simhash twin's rationale, see dedup._simhash_pairs).
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (ham <= max_hamming)
            & (
                F.col("a.chunk_idx")
                == first_equal_chunk(F.col("a.sig"), F.col("b.sig"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "multimodal_audio_window_energy",
    oracle="""
    WITH bytes AS (
    SELECT doc_id, i,
    CAST(concat('0x', substr(hex(encode(text)), CAST(2 * i + 1 AS INT), 2)) AS INT) AS v
    FROM documents, unnest(range(0, octet_length(encode(text)))) AS t(i)
    ), w AS (
    SELECT doc_id, i // 25 AS widx,
    sum(v * v) AS energy
    FROM bytes GROUP BY 1, 2 HAVING count(*) = 25
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
    CAST(sum(energy) AS BIGINT) AS total_energy,
    CAST(max(energy) AS BIGINT) AS peak_energy
    FROM w GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_audio_window_energy(spark, sf_dir):
    """Audio-pipeline shape: treat the payload as a PCM-like uint8 sample
    stream, frame it into fixed 25-sample windows (trailing partial window
    dropped), and report per-clip window count + total/peak energy.  This
    is the framing+energy front end of any audio featurizer (VAD, MFCC);
    the numbers are integer-exact so the DuckDB oracle reproduces them
    byte-for-byte from the same text payload.

    The frame math runs as ONE numpy reshape per Arrow batch inside
    mapInPandas — no per-sample Python, no explode: a clip's samples never
    leave its row, so the only shuffle is the final orderBy.  A real
    implementation swaps np.frombuffer for the codec's decode and keeps
    the identical window arithmetic."""
    import numpy as np

    bin_docs = binary_documents(spark, sf_dir)

    def frame_energy(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = (len(a) // 25) * 25
                if n == 0:
                    continue
                w = a[:n].astype(np.int64).reshape(-1, 25)
                energy = (w * w).sum(axis=1)
                rows.append(
                    (doc_id, len(energy), int(energy.sum()), int(energy.max()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_windows", "total_energy", "peak_energy"]
            )

    return (
        fan_out(bin_docs.select("doc_id", "payload"))
        .mapInPandas(
            frame_energy,
            "doc_id long, n_windows long, total_energy long, peak_energy long",
        )
        .orderBy("doc_id")
    )
