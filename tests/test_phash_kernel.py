"""md5_phash_kernel_udf (r13) — the map-side replacement for
multimodal_phash_dedup's exploded signature pipeline — pinned against an
independent pure-Python (big-int) reference of the specification on
adversarial inputs.

The kernel's contract is BYTE-EXACTNESS with the r12 JVM form (and hence
the DuckDB oracle): same md5-based word hash (h60 % HASH_P), same
SHINGLE_K1/2/3 xor-of-products mix over consecutive word triples, same
distinct-set 60-bucket histogram (bucket = hs % 60, intensity = hs % 256),
same average-hash bit rule (px_j * 60 > sum(px)), NULL below the
min-features floor.  End-to-end parity at the driver SFs is covered by
tests/test_oracle_parity.py::multimodal_phash_dedup; this file covers the
kernel body directly, including shapes the small corpora never exercise.
"""

import hashlib

import numpy as np
import pandas as pd

from datafusion_dynamic_filter_spark.functions import (
    HASH_P,
    SHINGLE_K1,
    SHINGLE_K2,
    SHINGLE_K3,
    md5_phash_kernel_udf,
)
from datafusion_dynamic_filter_spark.operators.multimodal import (
    PHASH_MIN_FEATURES,
    _PHASH_PX,
)

MASK64 = (1 << 64) - 1


def _h60(w: str) -> int:
    return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)


def _ref_sig(tok):
    """Pure big-int reference: the phash signature of ONE token list, or
    None — arbitrary-precision arithmetic, no numpy, no vectorization."""
    if tok is None or len(tok) < 3:
        return None
    hws = [_h60(w) % HASH_P for w in tok]
    sh = [
        ((hws[i] * SHINGLE_K1) & MASK64)
        ^ ((hws[i + 1] * SHINGLE_K2) & MASK64)
        ^ ((hws[i + 2] * SHINGLE_K3) & MASK64)
        for i in range(len(hws) - 2)
    ]
    elems = sorted(set(sh))
    if len(elems) < PHASH_MIN_FEATURES:
        return None
    px = [0] * _PHASH_PX
    for h in elems:
        px[h % _PHASH_PX] += h % 256
    tot = sum(px)
    sig = 0
    for j in range(_PHASH_PX):
        if px[j] * _PHASH_PX > tot:
            sig |= 1 << j
    return sig


def _run_kernel(tok_lists):
    inner = md5_phash_kernel_udf(_PHASH_PX, PHASH_MIN_FEATURES).func
    out = inner(pd.Series(tok_lists, dtype=object))
    return [None if pd.isna(v) else int(v) for v in out]


ADVERSARIAL = [
    None,  # null token array (null text)
    [],  # empty array
    ["one"],  # < 3 words -> no shingles
    ["a", "b"],
    ["a", "b", "c"],  # 1 shingle < PHASH_MIN_FEATURES
    [""],  # empty-token artifact of tokens() on whitespace-only text
    ["", "x", "", "y", ""],  # empty tokens interleaved
    [f"w{i}" for i in range(40)],  # enough distinct shingles for a signature
    [f"w{i % 5}" for i in range(60)],  # heavy shingle repetition
    ["x"] * 50,  # one distinct shingle repeated
    ["héllo", "wörld", "ünïcode", "文字", "列", "テスト", "a", "b", "c"] * 4,
    [f"tok{i}" for i in range(13)],  # 11 shingles: just below the floor
    [f"tok{i}" for i in range(14)],  # 12 shingles: exactly at the floor
]


def test_phash_kernel_matches_pure_python_reference():
    got = _run_kernel(ADVERSARIAL)
    want = [_ref_sig(t) for t in ADVERSARIAL]
    assert got == want


def test_phash_kernel_handles_all_empty_batch():
    assert _run_kernel([None, [], ["a"]]) == [None, None, None]


def test_phash_kernel_signature_exceeds_float53():
    """Signatures use up to bit 59; the nullable-Int64 output path must
    not round-trip through float64 (which is exact only to 2^53).  Build
    a batch mixing a null row with a doc whose signature has high bits
    set and check exact integers come back."""
    rng = np.random.default_rng(20260817)
    # search a few random vocabularies for a signature above 2^53
    for attempt in range(200):
        tok = [f"d{attempt}_{i}" for i in rng.integers(0, 60, size=80)]
        ref = _ref_sig(list(tok))
        if ref is not None and ref > (1 << 53):
            break
    else:
        raise AssertionError("no high-bit signature found in 200 attempts")
    got = _run_kernel([None, list(tok), ["a", "b"]])
    assert got == [None, ref, None]
