"""SimilarAligner — host-side alignment of short, highly similar segments.

Equivalent of the reference's internal ``SimilarAligner``
(``src/algo/SimilarAligner.cpp`` ⚠[B], SURVEY.md §2.3): the default aligner
for NPGe's high-identity use case. The strategy here mirrors it at small
scale: Needleman-Wunsch with linear gaps for short segments (the pieces
between anchored columns — bounded by MAX_JOIN_GAP), and progressive
consensus-anchored merging for multi-fragment segments. Deterministic
tie-breaking: diagonal > up (gap in b) > left (gap in a).

Long/batched pairwise alignment belongs to the Pallas SW kernel
(ops/sw.py); this module is the O(small) host fallback the pipeline uses for
gap patches, exactly where the reference used its internal DP.
"""

from __future__ import annotations

import numpy as np

from npge_tpu.util import codes as C


def nw_align(a: np.ndarray, b: np.ndarray, match=1, mismatch=-2, gap=-3):
    """Global alignment of two code arrays. Returns (row_a, row_b) uint8
    arrays of equal length with GAP fills."""
    n, m = len(a), len(b)
    H = np.zeros((n + 1, m + 1), np.int64)
    H[:, 0] = np.arange(n + 1) * gap
    H[0, :] = np.arange(m + 1) * gap
    jj = np.arange(1, m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        sub = np.where(a[i - 1] == b, match, mismatch)
        row_prev = H[i - 1]
        # A[j] = best of diag/up moves; the left-gap recurrence
        # H[i,j] = max(A[j], H[i,j-1]+gap) unrolls to a prefix max:
        # H[i,j] = j*gap + max_{k<=j} (A'[k] - k*gap), A'[0] = H[i,0]
        A = np.maximum(row_prev[:-1] + sub, row_prev[1:] + gap)
        B = np.empty(m + 1, np.int64)
        B[0] = H[i, 0]
        B[1:] = A - jj * gap
        H[i, 1:] = jj * gap + np.maximum.accumulate(B)[1:]
    # traceback (diag > up > left)
    ra, rb = [], []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and H[i, j] == H[i - 1, j - 1] + (
            match if a[i - 1] == b[j - 1] else mismatch
        ):
            ra.append(a[i - 1])
            rb.append(b[j - 1])
            i -= 1
            j -= 1
        elif i > 0 and H[i, j] == H[i - 1, j] + gap:
            ra.append(a[i - 1])
            rb.append(C.GAP)
            i -= 1
        else:
            ra.append(C.GAP)
            rb.append(b[j - 1])
            j -= 1
    return (
        np.array(ra[::-1], np.uint8),
        np.array(rb[::-1], np.uint8),
    )


def _merge_into(profile_rows: list[np.ndarray], seg: np.ndarray,
                match=1, mismatch=-2, gap=-3) -> list[np.ndarray]:
    """Align seg against the profile consensus and merge, expanding all
    existing rows where seg introduces new columns."""
    if not profile_rows:
        return [np.asarray(seg, np.uint8)]
    prof = np.stack(profile_rows)
    # consensus of profile: most frequent real base per column, N if none
    counts = np.stack([(prof == x).sum(axis=0) for x in range(C.N_REAL_BASES)])
    cons = counts.argmax(axis=0).astype(np.uint8)
    cons = np.where(counts.max(axis=0) > 0, cons, np.uint8(C.N))
    rc, rs = nw_align(cons, np.asarray(seg, np.uint8), match, mismatch, gap)
    out_rows = []
    for row in profile_rows:
        new = np.full(len(rc), C.GAP, np.uint8)
        new[rc != C.GAP] = row
        out_rows.append(new)
    new_seg = np.asarray(rs, np.uint8)
    out_rows.append(new_seg)
    return out_rows


def msa_short(segments: list[np.ndarray], match=1, mismatch=-2, gap=-3) -> np.ndarray:
    """Progressive MSA of short segments (consensus-anchored, deterministic
    order: longest segment first, ties by input index). Returns a
    [len(segments), n_cols] uint8 matrix; all-empty input gives width 0."""
    order = sorted(
        range(len(segments)), key=lambda i: (-len(segments[i]), i)
    )
    rows: list[np.ndarray] = []
    for idx in order:
        rows = _merge_into(rows, segments[idx], match, mismatch, gap)
    width = len(rows[0]) if rows else 0
    out = np.full((len(segments), width), C.GAP, np.uint8)
    for pos, idx in enumerate(order):
        out[idx] = rows[pos]
    return out
