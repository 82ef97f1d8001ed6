"""C++ native kernels vs NumPy fallbacks (bit-exact parity)."""

import numpy as np
import pytest

from npge_tpu import native
from npge_tpu.util import codes as C


def test_native_builds():
    assert native.have_native(), "g++ build of native/npge_native.cpp failed"


def test_encode_bytes_matches_python():
    data = b"ACGTNacgtnXx-\n>x"
    got = native.encode_bytes(data)
    want = C.encode(data)
    np.testing.assert_array_equal(got, want)


def test_fasta_encode():
    data = b">seq1 desc\nACGT\nacgt\n>seq2\nNNTT\n"
    res = native.fasta_encode(data)
    assert res is not None
    headers, codes, offsets = res
    assert headers == ["seq1", "seq2"]
    assert offsets.tolist() == [0, 8, 12]
    assert C.decode(codes[:8]) == "ACGTACGT"
    assert C.decode(codes[8:]) == "NNTT"


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, 1000).astype(np.uint8)
    packed, nmask = native.pack2(codes)
    assert packed.dtype == np.uint32 and len(packed) == 63
    out = native.unpack2(packed, nmask, len(codes))
    np.testing.assert_array_equal(out, codes)


def test_intervals_and_runs():
    occ = np.zeros(100, np.uint8)
    native.mark_intervals(
        occ, np.array([5, 50], np.int32), np.array([10, 20], np.int32)
    )
    assert occ[5:15].all() and occ[50:70].all() and occ.sum() == 30
    starts, ends = native.uncovered_runs(occ)
    assert starts.tolist() == [0, 15, 70]
    assert ends.tolist() == [5, 50, 100]


def test_native_nw_align_parity(monkeypatch):
    """C++ nw_align must be bit-identical to the NumPy DP — values AND
    traceback tie-breaks (diag > up > left) — across random short pairs,
    empties, and tie-heavy repetitive texts."""
    import numpy as np

    from npge_tpu import native
    from npge_tpu.algo import similar

    assert native.have_native()
    rng = np.random.default_rng(31)
    cases = [
        (np.zeros(0, np.uint8), np.zeros(0, np.uint8)),
        (np.zeros(0, np.uint8), rng.integers(0, 4, 5).astype(np.uint8)),
        (rng.integers(0, 4, 7).astype(np.uint8), np.zeros(0, np.uint8)),
        # tie-heavy: single-letter runs of different lengths
        (np.zeros(9, np.uint8), np.zeros(4, np.uint8)),
        (np.full(6, 3, np.uint8), np.full(11, 3, np.uint8)),
    ]
    for _ in range(120):
        n = int(rng.integers(0, 60))
        a = rng.integers(0, 5, n).astype(np.uint8)  # incl. N codes
        b = a.copy()
        for _ in range(int(rng.integers(0, 4))):
            if len(b):
                b[rng.integers(0, len(b))] = rng.integers(0, 5)
        cut = int(rng.integers(0, n + 1))
        if rng.random() < 0.5:
            b = np.concatenate(
                [b[:cut], rng.integers(0, 4, 3).astype(np.uint8), b[cut:]]
            ).astype(np.uint8)
        else:
            b = np.concatenate([b[:cut], b[min(cut + 2, n):]]).astype(np.uint8)
        cases.append((a, b))
    for a, b in cases:
        got = native.nw_align(a, b, 1, -2, -3, 5)
        monkeypatch.setattr(native, "_lib", False)
        want = similar.nw_align(a, b, 1, -2, -3)
        monkeypatch.setattr(native, "_lib", None)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
