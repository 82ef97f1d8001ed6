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
