"""Pallas banded-SW x-drop kernel vs the unbanded NumPy oracle.

On the CPU test backend the kernel runs in interpreter mode; pairs are kept
short enough (< W/2) that the band covers the whole DP matrix, so banded
kernel == unbanded oracle exactly.
"""

import numpy as np
import pytest

from npge_tpu.ops.sw import pad_for_sw, sw_extend, sw_extend_reference
from npge_tpu.util import codes as C


def run_kernel(qs, ts, **kw):
    kw.setdefault("interpret", True)
    kw.setdefault("L", 128)
    return sw_extend(qs, ts, **kw)


def test_identical_sequences():
    q = C.encode("ACGTACGTACGTACGTACGT")
    out = run_kernel([q], [q.copy()])
    best, bi, bj = out[0]
    assert (best, bi, bj) == (20, 20, 20)


def test_single_mismatch_and_xdrop_end():
    q = C.encode("ACGTACGTAC")
    t = q.copy()
    t[4] = (t[4] + 1) % 4
    out = run_kernel([q], [t])
    want = sw_extend_reference(q, t)
    assert tuple(out[0]) == want
    assert out[0][0] == 10 - 3  # 9 matches, 1 mismatch = 9 - 2... check oracle
    # (the assertion above is informative; the oracle equality is the test)


def test_gap_handling():
    q = C.encode("ACGTACGTACGTACGT")
    t = np.concatenate([q[:8], C.encode("A"), q[8:]])  # insertion in t
    out = run_kernel([q], [t])
    want = sw_extend_reference(q, t)
    assert tuple(out[0]) == want
    # full-length alignment reached despite the gap
    assert out[0][1] == len(q) and out[0][2] == len(t)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_pairs_match_oracle(seed):
    rng = np.random.default_rng(seed)
    qs, ts = [], []
    for _ in range(8):
        n = int(rng.integers(5, 60))
        q = rng.integers(0, 4, n).astype(np.uint8)
        # t: mutated copy with random edits
        t = q.copy()
        for p in range(len(t)):
            r = rng.random()
            if r < 0.05:
                t[p] = (t[p] + 1) % 4
        if rng.random() < 0.5 and n > 10:
            t = np.delete(t, rng.integers(0, n, 2))
        qs.append(q)
        ts.append(t.astype(np.uint8))
    out = run_kernel(qs, ts)
    for b in range(len(qs)):
        want = sw_extend_reference(qs[b], ts[b])
        assert tuple(out[b]) == want, f"pair {b}: got {tuple(out[b])} want {want}"


def test_empty_target():
    q = C.encode("ACGT")
    t = np.zeros(0, np.uint8)
    out = run_kernel([q], [t])
    want = sw_extend_reference(q, t)
    assert tuple(out[0]) == want == (0, 0, 0)


def test_batch_padding_rows_harmless():
    q = C.encode("ACGTACGTACGT")
    out = run_kernel([q, q], [q.copy(), q.copy()], TB=8)
    assert tuple(out[0]) == tuple(out[1]) == (12, 12, 12)


def test_sw_extend_windows_matches_list_path():
    """sw_extend_windows (vectorized contiguous-window build) must be
    bit-identical to building the window lists and calling
    sw_extend_auto — including N sentinels, cap clipping, and ragged
    caps."""
    from npge_tpu.ops.sw import sw_extend_auto, sw_extend_windows

    rng = np.random.default_rng(27)
    codes2 = rng.integers(0, 4, 8000).astype(np.uint8)
    codes2[rng.random(8000) < 0.01] = 4  # sprinkle N
    P, L = 37, 128
    qb = rng.integers(0, 6000, P)
    tb = np.minimum(qb + rng.integers(-30, 30, P), 6000)
    qcap = rng.integers(0, 200, P)  # some > L to exercise clipping
    tcap = rng.integers(0, 200, P)
    qs, ts = [], []
    for p in range(P):
        q = codes2[qb[p] : qb[p] + qcap[p]]
        t = codes2[tb[p] : tb[p] + tcap[p]]
        qs.append(np.where(q >= 4, np.uint8(250), q))
        ts.append(np.where(t >= 4, np.uint8(251), t))
    want = sw_extend_auto(qs, ts, L=L)
    got = sw_extend_windows(codes2, qb, qcap, tb, tcap, L=L)
    np.testing.assert_array_equal(got, want)
