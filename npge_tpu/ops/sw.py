"""Banded Smith-Waterman x-drop extension — the Pallas TPU kernel.

THE kernel of the engine (SURVEY.md §7 step 3; BASELINE metric = DP
cells/sec/chip): batched pairwise extension alignment, replacing the
reference's per-block ``SimilarAligner``/``FragmentsExtender`` DP
(``src/algo/SimilarAligner.cpp`` ⚠[B]) with an anti-diagonal wavefront that
keeps the whole band in VMEM/registers.

Formulation (global-extension H-matrix):
    H(i, j) = best score aligning q[0..i) against t[0..j),
    H(0,0)=0, moves: diag + (MATCH|MISMATCH), up/left + GAP (linear gaps).
    X-drop: cells with H < best_so_far - X are pruned to -inf.
    Result per pair: (best score, best i, best j).

Band geometry (static schedule — no data-dependent control flow):
    On anti-diagonal d (= i + j), the band holds W cells r in [0, W) with
    i = ib(d) + r,  ib(d) = (d+1)//2 - W//2  (may be negative; such cells
    are masked invalid). With this un-clamped center-following schedule the
    wavefront shifts are *fixed per parity of d*:
        diag  source (i-1, j-1) at d-2 -> same band cell r
        up    source (i-1, j)   at d-1 -> r-1 (d even) / r (d odd)
        left  source (i,   j-1) at d-1 -> r   (d even) / r+1 (d odd)

TPU data layout: the band dimension r lives on *sublanes* (axis 0) and the
batch across *lanes* (axis 1, TB pairs per program); all per-step work is
pure VPU math on [W, TB] registers, with sublane rolls implementing the
parity shifts.

Character fetch (Mosaic on this toolchain only supports dynamic sublane
slices at *aligned* starts — probed: int8 needs start % 32 == 0): diagonals
are processed in supersteps of 64. Per superstep the kernel issues two
32-aligned dynamic window loads of W+64 rows (q chars ascending, t chars
pad-reversed), and the 64 inner steps take static sub-windows of those
registers — the char window start moves by exactly (u+1)//2 (q) and -(u//2)
(t) within a superstep, both bounded by 32.

Inputs are pre-padded on host and stored transposed [L+2W, B] (W=128):
    qp[x, b]  = q_b[x - W]        (fill 254) -> q[i-1] lives at row W+ib-1+r
    trp[x, b] = t_b[L-1-(x-W-1)]  (fill 255) -> t[j-1] lives at row
                 W+L-d+ib+1+r
so with d0 = 64*SS + 2 the superstep base starts 64+32*SS (q) and
32+L-32*SS (t window, loaded 32 rows early) are multiples of 32, and the
two fill values never compare equal.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 29)


def _shift_down_fill(x, fill):
    """out[r] = x[r-1]; row 0 <- fill."""
    y = pltpu.roll(x, 1, axis=0)
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(r == 0, fill, y)


def _shift_up_fill(x, fill):
    """out[r] = x[r+1]; last row <- fill."""
    W = x.shape[0]
    y = pltpu.roll(x, W - 1, axis=0)
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(r == W - 1, fill, y)


def _sw_kernel(
    qp_ref, trp_ref, qlen_ref, tlen_ref, out_ref,
    *, L, W, TB, match, mismatch, gap, xdrop,
):
    band = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
    qlen = qlen_ref[0:1, :]  # [1, TB]
    tlen = tlen_ref[0:1, :]
    neg = jnp.full((W, TB), NEG, jnp.int32)

    def cell_ij(d):
        ib = (d + 1) // 2 - W // 2
        i = ib + band
        j = d - i
        return ib, i, j

    # ---- seed d=0 and d=1 ----
    _, i0, j0 = cell_ij(0)
    prev2 = jnp.where((i0 == 0) & (j0 == 0), 0, NEG)
    _, i1, j1 = cell_ij(1)
    ok1 = (
        ((i1 == 1) & (j1 == 0) & (1 <= qlen))
        | ((i1 == 0) & (j1 == 1) & (1 <= tlen))
    )
    prev = jnp.where(ok1, gap, NEG)
    best = jnp.maximum(
        jnp.zeros((1, TB), jnp.int32),
        jnp.max(jnp.where(ok1, prev, NEG), axis=0, keepdims=True),
    )
    bi = jnp.zeros((1, TB), jnp.int32)
    bj = jnp.zeros((1, TB), jnp.int32)

    SUPER = 64  # diagonals per superstep; char windows move by <= 32
    WIN = W + SUPER  # rows per dynamic load

    def step(d, ib, qs_all, ts_all, qoff, toff, carry):
        """One anti-diagonal. qs_all/ts_all are the superstep's char
        windows; qoff/toff are *static* row offsets into them."""
        prev2, prev, best, bi, bj = carry
        i = ib + band
        j = d - i
        qs = jax.lax.slice_in_dim(qs_all, qoff, qoff + W, axis=0)
        ts = jax.lax.slice_in_dim(ts_all, toff, toff + W, axis=0)
        sub = jnp.where(qs == ts, match, mismatch)

        even = (d % 2) == 0
        up_src = jnp.where(even, _shift_down_fill(prev, NEG), prev)
        left_src = jnp.where(even, prev, _shift_up_fill(prev, NEG))
        inside = (i <= qlen) & (j <= tlen)
        diag_ok = (i >= 1) & (j >= 1) & inside
        up_ok = (i >= 1) & (j >= 0) & inside
        left_ok = (i >= 0) & (j >= 1) & inside
        s = jnp.maximum(
            jnp.where(diag_ok, prev2 + sub, NEG),
            jnp.maximum(
                jnp.where(up_ok, up_src + gap, NEG),
                jnp.where(left_ok, left_src + gap, NEG),
            ),
        )
        # x-drop prune against best over earlier anti-diagonals
        s = jnp.where(s < best - xdrop, neg, s)
        col_best = jnp.max(s, axis=0, keepdims=True)  # [1, TB]
        improved = col_best > best
        # endpoint: smallest band index achieving the max (deterministic)
        first_r = jnp.min(
            jnp.where(s == col_best, band, W), axis=0, keepdims=True
        )
        ii = ib + first_r
        jj = d - ii
        bi = jnp.where(improved, ii, bi)
        bj = jnp.where(improved, jj, bj)
        best = jnp.maximum(best, col_best)
        return (prev, s, best, bi, bj)

    n_super = pl.cdiv(2 * L + 1 - 2, SUPER)

    def superstep(ss, carry):
        d0 = 2 + ss * SUPER  # even; ib(d0) = d0//2 - W//2
        # q row base for u=0: W + ib(d0) - 1 = W//2 + 32*ss  (aligned)
        q0 = pl.multiple_of(W // 2 + 32 * ss, 32)
        # t rows: W + L - d + ib + 1; at u=0 -> 64 + L - 32*ss; load 32 early
        t0 = pl.multiple_of(32 + L - 32 * ss, 32)
        qs_all = qp_ref[pl.ds(q0, WIN), :].astype(jnp.int32)
        ts_all = trp_ref[pl.ds(t0, WIN), :].astype(jnp.int32)
        for u in range(SUPER):
            d = d0 + u
            ib = (d + 1) // 2 - W // 2
            qoff = (u + 1) // 2        # q window advance
            toff = 32 - u // 2         # t window retreat (loaded 32 early)
            carry = step(d, ib, qs_all, ts_all, qoff, toff, carry)
        return carry

    # extra diagonals beyond 2L in the last superstep are harmless: all
    # their cells fail i<=qlen/j<=tlen and score NEG
    prev2, prev, best, bi, bj = jax.lax.fori_loop(
        0, n_super, superstep, (prev2, prev, best, bi, bj)
    )
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, TB), 0)
    out_ref[:, :] = jnp.where(
        row8 == 0,
        best,
        jnp.where(row8 == 1, bi, jnp.where(row8 == 2, bj, 0)),
    )


@partial(
    jax.jit,
    static_argnames=(
        "L", "W", "TB", "match", "mismatch", "gap", "xdrop", "interpret"
    ),
)
def sw_extend_padded(
    qp, trp, qlen, tlen, *, L, W=128, TB=128,
    match=1, mismatch=-2, gap=-3, xdrop=64, interpret=False,
):
    """Run the kernel on pre-padded *transposed* inputs.

    qp, trp: uint8[L + 2W, B]; qlen/tlen: int32[1, B]; B % TB == 0.
    Returns int32[B, 3]: (best score, best_i, best_j) per pair.
    """
    Lp, B = qp.shape
    assert B % TB == 0 and Lp == L + 2 * W
    assert L % 32 == 0 and W == 128, "superstep alignment needs L%32==0, W=128"
    kernel = partial(
        _sw_kernel, L=L, W=W, TB=TB,
        match=match, mismatch=mismatch, gap=gap, xdrop=xdrop,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((Lp, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * W * (2 * L + 1),
            bytes_accessed=2 * B * Lp + B * 32,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, trp, qlen, tlen)
    return out[:3, :].T


def pad_for_sw(q_list, t_list, L: int, W: int = 128, TB: int = 128):
    """Host-side padding/reversal/transpose. q_list/t_list: uint8 code arrays
    (clipped to L). Returns (qp[L+2W, Bp], trp[L+2W, Bp], qlen[1, Bp],
    tlen[1, Bp]) with the batch padded up to a multiple of TB."""
    B = len(q_list)
    Bp = -(-B // TB) * TB
    # power-of-2 batch buckets: each distinct Bp is a separate compiled
    # (Pallas) executable, and remote compiles cost 10-70 s on this
    # machine's TPU tunnel — bucketing bounds the executable count at
    # log(B) per process (SURVEY §7 hard part 3)
    Bp = 1 << max(0, Bp - 1).bit_length()
    qp = np.full((Bp, L + 2 * W), 254, np.uint8)
    trp = np.full((Bp, L + 2 * W), 255, np.uint8)
    qlen = np.zeros((1, Bp), np.int32)
    tlen = np.zeros((1, Bp), np.int32)
    for b, (q, t) in enumerate(zip(q_list, t_list)):
        q = np.asarray(q, np.uint8)[:L]
        t = np.asarray(t, np.uint8)[:L]
        qlen[0, b] = len(q)
        tlen[0, b] = len(t)
        qp[b, W : W + len(q)] = q
        trp[b, W + 1 + L - len(t) : W + 1 + L] = t[::-1]
    return np.ascontiguousarray(qp.T), np.ascontiguousarray(trp.T), qlen, tlen


def sw_extend(q_list, t_list, L=None, **kw):
    """Convenience wrapper: pad on host, run kernel, return numpy [B, 3]."""
    if L is None:
        L = max(max((len(q) for q in q_list), default=1),
                max((len(t) for t in t_list), default=1))
        L = max(1, -(-L // 128) * 128)
    W = kw.setdefault("W", 128)
    TB = kw.setdefault("TB", 128)
    qp, trp, qlen, tlen = pad_for_sw(q_list, t_list, L, W, TB)
    out = sw_extend_padded(
        jnp.asarray(qp), jnp.asarray(trp), jnp.asarray(qlen),
        jnp.asarray(tlen), L=L, **kw,
    )
    return np.asarray(out)[: len(q_list)]


def sw_extend_numpy(q_list, t_list, L=None, W=128, match=1, mismatch=-2,
                    gap=-3, xdrop=64):
    """Vectorized NumPy mirror of the Pallas kernel — same band schedule,
    same x-drop pruning, same endpoint tie-breaks — for hosts without the
    TPU (test/CPU backend). Returns int32[B, 3] (best, best_i, best_j),
    bit-identical to ``sw_extend`` (tests assert it)."""
    if L is None:
        L = max(max((len(q) for q in q_list), default=1),
                max((len(t) for t in t_list), default=1))
        L = max(1, -(-L // 128) * 128)
    B = len(q_list)
    qp = np.full((B, L + 2 * W), 254, np.int32)
    trp = np.full((B, L + 2 * W), 255, np.int32)
    qlen = np.zeros((B, 1), np.int32)
    tlen = np.zeros((B, 1), np.int32)
    for b, (q, t) in enumerate(zip(q_list, t_list)):
        q = np.asarray(q, np.int32)[:L]
        t = np.asarray(t, np.int32)[:L]
        qlen[b, 0] = len(q)
        tlen[b, 0] = len(t)
        qp[b, W : W + len(q)] = q
        trp[b, W + 1 + L - len(t) : W + 1 + L] = t[::-1]
    return _sw_numpy_core(qp, trp, qlen, tlen, L, W, match, mismatch, gap,
                          xdrop)


def _sw_numpy_core(qp, trp, qlen, tlen, L, W, match, mismatch, gap, xdrop):
    """Band recurrence of the NumPy mirror over pre-padded [B, L+2W]
    arrays (the layout ``sw_extend_numpy``'s padding loop builds)."""
    B = qp.shape[0]
    band = np.arange(W, dtype=np.int32)[None, :]
    prev2 = np.where(band == W // 2, 0, NEG).astype(np.int64)
    prev2 = np.broadcast_to(prev2, (B, W)).copy()
    i1 = (1 - W // 2) + band
    j1 = 1 - i1
    ok1 = ((i1 == 1) & (j1 == 0) & (qlen >= 1)) | (
        (i1 == 0) & (j1 == 1) & (tlen >= 1)
    )
    prev = np.where(ok1, gap, NEG).astype(np.int64)
    best = np.maximum(0, prev.max(axis=1, keepdims=True))
    bi = np.zeros((B, 1), np.int64)
    bj = np.zeros((B, 1), np.int64)
    for d in range(2, 2 * L + 1):
        ib = (d + 1) // 2 - W // 2
        i = ib + band
        j = d - i
        qs = qp[:, np.clip(W + ib - 1 + band, 0, qp.shape[1] - 1)[0]]
        ts = trp[:, np.clip(W + 1 + L - d + ib + band, 0, trp.shape[1] - 1)[0]]
        sub = np.where(qs == ts, match, mismatch)
        if d % 2 == 0:
            up = np.concatenate([np.full((B, 1), NEG), prev[:, :-1]], axis=1)
            left = prev
        else:
            up = prev
            left = np.concatenate([prev[:, 1:], np.full((B, 1), NEG)], axis=1)
        inside = (i <= qlen) & (j <= tlen)
        s = np.maximum(
            np.where((i >= 1) & (j >= 1) & inside, prev2 + sub, NEG),
            np.maximum(
                np.where((i >= 1) & inside & (j >= 0), up + gap, NEG),
                np.where((j >= 1) & inside & (i >= 0), left + gap, NEG),
            ),
        )
        s = np.where(s < best - xdrop, NEG, s)
        col_best = s.max(axis=1, keepdims=True)
        improved = col_best > best
        first_r = np.where(s == col_best, band, W).min(axis=1, keepdims=True)
        ii = ib + first_r
        jj = d - ii
        bi = np.where(improved, ii, bi)
        bj = np.where(improved, jj, bj)
        best = np.maximum(best, col_best)
        prev2, prev = prev, s
    return np.concatenate([best, bi, bj], axis=1).astype(np.int32)


from functools import partial as _partial


@_partial(
    jax.jit,
    static_argnames=(
        "L", "W", "TB", "match", "mismatch", "gap", "xdrop"
    ),
)
def _sw_padded_rowmajor(qp, trp, qlen, tlen, **kw):
    """Kernel entry taking [Bp, L+2W] row-major inputs; the transpose to
    the kernel's [L+2W, Bp] layout runs on device (free vs a host copy)."""
    return sw_extend_padded(qp.T, trp.T, qlen, tlen, **kw)


@_partial(
    jax.jit,
    static_argnames=(
        "L", "W", "TB", "match", "mismatch", "gap", "xdrop", "q_n", "t_n"
    ),
)
def _sw_windows_device(
    codes2, qb, qcap, tb, tcap, *, L, W, TB, match, mismatch, gap, xdrop,
    q_n, t_n,
):
    """Window gather + sentinel mapping + padded-layout assembly + kernel,
    all on device: the host only uploads the (base, cap) descriptor rows
    (the host-side index arithmetic + gathers cost ~1 s per 17k-pair
    gapped-extension pass). Batch is pre-padded to a pow2 bucket; pad
    rows have cap 0 and read row 0, masked to fill."""
    s = jnp.arange(L)
    hi = codes2.shape[0] - 1
    qwin = codes2[jnp.minimum(qb[:, None] + s[None, :], hi)]
    qwin = jnp.where(qwin >= 4, jnp.uint8(q_n), qwin)
    q_core = jnp.where(s[None, :] < qcap[:, None], qwin, jnp.uint8(254))
    twin = codes2[jnp.minimum(tb[:, None] + s[None, :], hi)]
    twin = jnp.where(twin >= 4, jnp.uint8(t_n), twin)
    t_core = jnp.where(s[None, :] < tcap[:, None], twin, jnp.uint8(255))
    Bp = qb.shape[0]
    qp = jnp.full((L + 2 * W, Bp), 254, jnp.uint8)
    qp = qp.at[W : W + L, :].set(q_core.T)
    trp = jnp.full((L + 2 * W, Bp), 255, jnp.uint8)
    trp = trp.at[W + 1 : W + 1 + L, :].set(t_core[:, ::-1].T)
    return sw_extend_padded(
        qp, trp, qcap.astype(jnp.int32)[None, :],
        tcap.astype(jnp.int32)[None, :],
        L=L, W=W, TB=TB, match=match, mismatch=mismatch, gap=gap,
        xdrop=xdrop,
    )


def sw_extend_windows(
    codes2, qb, qcap, tb, tcap, L: int,
    q_n_code: int = 250, t_n_code: int = 251,
    W: int = 128, TB: int = 128,
    match: int = 1, mismatch: int = -2, gap: int = -3, xdrop: int = 64,
):
    """Batched x-drop endpoints over CONTIGUOUS windows of a flat array.

    Pair p aligns codes2[qb[p] : qb[p]+qcap[p]] against
    codes2[tb[p] : tb[p]+tcap[p]] (caps <= L). Bit-identical to building
    the window lists on host and calling :func:`sw_extend_auto`
    (parity-tested), but the padded matrices are built with two
    vectorized gathers — the per-pair Python slicing dominated the gapped
    flank extension's host wall at 100+ genomes (150k pairs/pass).
    N codes (>= 4) map to ``q_n_code``/``t_n_code`` so query-N never
    matches target-N, mirroring algo.gapext's sentinel convention."""
    import jax

    P = len(qb)
    if P == 0:
        return np.zeros((0, 3), np.int32)
    qb = np.asarray(qb, np.int64)
    tb = np.asarray(tb, np.int64)
    # mirror the list path's [:L] window clipping
    qcap = np.minimum(np.asarray(qcap, np.int64), L)
    tcap = np.minimum(np.asarray(tcap, np.int64), L)
    s = np.arange(L)
    hi = len(codes2) - 1
    if jax.default_backend() != "cpu":
        Bp = -(-P // TB) * TB
        Bp = 1 << max(0, Bp - 1).bit_length()

        def padded(a):
            out = np.zeros(Bp, np.int32)
            out[:P] = a
            return jnp.asarray(out)

        codes2_dev = (
            codes2 if isinstance(codes2, jax.Array) else jnp.asarray(codes2)
        )
        out = _sw_windows_device(
            codes2_dev, padded(qb), padded(qcap), padded(tb), padded(tcap),
            L=L, W=W, TB=TB, match=match, mismatch=mismatch, gap=gap,
            xdrop=xdrop, q_n=q_n_code, t_n=t_n_code,
        )
        return np.asarray(out)[:P]
    qwin = codes2[np.minimum(qb[:, None] + s[None, :], hi)]
    qwin = np.where(qwin >= 4, np.uint8(q_n_code), qwin)
    q_core = np.where(s[None, :] < qcap[:, None], qwin, np.uint8(254))
    twin = codes2[np.minimum(tb[:, None] + s[None, :], hi)]
    twin = np.where(twin >= 4, np.uint8(t_n_code), twin)
    t_core = np.where(s[None, :] < tcap[:, None], twin, np.uint8(255))
    qp = np.full((P, L + 2 * W), 254, np.int32)
    trp = np.full((P, L + 2 * W), 255, np.int32)
    qp[:, W : W + L] = q_core
    trp[:, W + 1 : W + 1 + L] = t_core[:, ::-1]
    return _sw_numpy_core(
        qp, trp, qcap[:, None].astype(np.int32),
        tcap[:, None].astype(np.int32), L, W, match, mismatch, gap, xdrop,
    )


def sw_extend_auto(q_list, t_list, **kw):
    """Batched x-drop extension endpoints via the Pallas kernel on TPU, or
    the bit-identical NumPy mirror elsewhere. Returns int32[B, 3]."""
    import jax

    if not q_list:
        return np.zeros((0, 3), np.int32)
    # the TPU backend registers as "tpu" (or "axon" behind this machine's
    # tunnel); everything else takes the NumPy mirror
    if jax.default_backend() != "cpu":
        return sw_extend(q_list, t_list, **kw)
    kw.pop("TB", None)
    return sw_extend_numpy(q_list, t_list, **kw)


def sw_extend_reference(q, t, match=1, mismatch=-2, gap=-3, xdrop=64):
    """Unbanded NumPy oracle of the same x-drop recurrence (for tests).

    Mirrors the kernel's pruning semantics: pruning compares against the
    best score over strictly earlier anti-diagonals; ties at the per-diagonal
    max resolve to the smallest i (the kernel's smallest band index).
    """
    n, m = len(q), len(t)
    H = np.full((n + 1, m + 1), NEG, np.int64)
    H[0, 0] = 0
    best, bi, bj = 0, 0, 0
    for d in range(1, n + m + 1):
        i_lo = max(0, d - m)
        i_hi = min(n, d)
        cand = []
        for i in range(i_lo, i_hi + 1):
            j = d - i
            s = NEG
            if i >= 1 and j >= 1 and H[i - 1, j - 1] > NEG // 2:
                s = max(s, H[i - 1, j - 1] + (match if q[i - 1] == t[j - 1] else mismatch))
            if i >= 1 and H[i - 1, j] > NEG // 2:
                s = max(s, H[i - 1, j] + gap)
            if j >= 1 and H[i, j - 1] > NEG // 2:
                s = max(s, H[i, j - 1] + gap)
            if s < best - xdrop:
                s = NEG
            H[i, j] = s
            cand.append((s, i, j))
        d_best = max(cand, key=lambda c: (c[0], -c[1]))
        if d_best[0] > best:
            best, bi, bj = d_best
    return best, bi, bj
