"""Batched gapless group extension (device, jnp).

TPU-native analog of the reference's ``FragmentsExtender``
(``src/algo/FragmentsExtender.cpp`` ⚠[B], SURVEY.md §2.3): every anchor
group's fragments are extended column-by-column in lockstep, in both
directions, while the extended prefix stays above MIN_IDENTITY and ends on an
identical column. Identity thresholds are exact integer rationals.

Memory layout trick (uniform forward windows): with the doubled arena
``codes2 = codes ++ revcomp(codes)`` (length 2T), the column-s character of
ANY fragment in ANY direction is ``codes2[base + s]`` for a per-fragment
scalar base:

    right extension:  base = hi            (ori=+1)   | 2T - lo   (ori=-1)
    left  extension:  base = 2T - lo       (ori=+1)*  | hi        (ori=-1)*

(*) the left-side reads come out complemented, which is harmless: the
extension rule only compares characters for equality and N-ness, both
invariant under complement. No per-element orientation selects, no reversal
— and every window is a contiguous ascending read (DMA-able by a future
Pallas kernel). Advancing an extension by e columns is simply ``base += e``
for every fragment, both strands.

Shapes are static: B groups x F fragments x S columns per chunk; ragged
reality is handled by host-side bucketing + masking (SURVEY §7 hard part 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def make_codes2(codes: jax.Array) -> jax.Array:
    """codes ++ revcomp(codes); rc[x] = complement(codes[T-1-x])."""
    comp = jnp.where(codes < 4, 3 - codes, codes)
    return jnp.concatenate([codes, comp[::-1]])


@partial(jax.jit, static_argnames=("chunk",))
def extend_chunk(
    codes2: jax.Array,   # uint8[2T] doubled arena
    base: jax.Array,     # int32[B, F] forward window base per fragment
    fmask: jax.Array,    # bool[B, F] fragment present
    cap: jax.Array,      # int32[B, F] max further columns this side (>=0)
    carry_len: jax.Array,    # int32[B] columns already extended this side
    carry_ident: jax.Array,  # int32[B] identical columns among them
    ident_num: int,
    ident_den: int,
    chunk: int,
):
    """Extend each group by up to `chunk` columns on one side.

    Returns ext[B] (0..chunk): the number of additional columns such that the
    *cumulative* extension (carry + ext) keeps
    identical_columns / total_columns >= ident_num/ident_den and the last
    added column is identical. A column is usable only if every present
    fragment has an in-cap real base there; the first unusable column hard-
    stops the scan.
    """
    B, F = base.shape
    s = jnp.arange(chunk, dtype=jnp.int32)  # [S]
    T2 = codes2.shape[0]
    idx = base[..., None] + s  # [B, F, S]
    ch = jnp.take(codes2, jnp.clip(idx, 0, T2 - 1), axis=0).astype(jnp.int32)
    within = (s[None, None, :] < cap[..., None]) & (idx >= 0) & (idx < T2)
    usable_f = within & (ch < 4)  # per-fragment usable
    # masked min/max over fragments to test all-equal
    BIG, SMALL = jnp.int32(255), jnp.int32(-1)
    eff_for_max = jnp.where(fmask[..., None], jnp.where(usable_f, ch, BIG), SMALL)
    eff_for_min = jnp.where(fmask[..., None], jnp.where(usable_f, ch, BIG), BIG)
    col_max = eff_for_max.max(axis=1)  # [B, S]
    col_min = eff_for_min.min(axis=1)
    col_usable = (fmask[..., None] <= usable_f).all(axis=1)  # mask -> usable
    col_ident = col_usable & (col_min == col_max) & (col_max < 4)

    # hard stop at first unusable column
    usable_prefix = jnp.cumprod(col_usable.astype(jnp.int32), axis=1) == 1
    ident_eff = col_ident & usable_prefix
    cnt = jnp.cumsum(ident_eff.astype(jnp.int32), axis=1)  # [B, S]
    L = s[None, :] + 1  # candidate added-lengths
    tot_len = carry_len[:, None] + L
    tot_cnt = carry_ident[:, None] + cnt
    ok = (
        usable_prefix
        & ident_eff  # last added column identical
        & (tot_cnt * jnp.int32(ident_den) >= jnp.int32(ident_num) * tot_len)
    )
    ext = jnp.max(jnp.where(ok, L, 0), axis=1)  # [B]
    # identical count at the chosen length (0 -> carry unchanged)
    i0 = jnp.maximum(ext - 1, 0)
    cnt_at = jnp.take_along_axis(cnt, i0[:, None], axis=1)[:, 0]
    new_ident = carry_ident + jnp.where(ext > 0, cnt_at, 0)
    return ext, carry_len + ext, new_ident


def extend_side(
    codes2, base, fmask, cap, ident_num, ident_den,
    chunk: int = 512, max_rounds: int = 8,
):
    """Host-driven chunked extension on one side. Returns total ext[B]."""
    B = base.shape[0]
    base = jnp.asarray(base)
    cap = jnp.asarray(cap)
    carry_len = jnp.zeros(B, jnp.int32)
    carry_ident = jnp.zeros(B, jnp.int32)
    total = np.zeros(B, np.int32)
    for _ in range(max_rounds):
        ext, carry_len, carry_ident = extend_chunk(
            codes2, base, fmask, cap, carry_len, carry_ident,
            ident_num, ident_den, chunk,
        )
        ext_np = np.asarray(ext)
        total += ext_np
        if not (ext_np == chunk).any():
            break
        # Groups that did NOT consume the full chunk are frozen (cap -> 0):
        # their result must not depend on other groups in the batch
        # triggering more rounds — batch-composition determinism
        # (SURVEY §7 hard part 4).
        active = jnp.asarray(ext_np == chunk)[:, None]
        e = jnp.asarray(ext_np)[:, None]
        base = base + e
        cap = jnp.where(active, jnp.maximum(cap - e, 0), 0)
    return total


def bases_for_groups(pos, end, ori, T: int):
    """Per-occurrence forward-window bases into codes2 for both sides.

    pos/end: arena-global [lo, hi) of the current interval; ori +-1.
    Returns (base_left, base_right) — see module docstring."""
    pos = np.asarray(pos, np.int64)
    end = np.asarray(end, np.int64)
    ori = np.asarray(ori, np.int64)
    base_r = np.where(ori == 1, end, 2 * T - pos)
    base_l = np.where(ori == 1, 2 * T - pos, end)
    return base_l.astype(np.int32), base_r.astype(np.int32)


def extend_groups(
    codes,
    lo,
    hi,
    ori,
    fmask,
    cap_left,
    cap_right,
    ident_num: int,
    ident_den: int,
    chunk: int = 512,
    max_rounds: int = 8,
    codes2=None,
    T: int | None = None,
):
    """Two-sided extension (compatibility API over the codes2 layout).

    ``codes`` may be the plain arena (codes2 built on the fly) or pass
    ``codes2``+``T`` directly to reuse the doubled arena across calls.
    """
    if codes2 is None:
        T = int(codes.shape[0])
        codes2 = make_codes2(jnp.asarray(codes))
    assert T is not None
    base_l, base_r = bases_for_groups(
        np.asarray(lo), np.asarray(hi), np.asarray(ori), T
    )
    fmask = jnp.asarray(fmask)
    el = extend_side(
        codes2, base_l, fmask, np.asarray(cap_left, np.int32),
        ident_num, ident_den, chunk, max_rounds,
    )
    er = extend_side(
        codes2, base_r, fmask, np.asarray(cap_right, np.int32),
        ident_num, ident_den, chunk, max_rounds,
    )
    return el, er
