"""Batched gapless group extension (device, jnp).

TPU-native analog of the reference's ``FragmentsExtender``
(``src/algo/FragmentsExtender.cpp`` ⚠[B], SURVEY.md §2.3): every anchor
group's fragments are extended column-by-column in lockstep, in both
directions, while the extended prefix stays above MIN_IDENTITY and ends on an
identical column. The reference extends by a bounded window then re-aligns
and trims back to the last good column; our gapless-lockstep rule is the
batched equivalent for the high-identity regime (gapped refinement is the
Pallas banded-SW kernel's job, ops/sw.py).

Shapes are static: B groups x F fragments x S columns per chunk; ragged
reality is handled by host-side bucketing + masking (SURVEY §7 hard part 2).
Identity thresholds are exact integer rationals (no float compares).

Column-space convention: "right" means increasing alignment column; for an
ori=-1 fragment that is *decreasing* sequence position. Callers pass
per-fragment arena-global interval bounds [lo, hi) plus per-side caps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("chunk", "right"))
def extend_chunk(
    codes: jax.Array,     # uint8[T] whole arena
    lo: jax.Array,        # int32[B, F] current interval start (inclusive, arena-global)
    hi: jax.Array,        # int32[B, F] current interval end (exclusive)
    ori: jax.Array,       # int32[B, F] +1/-1
    fmask: jax.Array,     # bool[B, F] fragment present
    cap: jax.Array,       # int32[B, F] max further columns this side (>=0)
    carry_len: jax.Array,  # int32[B] columns already extended this side
    carry_ident: jax.Array,  # int32[B] identical columns among them
    ident_num: int,
    ident_den: int,
    chunk: int,
    right: bool,
):
    """Extend each group by up to `chunk` columns on one side.

    Returns ext[B] (0..chunk): the number of additional columns such that the
    *cumulative* extension (carry + ext) keeps
    identical_columns / total_columns >= ident_num/ident_den and the last
    added column is identical. A column is usable only if every present
    fragment has an in-cap real base there; the first unusable column hard-
    stops the scan.
    """
    B, F = lo.shape
    s = jnp.arange(chunk, dtype=jnp.int32)  # [S]
    # column s char position: right side: ori=+1 -> hi+s ; ori=-1 -> lo-1-s
    # left  side: ori=+1 -> lo-1-s ; ori=-1 -> hi+s
    plus_right = right
    base_fwd = hi[..., None] + s  # [B, F, S]
    base_rev = lo[..., None] - 1 - s
    if plus_right:
        pos = jnp.where(ori[..., None] == 1, base_fwd, base_rev)
        need_comp = ori[..., None] != 1
    else:
        pos = jnp.where(ori[..., None] == 1, base_rev, base_fwd)
        need_comp = ori[..., None] == 1
    T = codes.shape[0]
    inb = (pos >= 0) & (pos < T)
    ch = jnp.take(codes, jnp.clip(pos, 0, T - 1), axis=0).astype(jnp.int32)
    ch = jnp.where(need_comp & (ch < 4), 3 - ch, ch)
    within = (s[None, None, :] < cap[..., None]) & inb
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
    idx = jnp.maximum(ext - 1, 0)
    cnt_at = jnp.take_along_axis(cnt, idx[:, None], axis=1)[:, 0]
    new_ident = carry_ident + jnp.where(ext > 0, cnt_at, 0)
    return ext, carry_len + ext, new_ident


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
):
    """Host-driven chunked extension on both sides.

    Returns (ext_left[B], ext_right[B]) as numpy int32. The loop re-invokes
    the jitted chunk kernel while any group consumed a full chunk; interval
    bounds and caps are advanced between rounds.
    """
    import numpy as np

    B, F = lo.shape
    out = {}
    for right in (True, False):
        cur_lo = jnp.asarray(lo)
        cur_hi = jnp.asarray(hi)
        cap = jnp.asarray(cap_right if right else cap_left)
        carry_len = jnp.zeros(B, jnp.int32)
        carry_ident = jnp.zeros(B, jnp.int32)
        total = np.zeros(B, np.int32)
        for _ in range(max_rounds):
            ext, carry_len, carry_ident = extend_chunk(
                codes, cur_lo, cur_hi, ori, fmask, cap,
                carry_len, carry_ident, ident_num, ident_den,
                chunk, right,
            )
            ext_np = np.asarray(ext)
            total += ext_np
            if not (ext_np == chunk).any():
                break
            # Advance intervals by ext on the scanning side. Groups that did
            # NOT consume the full chunk are frozen (cap -> 0): their result
            # must not depend on other groups in the batch triggering more
            # rounds — batch-composition determinism (SURVEY §7 hard part 4).
            active = jnp.asarray(ext_np == chunk)[:, None]
            e = jnp.asarray(ext_np)[:, None]
            if right:
                cur_hi = jnp.where(ori == 1, cur_hi + e, cur_hi)
                cur_lo = jnp.where(ori == 1, cur_lo, cur_lo - e)
            else:
                cur_lo = jnp.where(ori == 1, cur_lo - e, cur_lo)
                cur_hi = jnp.where(ori == 1, cur_hi, cur_hi + e)
            cap = jnp.where(active, jnp.maximum(cap - e, 0), 0)
        out[right] = total
    return out[False], out[True]
