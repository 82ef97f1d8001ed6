"""Pallas fragment-extension kernel — aligned windowed DMA.

Drop-in computation of ops.extend.extend_chunk's per-chunk result, built for
TPU memory behavior: instead of an XLA gather over [B, F, S] indices, each
(group, fragment) window is one contiguous ascending read of the doubled
rc-arena (codes2, see ops/extend.py) DMA'd HBM -> VMEM, and all column logic
runs as VPU ops on [GB, S+32] registers.

Alignment discipline (the round-2 kernel HTTP-500'd in Mosaic remote
compile; ops/sw.py's probing showed this toolchain only accepts dynamic
int8 slices at starts aligned to 32): every DMA starts at
``(base // 32) * 32`` and reads ``S + 32`` bytes; the residual offset
``base % 32`` is folded away in-register with 5 conditional log-step lane
rolls per fragment window (the same trick ops/extend.window_rows uses at
row granularity). Grid = groups / GB; per grid step the kernel issues GB*F
window DMAs up front (they overlap), waits once, then computes.

Results are bit-identical to extend_chunk (tests assert in interpret mode;
benchmarks/ext_variants.py asserts on hardware): the 32 extra lanes sit at
``s >= cap`` where the column logic already masks them out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    base_sref, base_ref, cap_ref, fmask_ref, carry_ref, codes2_ref, out_ref,
    win, sems, *, GB, F, S, num, den,
):
    i0 = pl.program_id(0) * GB  # scalar-prefetch refs hold the FULL array
    SW = S + 32  # window width incl. alignment slack
    # start all (32-aligned) window DMAs, then wait
    for g in range(GB):
        for f in range(F):
            a0 = (base_sref[i0 + g, f] // 32) * 32
            pltpu.make_async_copy(
                codes2_ref.at[pl.ds(a0, SW)],
                win.at[f, g],
                sems.at[f * GB + g],
            ).start()
    for g in range(GB):
        for f in range(F):
            a0 = (base_sref[i0 + g, f] // 32) * 32
            pltpu.make_async_copy(
                codes2_ref.at[pl.ds(a0, SW)],
                win.at[f, g],
                sems.at[f * GB + g],
            ).wait()

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (GB, SW), 1)
    mn = jnp.full((GB, SW), 255, jnp.int32)
    mx = jnp.full((GB, SW), -1, jnp.int32)
    usable_all = jnp.full((GB, SW), True)
    cap = cap_ref[:, :]      # [GB, F] int32 (VMEM)
    fmask = fmask_ref[:, :]  # [GB, F] int32 (1/0)
    base_v = base_ref[:, :]  # [GB, F] int32 (VMEM copy of the bases)
    # mirrors ops.extend.extend_chunk's masked min/max exactly:
    #   for-max: usable -> ch, present-unusable -> 255, absent -> -1
    #   for-min: usable -> ch, otherwise 255
    for f in range(F):
        w = win[f]  # [GB, SW] uint8, lane x holds codes2[a0 + x]
        off = jnp.remainder(base_v[:, f : f + 1], 32)  # [GB, 1]
        # fold the alignment residue: left-rotate row g by off[g] via 5
        # conditional power-of-two lane rolls (wrapped tail lanes land at
        # s >= S >= cap and are masked below)
        for b in range(5):
            t = 1 << b
            w = jnp.where(
                (off >> b) & 1 == 1, pltpu.roll(w, SW - t, axis=1), w
            )
        ch = w.astype(jnp.int32)
        present = fmask[:, f : f + 1] > 0
        uf = (s_iota < cap[:, f : f + 1]) & (ch < 4)
        eff_max = jnp.where(present, jnp.where(uf, ch, 255), -1)
        eff_min = jnp.where(present & uf, ch, 255)
        mx = jnp.maximum(mx, eff_max)
        mn = jnp.minimum(mn, eff_min)
        usable_all = usable_all & (~present | uf)
    col_ident = usable_all & (mn == mx) & (mx < 4)
    # Mosaic has no cumsum/cumprod lowering; inclusive prefix sums are
    # computed as [GB,SW] @ [SW,SW] upper-triangular matmuls on the MXU
    # (f32 is exact for integer counts <= 2^24; SW is far below that).
    ii = jax.lax.broadcasted_iota(jnp.int32, (SW, SW), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (SW, SW), 1)
    tri = (ii <= jj).astype(jnp.float32)
    bad_cum = jnp.dot(
        1.0 - usable_all.astype(jnp.float32), tri,
        preferred_element_type=jnp.float32,
    )
    usable_prefix = bad_cum < 0.5
    ident_eff = col_ident & usable_prefix
    cnt = jnp.dot(
        ident_eff.astype(jnp.float32), tri,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    L = s_iota + 1
    carry_len = carry_ref[:, 0:1]
    carry_ident = carry_ref[:, 1:2]
    tot_len = carry_len + L
    tot_cnt = carry_ident + cnt
    ok = (
        usable_prefix
        & ident_eff
        & (tot_cnt * jnp.int32(den) >= jnp.int32(num) * tot_len)
    )
    ext = jnp.max(jnp.where(ok, L, 0), axis=1, keepdims=True)  # [GB, 1]
    cnt_at = jnp.max(jnp.where(L == ext, cnt, 0), axis=1, keepdims=True)
    new_ident = carry_ident + jnp.where(ext > 0, cnt_at, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (GB, 128), 1)
    out_ref[:, :] = jnp.where(
        lane == 0,
        ext,
        jnp.where(lane == 1, carry_len + ext, jnp.where(lane == 2, new_ident, 0)),
    )


@partial(jax.jit, static_argnames=("chunk", "GB", "num", "den", "interpret"))
def extend_chunk_pallas(
    codes2, base, fmask, cap, carry_len, carry_ident,
    num: int, den: int, chunk: int, GB: int = 8, interpret: bool = False,
):
    """Same contract as ops.extend.extend_chunk (returns ext, new_len,
    new_ident), computed with aligned windowed DMA. B must be a multiple of
    GB; ``codes2`` must carry >= chunk + 64 bytes of N-sentinel padding
    (see benchmarks/ext_variants.py)."""
    B, F = base.shape
    assert B % GB == 0
    carry = jnp.stack([carry_len, carry_ident], axis=1).astype(jnp.int32)
    kernel = partial(_kernel, GB=GB, F=F, S=chunk, num=num, den=den)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # base indices prefetch to SMEM
        grid=(B // GB,),
        in_specs=[
            pl.BlockSpec((GB, F), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, F), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, F), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, 2), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # codes2 stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (GB, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((F, GB, chunk + 32), jnp.uint8),
            pltpu.SemaphoreType.DMA((F * GB,)),
        ],
    )
    base32 = base.astype(jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        base32,                          # scalar-prefetch (SMEM)
        base32,                          # VMEM copy (per-lane offsets)
        cap.astype(jnp.int32),
        fmask.astype(jnp.int32),
        carry,
        codes2,
    )
    return out[:, 0], out[:, 1], out[:, 2]
