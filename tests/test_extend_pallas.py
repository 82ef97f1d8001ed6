"""Pallas windowed-DMA extension kernel vs the jnp extend_chunk (interpret
mode on CPU; bit-exact)."""

import jax.numpy as jnp
import numpy as np

from npge_tpu.ops.extend import bases_for_groups, extend_chunk, make_codes2
from npge_tpu.ops.extend_pallas import extend_chunk_pallas


def test_pallas_extension_matches_jnp():
    rng = np.random.default_rng(5)
    T = 4000
    codes = rng.integers(0, 4, T).astype(np.uint8)
    codes[1200:1210] = 4  # an N run
    codes[2000:2300] = codes[100:400]  # planted repeat
    codes2 = make_codes2(jnp.asarray(codes))
    B, F, S = 16, 3, 256
    lo = rng.integers(300, T - 600, (B, F)).astype(np.int64)
    # make fragment 1 of each group a shifted copy region sometimes
    hi = lo + 21
    ori = np.where(rng.random((B, F)) < 0.4, -1, 1).astype(np.int64)
    fmask = rng.random((B, F)) < 0.9
    fmask[:, 0] = True
    cap = rng.integers(0, S + 1, (B, F)).astype(np.int32)
    base_l, base_r = bases_for_groups(lo, hi, ori, T)
    for base in (base_r, base_l):
        carry_len = jnp.asarray(rng.integers(0, 50, B).astype(np.int32))
        carry_ident = (carry_len * 9) // 10
        want = extend_chunk(
            codes2, jnp.asarray(base), jnp.asarray(fmask),
            jnp.asarray(cap), carry_len, carry_ident, 9, 10, S,
        )
        got = extend_chunk_pallas(
            codes2, jnp.asarray(base), jnp.asarray(fmask),
            jnp.asarray(cap), carry_len, carry_ident, 9, 10, S,
            GB=8, interpret=True,
        )
        for w, g, name in zip(want, got, ("ext", "len", "ident")):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=name
            )
