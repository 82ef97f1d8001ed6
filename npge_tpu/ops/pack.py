"""2-bit packed genome arrays (device ops).

CompactSequence equivalent (``src/model/Sequence.hpp`` ⚠[B], SURVEY.md
§2.6): 16 bases per uint32 lane plus an N-mask. The uint8 code arena remains
the working representation (bacterial genomes are small relative to HBM);
packing is for storage/transfer and as the substrate for future packed-scan
kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def pack2(codes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """uint8[n] codes -> (uint32[ceil(n/16)] packed, bool[n] n_mask).
    N (and anything >= 4) packs as base 0 with the mask bit set."""
    n = codes.shape[0]
    pad = (-n) % 16
    c = jnp.concatenate([codes, jnp.zeros(pad, jnp.uint8)]).astype(jnp.uint32)
    n_mask = codes >= 4
    vals = jnp.where(c < 4, c, 0).reshape(-1, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    return (vals << shifts).sum(axis=1).astype(jnp.uint32), n_mask


@jax.jit
def unpack2(packed: jax.Array, n_mask: jax.Array) -> jax.Array:
    """Inverse of pack2; result length = len(n_mask)."""
    n = n_mask.shape[0]
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    vals = ((packed[:, None] >> shifts) & 3).reshape(-1)[:n]
    return jnp.where(n_mask, jnp.uint8(4), vals.astype(jnp.uint8))
