import numpy as np

import jax.numpy as jnp

from npge_tpu.algo.aligners import (
    align_block,
    dummy_align,
    meta_align,
    similar_align,
)
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.ops.pack import pack2, unpack2
from npge_tpu.util import codes as C


def test_dummy_align():
    m = dummy_align([C.encode("ACGT"), C.encode("AC")])
    assert C.decode(m[1]) == "AC--"


def test_similar_align_identical_long():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 5000).astype(np.uint8)
    m = similar_align([t, t.copy(), t.copy()])
    assert m.shape == (3, 5000)
    assert np.array_equal(m[0], t)


def test_similar_align_with_indel_and_subs():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 800).astype(np.uint8)
    b = np.delete(a.copy(), [100, 101, 102])  # 3bp deletion
    b[500] = (b[500] + 1) % 4
    m = similar_align([a, b])
    assert m is not None and m.shape[0] == 2
    assert C.decode(m[0]).replace("-", "") == C.decode(a)
    assert C.decode(m[1]).replace("-", "") == C.decode(b)
    assert (m[1] == C.GAP).sum() == 3
    # alignment is high identity
    ident = (m[0] == m[1]).sum()
    assert ident >= m.shape[1] - 5


def test_align_block_realigns_unequal_fragments():
    cfg = default_config()
    sa = "ACGTACGTACGTACGTTTTTACGTACGTACGTACGT"
    sb = sa[:16] + sa[20:]  # TTTT deleted
    arena = GenomeArena.from_strings({"A&c&l": sa, "B&c&l": sb})
    b = Block(
        FragmentTable.from_rows(
            [(0, 0, len(sa), 1), (1, 0, len(sb), 1)]
        ),
        dummy_align([C.encode(sa), C.encode(sb)]),
    )
    out = align_block(b, arena, cfg)
    rows = out.rows(arena)
    assert C.decode(rows[0]).replace("-", "") == sa
    assert C.decode(rows[1]).replace("-", "") == sb
    ident = (rows[0] == rows[1]) & (rows[0] != C.GAP)
    assert ident.sum() >= len(sb) - 2


def test_pack_unpack_device():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, 1000).astype(np.uint8)
    packed, mask = pack2(jnp.asarray(codes))
    out = np.asarray(unpack2(packed, mask))
    np.testing.assert_array_equal(out, codes)
    # parity with the native host packer
    from npge_tpu import native

    p_host, m_host = native.pack2(codes)
    np.testing.assert_array_equal(np.asarray(packed), p_host)
    np.testing.assert_array_equal(np.asarray(mask), m_host.astype(bool))


def test_banded_nw_matches_full_on_similar():
    from npge_tpu.algo.similar import banded_nw_align, nw_align

    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, 3000).astype(np.uint8)
    b = np.delete(a.copy(), [500, 501, 1500])  # two deletions
    m = rng.random(len(b)) < 0.01
    b[m] = (b[m] + 1) % 4
    ra, rb = banded_nw_align(a, b, band=64)
    assert C.decode(ra).replace("-", "") == C.decode(a)
    assert C.decode(rb).replace("-", "") == C.decode(b)
    ident = ((ra == rb) & (ra != C.GAP)).sum()
    assert ident > len(b) - 50
    # small case: banded == exact full DP result score-wise
    a2, b2 = a[:80], b[:78]
    fa, fb = nw_align(a2, b2)
    ba, bb = banded_nw_align(a2, b2, band=100)  # covers everything
    assert np.array_equal(fa, ba) and np.array_equal(fb, bb)


def test_similar_align_long_unanchored_segment():
    rng = np.random.default_rng(10)
    core = rng.integers(0, 4, 1000).astype(np.uint8)
    # an un-anchorable middle: one row random, others random too (no shared
    # k-mers) but short flanks anchor; max_segment forces the banded path
    mid_a = rng.integers(0, 4, 2500).astype(np.uint8)
    mid_b = rng.integers(0, 4, 2400).astype(np.uint8)
    a = np.concatenate([core, mid_a, core])
    b = np.concatenate([core, mid_b, core])
    m = similar_align([a, b], max_segment=2000)
    assert m is not None
    assert C.decode(m[0]).replace("-", "") == C.decode(a)
    assert C.decode(m[1]).replace("-", "") == C.decode(b)
