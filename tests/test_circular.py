"""Circular sequences: origin joins, wrap fragments, rotation behavior.

SURVEY §2.1 Sequence circularity [A]; VERDICT round-1 item 4."""

import numpy as np

from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.algo.joiner import join_blocks, joinable_pairs
from npge_tpu.algo.overlaps import occupancy
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.algo.rest import rest_blocks
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable, frag_spans
from npge_tpu.model.hashing import blockset_hash
from npge_tpu.util import codes as C
from npge_tpu.util.synthetic import synthetic_arena


def test_frag_spans():
    assert frag_spans(10, 20, 100) == [(10, 30)]
    assert frag_spans(90, 20, 100) == [(90, 100), (0, 10)]
    assert frag_spans(0, 100, 100) == [(0, 100)]


def _circular_pair(L=800, seed=1, rot=300):
    """Two circular genomes: B is A rotated by `rot` (same cyclic text)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 4, L).astype(np.uint8)
    b = np.concatenate([a[rot:], a[:rot]])
    return GenomeArena(["A&chr&c", "B&chr&c"], [a, b])


def test_origin_join_creates_wrap_fragment():
    arena = _circular_pair(L=600, seed=2, rot=200)
    # homology: A[i] == B[(i-200) mod 600]. Construct two abutting blocks
    # around A's origin: X = A[500,600) ~ B[300,400), Y = A[0,100) ~ B[400,500)
    bx = Block(FragmentTable([0, 1], [500, 300], [100, 100], [1, 1]))
    by = Block(FragmentTable([0, 1], [0, 400], [100, 100], [1, 1]))
    bs = BlockSet(arena, [bx, by])
    cfg = default_config().replace(MIN_LENGTH=50, MIN_END=3)
    n = join_blocks(bs, cfg)
    assert n == 1, "origin join must fire"
    (b,) = bs.blocks
    assert b.n_frags == 2 and b.n_cols == 200
    # the A-side fragment wraps the origin
    wrap = b.frags.start + b.frags.length > 600
    assert wrap.sum() == 1
    rows = b.rows(arena)
    assert (rows[0] == rows[1]).all()
    # partition bookkeeping agrees between establisher and checker
    occ = occupancy(arena, bs.blocks)
    cov = bs.coverage_per_seq()
    for o, c in zip(occ, cov):
        np.testing.assert_array_equal(o, c > 0)


def test_origin_join_minus_strand():
    L, rot = 600, 200
    arena0 = _circular_pair(L=L, seed=3, rot=rot)
    # B' = revcomp of B (still circular); homology flips strand
    b_rc = C.revcomp(arena0.seq_codes(1)).copy()
    arena = GenomeArena(["A&chr&c", "B&chr&c"], [arena0.seq_codes(0).copy(), b_rc])
    # A[500,600) fwd ~ revcomp(B)[300,400) -> on B': starts at L-400=200
    bx = Block(FragmentTable([0, 1], [500, 200], [100, 100], [1, -1]))
    by = Block(FragmentTable([0, 1], [0, 100], [100, 100], [1, -1]))
    bs = BlockSet(arena, [bx, by])
    cfg = default_config().replace(MIN_LENGTH=50, MIN_END=3)
    n = join_blocks(bs, cfg)
    assert n == 1
    (b,) = bs.blocks
    rows = b.rows(arena)
    assert b.n_cols == 200 and (rows[0] == rows[1]).all()
    assert (b.frags.start + b.frags.length > 600).sum() == 1


def test_rest_merges_origin_run():
    arena = GenomeArena(
        ["A&chr&c"], [np.zeros(100, np.uint8)]
    )
    occ = [np.zeros(100, bool)]
    occ[0][20:80] = True  # uncovered: [0,20) and [80,100) -> one wrap run
    blocks = rest_blocks(arena, occ)
    assert len(blocks) == 1
    (b,) = blocks
    s, st, ln, o = b.frags.row(0)
    assert st == 80 and ln == 40  # [80,100) ++ [0,20)
    # linear sequence must NOT merge
    arena_l = GenomeArena(["A&chr&l"], [np.zeros(100, np.uint8)])
    assert len(rest_blocks(arena_l, [occ[0].copy()])) == 2


def test_circular_pipeline_no_origin_boundary():
    """Full pipeline on two rotated circular genomes: homology is one cyclic
    run, so the final pangenome must carry it across A's origin (wrap
    fragment present), be valid, and leave no joinable pair at the origin."""
    arena = _circular_pair(L=4000, seed=4, rot=1500)
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=6, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=3,
    )
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, rep.messages
    multi = [b for b in bs.blocks if b.n_frags >= 2]
    # identical cyclic text -> a single shared block covering everything
    assert len(multi) == 1, [b.name for b in bs.blocks]
    assert multi[0].n_cols == 4000
    shared = sum(int(b.frags.length.sum()) for b in multi)
    assert shared == 2 * 4000
    # determinism
    bs2, _ = build_pangenome(arena, cfg)
    assert blockset_hash(bs2) == blockset_hash(bs)


def test_circular_rotation_same_structure():
    """Rotating ALL circular inputs by the same amount must yield the same
    block structure (multiset of (n_frags, n_cols)) and identical shared
    coverage — coordinates shift, structure does not."""
    L, r = 5000, 1234
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, L).astype(np.uint8)
    b = a.copy()
    m = rng.random(L) < 0.004
    b[m] = (b[m] + rng.integers(1, 4, m.sum())) % 4
    b = np.concatenate([b[700:], b[:700]])  # genome B also rotated vs A
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=6, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=3,
    )

    def build(rot):
        aa = np.concatenate([a[rot:], a[:rot]])
        bb = np.concatenate([b[rot:], b[:rot]])
        arena = GenomeArena(["A&chr&c", "B&chr&c"], [aa, bb])
        bs, _ = build_pangenome(arena, cfg)
        rep = check_is_pangenome(bs, cfg)
        assert rep.ok, rep.messages
        struct = sorted((bk.n_frags, bk.n_cols) for bk in bs.blocks)
        shared = sum(
            int(bk.frags.length.sum()) for bk in bs.blocks if bk.n_frags >= 2
        )
        return struct, shared

    s0, c0 = build(0)
    s1, c1 = build(r)
    assert c0 == c1
    assert s0 == s1


def test_wrap_block_bs_roundtrip():
    import io

    arena = _circular_pair(L=600, seed=2, rot=200)
    bx = Block(FragmentTable([0, 1], [500, 300], [100, 100], [1, 1]))
    by = Block(FragmentTable([0, 1], [0, 400], [100, 100], [1, 1]))
    bs = BlockSet(arena, [bx, by])
    cfg = default_config().replace(MIN_LENGTH=50, MIN_END=3)
    join_blocks(bs, cfg)
    from npge_tpu.model.naming import assign_names

    assign_names(bs)
    bs.canonicalize()
    from npge_tpu.io.bs import read_blockset, write_blockset

    buf = io.StringIO()
    write_blockset(buf, bs)
    buf.seek(0)
    bs2 = read_blockset(buf)
    bs2.canonicalize()
    assert blockset_hash(bs2) == blockset_hash(bs)
