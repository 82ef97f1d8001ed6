"""Gapped flank extension (algo/gapext) — unit + pipeline-level behavior."""

import numpy as np

from npge_tpu.algo.gapext import (
    _merge_center_star,
    _nw_fixed_query,
    _trim_good,
    gapped_extend_blocks,
)
from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.model.hashing import blockset_hash
from npge_tpu.model.stats import is_good_block
from npge_tpu.util import codes as C
from npge_tpu.util.synthetic import synthetic_arena


def test_nw_fixed_query_exact_match():
    q = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    aligned, ins = _nw_fixed_query(q, q.copy(), 1, -2, -3)
    assert (aligned == q).all()
    assert all(len(x) == 0 for x in ins)


def test_nw_fixed_query_insertion_recovered():
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    t = np.concatenate([q[:4], [3, 3, 3], q[4:]]).astype(np.uint8)
    aligned, ins = _nw_fixed_query(q, t, 1, -2, -3)
    assert (aligned == q).all()          # all query chars matched
    # a 3-char insertion run lands in one slot around q[3..4] (placement
    # within the run of equal chars is ambiguous but deterministic)
    assert sum(len(x) for x in ins) == 3
    assert len(ins[3]) == 3 or len(ins[4]) == 3


def test_nw_fixed_query_n_never_matches():
    q = np.array([4, 4, 4], np.uint8)
    aligned, ins = _nw_fixed_query(q, q.copy(), 1, -2, -3)
    # N vs N must be scored a mismatch; alignment still maps positions
    # (diag moves), but columns will be non-identical downstream
    assert len(aligned) == 3


def test_merge_center_star_shapes():
    q = np.array([0, 1, 2], np.uint8)
    r1 = (np.array([0, 1, 2], np.int16), [np.array([], np.uint8)] * 4)
    ins2 = [np.array([], np.uint8)] * 4
    ins2[1] = np.array([3, 3], np.uint8)
    r2 = (np.array([0, -1, 2], np.int16), ins2)
    cols = _merge_center_star(q, [r1, r2])
    assert cols.shape == (3, 5)  # 3 match cols + 2 insertion cols
    # row 0 (rep) has gaps exactly at insertion columns
    assert (cols[0] == np.array([0, C.GAP, C.GAP, 1, 2])).all()
    assert (cols[2] == np.array([0, 3, 3, C.GAP, 2])).all()


def test_trim_good_respects_identity_and_tail():
    cfg = default_config().replace(MIN_END=3)
    # 10 good columns then 5 bad then 2 good: trim must stop where the
    # trailing window is clean and identity holds
    good_block = np.zeros((2, 17), np.uint8)
    good_block[:, 10:15] = np.array([[0], [1]])  # mismatch columns
    c = _trim_good(good_block, good0=1000, total0=1000, cfg=cfg)
    assert c == 10  # bad tail excluded (cols 15.. fail the MIN_END window)


def _two_seq_block(s1, s2, lo, ln):
    arena = GenomeArena(["A&c&l", "B&c&l"], [s1, s2])
    blk = Block(FragmentTable([0, 1], [lo, lo], [ln, ln], [1, 1]))
    return arena, BlockSet(arena, [blk])


def test_gapext_extends_through_insertion():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 4, 400).astype(np.uint8)
    y = rng.integers(0, 4, 400).astype(np.uint8)
    ins = rng.integers(0, 4, 5).astype(np.uint8)
    s1 = np.concatenate([x, y])
    s2 = np.concatenate([x, ins, y])
    arena, bs = _two_seq_block(s1, s2, 100, 100)  # block inside x
    cfg = default_config().replace(MIN_END=5, MIN_LENGTH=50)
    n = gapped_extend_blocks(bs, cfg, None)
    assert n >= 1
    b = bs.blocks[0]
    # must have pushed past the insertion point (col 400 of s1)
    ends = b.frags.end
    assert ends[0] > 400 and ends[1] > 405, (b.frags.start, ends)
    assert not b.is_gapless  # the 5-char insertion shows as gap columns
    assert is_good_block(b, arena, cfg)
    # left side should also have extended toward position 0
    assert (b.frags.start < 100).all()


def test_gapext_respects_neighbor_rooms():
    """Two blocks separated by a 20bp identical gap must split it and abut
    without overlapping."""
    rng = np.random.default_rng(4)
    s = rng.integers(0, 4, 1000).astype(np.uint8)
    arena = GenomeArena(["A&c&l", "B&c&l"], [s, s.copy()])
    b1 = Block(FragmentTable([0, 1], [100, 100], [200, 200], [1, 1]))
    b2 = Block(FragmentTable([0, 1], [320, 320], [200, 200], [1, 1]))
    bs = BlockSet(arena, [b1, b2])
    cfg = default_config().replace(MIN_END=5, MIN_LENGTH=50)
    gapped_extend_blocks(bs, cfg, None)
    a, b = bs.blocks
    for s_id in (0, 1):
        iv = sorted(
            (blk.frags.start[i], blk.frags.end[i])
            for blk in (a, b)
            for i in range(2)
            if blk.frags.seq_id[i] == s_id
        )
        for (s0, e0), (s1_, e1) in zip(iv, iv[1:]):
            assert e0 <= s1_, f"overlap on seq {s_id}: {iv}"
    # the 20bp gap is identical text -> both sides should have consumed it
    assert a.frags.end[0] == 320 - 10 or b.frags.start[0] <= 310


def test_gapext_minus_strand_block():
    rng = np.random.default_rng(5)
    s1 = rng.integers(0, 4, 600).astype(np.uint8)
    s2 = C.revcomp(s1).copy()
    arena = GenomeArena(["A&c&l", "B&c&l"], [s1, s2])
    # A[200,300) fwd pairs with B[300,400) rev (same text)
    blk = Block(FragmentTable([0, 1], [200, 300], [100, 100], [1, -1]))
    bs = BlockSet(arena, [blk])
    cfg = default_config().replace(MIN_END=5, MIN_LENGTH=50)
    n = gapped_extend_blocks(bs, cfg, None)
    assert n >= 1
    b = bs.blocks[0]
    assert b.n_cols > 100
    assert is_good_block(b, arena, cfg)
    # rows must agree after extension (identical text world)
    rows = b.rows(arena)
    assert (rows[0] == rows[1]).all()


def test_pipeline_indel_world_more_shared_with_gapext():
    """VERDICT round-1 item 3 acceptance: on an indel-rich world, gapped
    extension must materially raise multi-fragment (shared) coverage —
    flanks push through indels and divergence clusters that stop the
    gapless extender and that are too short to seed their own blocks —
    while the pangenome stays valid + deterministic. (Block counts alone
    can tie: the Joiner already bridges small indel gaps.)"""
    arena = synthetic_arena(
        n_genomes=3, length=20_000, seed=77, sub_rate=0.005,
        indel_rate=0.002, n_inversions=1,
    )
    cfg_on = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=6, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=3,
    )
    cfg_off = cfg_on.replace(GAPPED_EXTEND=False)
    bs_on, _ = build_pangenome(arena, cfg_on)
    bs_off, _ = build_pangenome(arena, cfg_off)
    rep = check_is_pangenome(bs_on, cfg_on)
    assert rep.ok, rep.messages

    def shared(bs):
        return sum(
            int(b.frags.length.sum()) for b in bs.blocks if b.n_frags >= 2
        )

    s_on, s_off = shared(bs_on), shared(bs_off)
    uncovered_off = arena.total_length - s_off
    # gapped extension must claim a material part of what was uncovered
    assert s_on - s_off >= uncovered_off // 10, (s_on, s_off, uncovered_off)
    # determinism
    bs_on2, _ = build_pangenome(arena, cfg_on)
    assert blockset_hash(bs_on2) == blockset_hash(bs_on)


def test_probe_cache_replays_only_when_sibling_cannot_change_block():
    """Round-4 advisor (medium): a cached no-ext probe for side R was
    computed against the block's own stats; if in a LATER pass the left
    side newly extends (its caps changed), a fresh run would re-probe R
    against the spliced block's larger good/total and can pass. The cache
    must not skip R in that pass."""
    L = 400
    rng = np.random.default_rng(11)
    a = rng.integers(0, 4, L).astype(np.uint8)
    b = a.copy()
    b[220:230] = (b[220:230] + 1) % 4  # 10 mismatches inside the block
    b[300] = (b[300] + 1) % 4          # right flank starts with a bad column
    arena = GenomeArena(["A&c&l", "B&c&l"], [a, b])
    blk = Block(FragmentTable([0, 1], [200, 200], [100, 100], [1, 1]))
    l_nb = Block(FragmentTable([0, 1], [150, 150], [50, 50], [1, 1]))
    r_nb = Block(FragmentTable([0, 1], [310, 310], [50, 50], [1, 1]))
    cfg = default_config().replace(MIN_END=3, MIN_LENGTH=50)
    cache: dict = {}
    # pass 1: left side has zero room (l_nb abuts); the right probe sees
    # caps [5,5] (split 10bp gap to r_nb) and fails on identity
    # (90/100 block + 1 bad flank column) -> cached as unextendable
    bs1 = BlockSet(arena, [blk, l_nb, r_nb])
    gapped_extend_blocks(bs1, cfg, probe_cache=cache)
    assert bs1.blocks[0] is blk, "right side must NOT extend in pass 1"
    assert any(k[0] == id(blk) and k[1] == "R" for k in cache)
    # pass 2: l_nb gone -> the left side extends by 200 identical columns;
    # the right side's caps (and key) are unchanged, but its probe must
    # re-run against the spliced stats and now extend by 5
    bs2 = BlockSet(arena, [blk, r_nb])
    gapped_extend_blocks(bs2, cfg, probe_cache=cache)
    grown = bs2.blocks[0]
    assert grown.frags.start[0] == 0, "left side must extend to seq start"
    assert grown.frags.end[0] == 305, (
        "cached right probe must be re-run once the sibling side changes "
        f"the block (got end={grown.frags.end[0]})"
    )


def test_nw_batch_matches_single_pairs():
    """_nw_fixed_query_batch pads pairs into shared grids; results must be
    bit-identical to the one-pair-at-a-time DP for ragged lengths."""
    from npge_tpu.algo.gapext import _nw_fixed_query_batch

    rng = np.random.default_rng(9)
    pairs = []
    for _ in range(40):
        A = int(rng.integers(1, 60))
        q = rng.integers(0, 4, A).astype(np.uint8)
        t = q.copy()
        # random edits: subs + an indel
        m = rng.random(A) < 0.1
        t[m] = (t[m] + 1) % 4
        cut = int(rng.integers(0, A))
        if rng.random() < 0.5:
            t = np.concatenate([t[:cut], rng.integers(0, 4, 3).astype(np.uint8), t[cut:]])
        else:
            t = np.concatenate([t[:cut], t[min(cut + 2, A):]])
        pairs.append((q, t.astype(np.uint8)))
    # force multiple chunks with a tiny chunk budget
    batched = _nw_fixed_query_batch(pairs, 1, -2, -3, chunk_bytes=1 << 12)
    for (q, t), (ba, bins) in zip(pairs, batched):
        sa, sins = _nw_fixed_query(q, t, 1, -2, -3)
        np.testing.assert_array_equal(ba, sa)
        assert len(bins) == len(sins)
        for x, y in zip(bins, sins):
            np.testing.assert_array_equal(x, y)


def test_nw_exact_prefix_fast_path_bit_identical():
    """Pairs with t[:A] == q take the fast path (no DP grid); the result
    must be bit-identical to the full grid + traceback."""
    import numpy as np

    from npge_tpu.algo.gapext import _nw_fixed_query_batch

    rng = np.random.default_rng(17)
    pairs = []
    for _ in range(40):
        A = int(rng.integers(0, 30))
        q = rng.integers(0, 4, A).astype(np.uint8)
        extra = rng.integers(0, 4, int(rng.integers(0, 10))).astype(np.uint8)
        pairs.append((q, np.concatenate([q, extra])))
    fast = _nw_fixed_query_batch(pairs, 1, -2, -3)
    slow = _nw_fixed_query_batch(pairs, 1, -2, -3, no_fast=True)
    for (fa, fi), (sa, si) in zip(fast, slow):
        np.testing.assert_array_equal(fa, sa)
        assert len(fi) == len(si)
        for x, y in zip(fi, si):
            np.testing.assert_array_equal(x, y)
