"""SimilarAligner patch MSA + bounded-gap Joiner (gapped blocks)."""

import numpy as np

from npge_tpu.algo.joiner import join_blocks, joinable_pairs
from npge_tpu.algo.similar import msa_short, nw_align
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.model.stats import is_good_block
from npge_tpu.util import codes as C


def test_nw_align_simple_gap():
    a = C.encode("ACGTACGT")
    b = C.encode("ACGACGT")  # T deleted
    ra, rb = nw_align(a, b)
    assert len(ra) == len(rb) == 8
    assert C.decode(ra) == "ACGTACGT"
    assert C.decode(rb).replace("-", "") == "ACGACGT"
    assert (rb == C.GAP).sum() == 1


def test_msa_short_including_empty():
    segs = [C.encode("ACGT"), C.encode("AC"), np.zeros(0, np.uint8)]
    m = msa_short(segs)
    assert m.shape == (3, 4)
    assert C.decode(m[0]) == "ACGT"
    assert C.decode(m[2]) == "----"
    # rows with gaps removed reproduce the inputs
    for i, s in enumerate(segs):
        assert C.decode(m[i]).replace("-", "") == C.decode(s)


def test_gap_join_bridges_indel():
    cfg = default_config().replace(MIN_LENGTH=8, MIN_END=1, MAX_JOIN_GAP=5)
    # genome B has 2 extra bases between the two conserved halves
    left = "ACGTACGTACGT"
    right = "TTGGCCAATTGG"
    arena = GenomeArena.from_strings(
        {"A&c&l": left + right, "B&c&l": left + "CA" + right}
    )
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 12, 1), (1, 0, 12, 1)])),
            Block(FragmentTable.from_rows([(0, 12, 12, 1), (1, 14, 12, 1)])),
        ],
    )
    pairs = joinable_pairs(bs, cfg)
    assert len(pairs) == 1
    n = join_blocks(bs, cfg)
    assert n == 1 and len(bs.blocks) == 1
    b = bs.blocks[0]
    assert not b.is_gapless
    assert b.n_cols == 26  # 12 + 2 (gap columns) + 12
    rows = b.rows(arena)
    # fragment texts survive the join
    assert C.decode(rows[0]).replace("-", "") == left + right
    assert C.decode(rows[1]).replace("-", "") == left + "CA" + right
    # coordinates cover both genomes exactly
    assert b.frags.row(0) == (0, 0, 24, 1)
    assert b.frags.row(1) == (1, 0, 26, 1)
    assert is_good_block(b, arena, cfg)


def test_gap_join_respects_goodness():
    # joining across a junk gap that would wreck identity must be refused
    cfg = default_config().replace(
        MIN_LENGTH=8, MIN_END=1, MAX_JOIN_GAP=50, MIN_IDENTITY="0.95"
    )
    left = "ACGTACGTACGT"
    right = "TTGGCCAATTGG"
    junk_a = "AAAAAAAAAAAAAAAAAAAAAAAA"
    junk_b = "CCCCCCCCCCCCCCCCCCCCCCCC"
    arena = GenomeArena.from_strings(
        {"A&c&l": left + junk_a + right, "B&c&l": left + junk_b + right}
    )
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 12, 1), (1, 0, 12, 1)])),
            Block(FragmentTable.from_rows([(0, 36, 12, 1), (1, 36, 12, 1)])),
        ],
    )
    assert joinable_pairs(bs, cfg) == []


def test_merge_into_fast_path_parity():
    """The identical-to-consensus fast path must be bit-identical to the
    general NW merge across random segment sets (incl. equal, prefix, and
    divergent segments)."""
    import numpy as np

    from npge_tpu.algo.similar import msa_short, nw_align
    from npge_tpu.util import codes as C

    def merge_general(profile_rows, seg):
        # replica of the pre-fast-path _merge_into (general NW merge)
        if not profile_rows:
            return [np.asarray(seg, np.uint8)]
        prof = np.stack(profile_rows)
        counts = np.stack(
            [(prof == x).sum(axis=0) for x in range(C.N_REAL_BASES)]
        )
        cons = counts.argmax(axis=0).astype(np.uint8)
        cons = np.where(counts.max(axis=0) > 0, cons, np.uint8(C.N))
        rc, rs = nw_align(cons, np.asarray(seg, np.uint8))
        out_rows = []
        for row in profile_rows:
            new = np.full(len(rc), C.GAP, np.uint8)
            new[rc != C.GAP] = row
            out_rows.append(new)
        out_rows.append(np.asarray(rs, np.uint8))
        return out_rows

    def msa_general(segments):
        order = sorted(
            range(len(segments)), key=lambda i: (-len(segments[i]), i)
        )
        rows = []
        for idx in order:
            rows = merge_general(rows, segments[idx])
        width = len(rows[0]) if rows else 0
        out = np.full((len(segments), width), C.GAP, np.uint8)
        for pos, idx in enumerate(order):
            out[idx] = rows[pos]
        return out

    rng = np.random.default_rng(8)
    for _ in range(40):
        base = rng.integers(0, 4, int(rng.integers(1, 12))).astype(np.uint8)
        segs = []
        for _ in range(int(rng.integers(1, 5))):
            s = base.copy()
            if rng.random() < 0.5 and len(s):
                if rng.random() < 0.5:
                    s[rng.integers(0, len(s))] = rng.integers(0, 4)
                else:
                    s = s[: int(rng.integers(0, len(s)))]
            segs.append(s.astype(np.uint8))
        got = msa_short(segs)
        want = msa_general(segs)
        np.testing.assert_array_equal(got, want)

    # skewed duplicate multiplicities (round-4 advisor finding): duplicate
    # texts must vote in the running consensus with their multiplicity,
    # matching the every-copy-merged-individually MSA. These pinned cases
    # diverge under unweighted dedup (found by brute-force search): the
    # duplicated texts' vote ratio decides the consensus where a and c
    # differ, which moves the indel text b's gap placement.
    pinned = [
        ([3, 3, 3, 1, 2], 3, [3, 3, 3, 3, 2], 4, [3, 3, 3, 1]),
        ([0, 3, 0], 5, [0, 0, 3], 2, [0, 3]),
        ([3, 0, 2, 1, 1, 1, 1], 4, [3, 0, 2, 1, 1, 0, 1], 2,
         [3, 0, 2, 1, 1]),
    ]
    for a, ka, c, kc, b in pinned:
        a = np.asarray(a, np.uint8)
        c = np.asarray(c, np.uint8)
        b = np.asarray(b, np.uint8)
        segs = [a.copy() for _ in range(ka)]
        segs += [c.copy() for _ in range(kc)]
        segs.append(b)
        np.testing.assert_array_equal(msa_short(segs), msa_general(segs))
    # random skewed sets on top of the pinned ones
    for _ in range(40):
        L = int(rng.integers(3, 12))
        a = rng.integers(0, 4, L).astype(np.uint8)
        c = a.copy()
        for _ in range(int(rng.integers(1, 3))):
            i = int(rng.integers(0, L))
            c[i] = (c[i] + int(rng.integers(1, 4))) % 4
        cut = int(rng.integers(0, L))
        b = np.concatenate(
            [a[:cut], a[cut + int(rng.integers(1, 3)):]]
        ).astype(np.uint8)
        if len(b) == 0:
            continue
        segs = [a.copy() for _ in range(int(rng.integers(1, 6)))]
        segs += [c.copy() for _ in range(int(rng.integers(1, 6)))]
        segs.append(b)
        np.testing.assert_array_equal(msa_short(segs), msa_general(segs))


def test_merge_into_diagonal_fast_path_matches_nw():
    """The near-diagonal fast path (equal length, few substitutions) must
    equal the NW result: nw_align on such pairs returns the gapless
    alignment (the optimality bound the fast path relies on)."""
    import numpy as np

    from npge_tpu.algo.similar import _merge_into, nw_align

    rng = np.random.default_rng(3)
    for _ in range(60):
        L = int(rng.integers(1, 40))
        a = rng.integers(0, 4, L).astype(np.uint8)
        b = a.copy()
        for _ in range(int(rng.integers(0, 3))):  # 0-2 substitutions
            i = int(rng.integers(0, L))
            b[i] = (b[i] + int(rng.integers(1, 4))) % 4
        ra, rb = nw_align(a, b, 1, -2, -3)
        np.testing.assert_array_equal(ra, a)  # gapless: diagonal optimal
        np.testing.assert_array_equal(rb, b)
        merged = _merge_into([a], b, 1, -2, -3)
        np.testing.assert_array_equal(merged[0], a)
        np.testing.assert_array_equal(merged[1], b)
