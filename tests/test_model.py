"""Model-layer unit tests: codes, arena, fragments, blocks, stats, hashing.

Mirrors the reference's per-component Boost.Test files for sequence /
fragment / block / block_set / alignment_row (SURVEY.md §4 ⚠[B]): tiny
in-memory blocksets from literal strings, exact structural assertions.
"""

import io

import numpy as np
import pytest

from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena, SeqName
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.model.hashing import block_hash, blockset_hash
from npge_tpu.model.naming import assign_names
from npge_tpu.model.stats import block_identity, is_good_block, make_stat
from npge_tpu.util import codes as C
from npge_tpu.util.rational import Rational


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn-X"
    codes = C.encode(s)
    assert C.decode(codes) == "ACGTNACGTN-N"
    assert codes[0] == C.A and codes[3] == C.T and codes[4] == C.N


def test_revcomp():
    assert C.decode(C.revcomp(C.encode("ACGTN"))) == "NACGT"
    # complement is an involution on real bases
    x = C.encode("ACGT")
    assert np.array_equal(C.revcomp(C.revcomp(x)), x)


def test_rational_parse_and_compare():
    r = Rational.parse("0.9")
    assert (r.num, r.den) == (9, 10)
    assert r.le_ratio(9, 10) and r.le_ratio(91, 100)
    assert not r.le_ratio(89, 100)
    assert Rational.parse("9/10") == r
    assert r.mul_ceil(10) == 9 and r.mul_ceil(11) == 10


def test_seq_name_convention():
    n = SeqName.parse("BRUAB&chr1&c")
    assert n.genome == "BRUAB" and n.circular
    assert str(n) == "BRUAB&chr1&c"


@pytest.fixture
def tiny_arena():
    return GenomeArena.from_strings(
        {"G1&c1&l": "ACGTACGTAA", "G2&c1&l": "TTACGTACGT"}
    )


def test_arena_offsets_and_slices(tiny_arena):
    a = tiny_arena
    assert a.n_seqs == 2 and a.total_length == 20
    assert a.seq_len(0) == 10
    assert C.decode(a.fragment_codes(0, 0, 4, 1)) == "ACGT"
    # ori=-1: revcomp of the occupied range
    assert C.decode(a.fragment_codes(0, 0, 4, -1)) == "ACGT"  # ACGT is its own rc
    assert C.decode(a.fragment_codes(1, 0, 3, -1)) == "TAA"  # rc("TTA")
    assert a.genomes() == ["G1", "G2"]
    assert a.seq_id_of_pos().tolist() == [0] * 10 + [1] * 10


def test_gapless_block_rows_and_slice(tiny_arena):
    # G1[0:8) forward vs G2[2:10) forward are both ACGTACGT
    frags = FragmentTable.from_rows([(0, 0, 8, 1), (1, 2, 8, 1)])
    b = Block(frags)
    rows = b.rows(tiny_arena)
    assert C.decode(rows[0]) == "ACGTACGT" == C.decode(rows[1])
    ident, gapless = (make_stat(b, tiny_arena).ident_nogap, b.n_cols)
    assert ident == 8
    sub = b.slice(2, 6)
    assert sub.n_cols == 4
    assert sub.frags.row(0) == (0, 2, 4, 1)
    assert sub.frags.row(1) == (1, 4, 4, 1)


def test_minus_strand_slice(tiny_arena):
    # ori=-1 fragment: text range [t0,t1) maps to seq [start+len-t1, start+len-t0)
    frags = FragmentTable.from_rows([(0, 2, 6, -1)])
    b = Block(frags)
    text = C.decode(b.rows(tiny_arena)[0])
    assert text == C.decode(C.revcomp(tiny_arena.seq_codes(0)[2:8]))
    sub = b.slice(1, 4)
    s, st, ln, o = sub.frags.row(0)
    assert (s, ln, o) == (0, 3, -1)
    assert C.decode(sub.rows(tiny_arena)[0]) == text[1:4]


def test_gapped_block_slice():
    arena = GenomeArena.from_strings({"A&c&l": "ACGTT", "B&c&l": "ACTT"})
    # alignment: A: ACGTT / B: AC-TT
    aln = np.stack([C.encode("ACGTT"), C.encode("AC-TT")])
    b = Block(FragmentTable.from_rows([(0, 0, 5, 1), (1, 0, 4, 1)]), aln)
    sub = b.slice(1, 4)  # columns CGT / C-T
    assert sub.frags.row(0) == (0, 1, 3, 1)
    assert sub.frags.row(1) == (1, 1, 2, 1)
    assert C.decode(sub.alignment[1]) == "C-T"


def test_block_inverse(tiny_arena):
    frags = FragmentTable.from_rows([(0, 0, 8, 1), (1, 2, 8, 1)])
    b = Block(frags)
    inv = b.inverse()
    rows = inv.rows(tiny_arena)
    assert C.decode(rows[0]) == C.decode(C.revcomp(b.rows(tiny_arena)[0]))


def test_consensus_majority():
    arena = GenomeArena.from_strings(
        {"A&c&l": "ACGT", "B&c&l": "ACGT", "C&c&l": "AGGT"}
    )
    b = Block(
        FragmentTable.from_rows([(0, 0, 4, 1), (1, 0, 4, 1), (2, 0, 4, 1)])
    )
    assert C.decode(b.consensus(arena)) == "ACGT"


def test_identity_and_good_block():
    cfg = default_config().replace(MIN_LENGTH=4, MIN_END=1, MIN_IDENTITY="0.75")
    arena = GenomeArena.from_strings({"A&c&l": "ACGTACGT", "B&c&l": "ACGAACGT"})
    b = Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 0, 8, 1)]))
    num, den = block_identity(b, arena)
    assert (num, den) == (7, 8)
    assert is_good_block(b, arena, cfg)
    assert not is_good_block(b, arena, cfg.replace(MIN_IDENTITY="0.95"))
    # bad ends: MIN_END=4 requires first 4 columns identical; col 3 differs
    assert not is_good_block(b, arena, cfg.replace(MIN_END=4))


def test_hashes_order_independent(tiny_arena):
    f1 = FragmentTable.from_rows([(0, 0, 8, 1), (1, 2, 8, 1)])
    f2 = FragmentTable.from_rows([(1, 2, 8, 1), (0, 0, 8, 1)])
    b1, b2 = Block(f1), Block(f2)
    assert block_hash(b1, tiny_arena) == block_hash(b2, tiny_arena)
    bs1 = BlockSet(tiny_arena, [b1])
    bs2 = BlockSet(tiny_arena, [b2])
    assert blockset_hash(bs1) == blockset_hash(bs2)
    bs2.add(Block(FragmentTable.from_rows([(0, 8, 2, 1)])))
    assert blockset_hash(bs1) != blockset_hash(bs2)


def test_naming(tiny_arena):
    bs = BlockSet(
        tiny_arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 2, 8, 1)])),
            Block(FragmentTable.from_rows([(0, 8, 2, 1)])),
        ],
    )
    assign_names(bs)
    names = sorted(b.name for b in bs.blocks)
    assert names == ["s2x8", "u1x2"]


def test_blockset_hash_duplicates_not_cancelled(tiny_arena):
    """Regression: an XOR fold cancels duplicate blocks ({A, A, B} == {B});
    the sorted hash-of-hashes must distinguish multiplicity."""
    a = Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 2, 8, 1)]))
    a2 = Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 2, 8, 1)]))
    b = Block(FragmentTable.from_rows([(0, 8, 2, 1)]))
    bs_aab = BlockSet(tiny_arena, [a, a2, b])
    bs_b = BlockSet(tiny_arena, [b])
    bs_aab2 = BlockSet(tiny_arena, [a2, b, a])
    assert blockset_hash(bs_aab) != blockset_hash(bs_b)
    assert blockset_hash(bs_aab) == blockset_hash(bs_aab2)


def test_link_equal_fragments_na_by_design(tiny_arena):
    """LinkEqualFragments subsumption proof (reference src/algo/
    LinkEqualFragments.cpp [B]; COMPONENTS.md claims N/A-by-design).

    The reference links duplicate Fragment heap objects so that equal
    fragments compare/share identically. Here fragments are VALUE rows in
    SoA tables, so the two properties linking buys are intrinsic:

    1. value-equal rows built independently are indistinguishable to every
       consumer (hashing here; overlap admission and FragmentIndex read
       only the values);
    2. there is no aliasing hazard for linking to manage — "linked"
       (buffer-sharing) and copied tables behave identically, and
       mutating one never affects the other.
    """
    rows = [(0, 0, 8, 1), (1, 2, 8, 1)]
    a = Block(FragmentTable.from_rows(rows))
    b = Block(FragmentTable.from_rows(rows))  # independent allocation
    assert a.frags.seq_id is not b.frags.seq_id
    assert block_hash(a, tiny_arena) == block_hash(b, tiny_arena)
    # a buffer-sharing ("linked") view is also indistinguishable
    linked = Block(
        FragmentTable(a.frags.seq_id, a.frags.start, a.frags.length, a.frags.ori)
    )
    assert block_hash(linked, tiny_arena) == block_hash(a, tiny_arena)
    assert blockset_hash(BlockSet(tiny_arena, [a, b])) == blockset_hash(
        BlockSet(tiny_arena, [linked, b])
    )
    # no aliasing: mutating one independent copy leaves the other intact
    b.frags.start[0] = 5
    assert a.frags.start[0] == 0
    assert block_hash(a, tiny_arena) != block_hash(b, tiny_arena)
