import numpy as np

from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.algo.joiner import join_blocks, joinable_pairs
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.util import codes as C


def two_genome_world():
    # two genomes, identical 12bp sequences
    return GenomeArena.from_strings(
        {"A&c&l": "ACGTACGTACGT", "B&c&l": "ACGTACGTACGT"}
    )


def test_joinable_adjacent_plus_strand():
    arena = two_genome_world()
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 6, 1), (1, 0, 6, 1)])),
            Block(FragmentTable.from_rows([(0, 6, 6, 1), (1, 6, 6, 1)])),
        ],
    )
    pairs = joinable_pairs(bs)
    assert len(pairs) == 1 and pairs[0][:2] == (0, 1)
    n = join_blocks(bs)
    assert n == 1 and len(bs.blocks) == 1
    b = bs.blocks[0]
    assert b.n_frags == 2 and b.n_cols == 12
    assert C.decode(b.rows(arena)[0]) == "ACGTACGTACGT"


def test_joinable_minus_strand_direction():
    arena = two_genome_world()
    # both fragments minus strand: column order runs right-to-left on seq,
    # so the later-on-sequence block comes FIRST in column space
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 6, 6, -1), (1, 6, 6, -1)])),
            Block(FragmentTable.from_rows([(0, 0, 6, -1), (1, 0, 6, -1)])),
        ],
    )
    pairs = joinable_pairs(bs)
    assert len(pairs) == 1
    join_blocks(bs)
    assert len(bs.blocks) == 1
    b = bs.blocks[0]
    assert C.decode(b.rows(arena)[0]) == C.decode(
        C.revcomp(arena.seq_codes(0))
    )


def test_joinable_opposite_representation():
    # a block stored in inverted representation is STILL joinable (the
    # joiner must be representation-invariant; the join flips it back)
    arena = two_genome_world()
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 6, 1), (1, 0, 6, 1)])),
            Block(FragmentTable.from_rows([(0, 6, 6, -1), (1, 6, 6, -1)])),
        ],
    )
    assert len(joinable_pairs(bs)) >= 1
    join_blocks(bs)
    assert len(bs.blocks) == 1
    b = bs.blocks[0].canonicalize()
    assert C.decode(b.rows(arena)[0]) == "ACGTACGTACGT"


def test_not_joinable_inconsistent_ori_or_nonadjacent():
    arena = two_genome_world()
    # genuinely inconsistent: relative orientation differs between genomes
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 6, 1), (1, 0, 6, 1)])),
            Block(FragmentTable.from_rows([(0, 6, 6, -1), (1, 6, 6, 1)])),
        ],
    )
    assert joinable_pairs(bs) == []
    bs2 = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 4, 1), (1, 0, 4, 1)])),
            Block(FragmentTable.from_rows([(0, 6, 6, 1), (1, 6, 6, 1)])),
        ],
    )
    assert joinable_pairs(bs2) == []


def test_is_pangenome_report():
    cfg = default_config().replace(MIN_LENGTH=4, MIN_END=1)
    arena = two_genome_world()
    # perfect partition: one stem block + joined coverage
    bs = BlockSet(
        arena,
        [Block(FragmentTable.from_rows([(0, 0, 12, 1), (1, 0, 12, 1)]))],
    )
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, rep.messages

    # uncovered tail -> not a pangenome
    bs2 = BlockSet(
        arena,
        [Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 0, 8, 1)]))],
    )
    rep2 = check_is_pangenome(bs2, cfg)
    assert not rep2.ok and rep2.uncovered_positions == 8

    # joinable split -> not a pangenome
    bs3 = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 6, 1), (1, 0, 6, 1)])),
            Block(FragmentTable.from_rows([(0, 6, 6, 1), (1, 6, 6, 1)])),
        ],
    )
    rep3 = check_is_pangenome(bs3, cfg)
    assert not rep3.ok and rep3.joinable == 1


def test_deep_check_reseed_emptiness():
    from npge_tpu.algo.pangenome import build_pangenome
    from npge_tpu.config import default_config
    from npge_tpu.util.synthetic import synthetic_arena

    arena = synthetic_arena(n_genomes=3, length=5000, seed=19, indel_rate=0.0)
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=4,
    )
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg, deep=True)
    assert rep.ok, rep.messages
