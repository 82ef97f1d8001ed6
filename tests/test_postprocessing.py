"""Post-processing battery: reports, mutations, trees, BSA, algebra."""

import numpy as np

from npge_tpu.algo.algebra import one_by_one, stem, subtract, union
from npge_tpu.algo.bsa import exact_stem_bsa
from npge_tpu.algo.mutations import mutations_tsv
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.algo.reports import block_info_tsv, blockset_summary, info_text
from npge_tpu.algo.trees import block_tree, consensus_tree, distances_tsv, fragment_distances
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.model.naming import assign_names
from npge_tpu.util.trees import majority_consensus, neighbor_joining, upgma
from npge_tpu.util.synthetic import synthetic_arena


def small_world():
    arena = synthetic_arena(n_genomes=3, length=4000, seed=12, indel_rate=0.0)
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3
    )
    bs, _ = build_pangenome(arena, cfg)
    return bs, cfg


def test_summary_and_reports():
    bs, cfg = small_world()
    s = blockset_summary(bs, cfg)
    assert s["genomes"] == 3 and s["blocks"] == len(bs.blocks)
    assert 0.5 < s["shared_fraction"] <= 1.0
    text = info_text(bs)
    assert "blocks:" in text and "type s" in text
    tsv = block_info_tsv(bs)
    assert tsv.count("\n") == len(bs.blocks) + 1


def test_mutations_tsv():
    arena = GenomeArena.from_strings(
        {"A&c&l": "ACGTACGT", "B&c&l": "ACCTACGT"}
    )
    bs = BlockSet(
        arena, [Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 0, 8, 1)]))]
    )
    assign_names(bs)
    tsv = mutations_tsv(bs)
    lines = tsv.strip().splitlines()
    assert len(lines) == 2  # header + 1 substitution at col 2
    assert "\t2\t" in lines[1]


def test_nj_upgma_and_consensus():
    # 4 taxa, additive distances
    names = ["a", "b", "c", "d"]
    d = np.array(
        [
            [0, 2, 6, 6],
            [2, 0, 6, 6],
            [6, 6, 0, 2],
            [6, 6, 2, 0],
        ],
        float,
    )
    for fn in (neighbor_joining, upgma):
        t = fn(d, names)
        assert sorted(t.leaves()) == names
        nwk = t.newick()
        # a,b and c,d must be sister pairs
        assert ("a" in nwk and "b" in nwk)
    cons = majority_consensus([neighbor_joining(d, names)] * 3, names)
    assert sorted(cons.leaves()) == names


def test_block_trees_and_consensus_tree():
    bs, _ = small_world()
    tree, n_used = consensus_tree(bs)
    assert n_used > 0
    assert sorted(tree.leaves()) == sorted(bs.arena.genomes())
    dtsv = distances_tsv(bs)
    assert dtsv.startswith("block\t")


def test_exact_stem_bsa():
    bs, _ = small_world()
    bsa = exact_stem_bsa(bs)
    assert len(bsa.seq_names) == 3
    assert len(bsa.columns) >= 1
    # every row references every scaffold block (no rearrangements here)
    for row in bsa.table:
        assert all(e != "." for e in row)
    assert "sequence\t" in bsa.tsv()


def test_algebra():
    arena = GenomeArena.from_strings(
        {"A&c&l": "ACGTACGTACGT", "B&c&l": "ACGTACGTACGT"}
    )
    b1 = Block(FragmentTable.from_rows([(0, 0, 6, 1), (1, 0, 6, 1)]))
    b2 = Block(FragmentTable.from_rows([(0, 6, 6, 1), (1, 6, 6, 1)]))
    b3 = Block(FragmentTable.from_rows([(0, 4, 4, 1), (1, 4, 4, 1)]))
    t = BlockSet(arena, [b1])
    o = BlockSet(arena, [b2, b3])
    assert len(union(t, o)) == 3
    assert len(subtract(o, t)) == 1  # b3 overlaps b1 -> dropped
    merged = one_by_one(t, o)
    assert len(merged) == 2  # b2 fits, b3 conflicts with b1
    s = stem(BlockSet(arena, [b1, Block(FragmentTable.from_rows([(0, 6, 6, 1)]))]))
    assert len(s) == 1


def test_subset_arena_and_blocks_dir(tmp_path):
    from npge_tpu.algo.algebra import subset_arena
    from npge_tpu.io.bs import write_blocks_dir

    bs, _ = small_world()
    names = bs.arena.names[:2]
    sub = subset_arena(bs, names)
    assert sub.arena.n_seqs == 2
    # blocks kept only when fully inside the subset
    for b in sub.blocks:
        assert set(b.frags.seq_id.tolist()) <= {0, 1}
    n = write_blocks_dir(bs, str(tmp_path / "blocks"))
    assert n == len(bs.blocks)
    files = list((tmp_path / "blocks").iterdir())
    assert len(files) == n
