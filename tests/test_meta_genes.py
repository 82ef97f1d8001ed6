"""Meta registry / Pipe / script parity + gene mapping."""

import numpy as np

from npge_tpu import meta
from npge_tpu.algo.genes import (
    Gene,
    gene_groups,
    gene_groups_tsv,
    partition_genes,
    partition_tsv,
    read_genes_tsv,
    read_gff3,
)
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.util.synthetic import synthetic_arena


def test_meta_registry_pipe():
    arena = synthetic_arena(n_genomes=2, length=3000, seed=2, indel_rate=0.0)
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3
    )
    bs = BlockSet(arena, [])
    out = meta.get("Pangenome")(bs, cfg)
    assert len(out.blocks) > 0
    assert all(b.name for b in out.blocks)
    # unknown name raises with the known list
    try:
        meta.get("NoSuchProcessor")
        assert False
    except KeyError as e:
        assert "AnchorFinder" in str(e)


def test_meta_run_script(tmp_path):
    arena = GenomeArena.from_strings({"A&c&l": "ACGT" * 10, "B&c&l": "ACGT" * 10})
    bs = BlockSet(arena, [])
    script = tmp_path / "s.py"
    script.write_text(
        "bs = meta.get('Rest')(bs, cfg)\n"
        "bs = meta.get('UniqueNames')(bs, cfg)\n"
    )
    cfg = default_config()
    out = meta.run_script(str(script), bs, cfg)
    assert len(out.blocks) == 2


def two_genome_bs():
    arena = GenomeArena.from_strings(
        {"A&c&l": "ACGTACGTACGT", "B&c&l": "ACGTACGTACGT"}
    )
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 0, 8, 1)]), name="s2x8"),
            Block(FragmentTable.from_rows([(0, 8, 4, 1)]), name="uA"),
            Block(FragmentTable.from_rows([(1, 8, 4, 1)]), name="uB"),
        ],
    )
    return bs


def test_partition_and_groups():
    bs = two_genome_bs()
    genes = [
        Gene(0, 1, 7, 1, "geneA1"),
        Gene(1, 2, 6, 1, "geneB1"),
        Gene(0, 6, 11, 1, "geneA2"),  # spans block boundary
    ]
    parts = partition_genes(genes, bs)
    assert parts[0].pieces == [("s2x8", 1, 7)]
    assert parts[1].pieces == [("s2x8", 2, 6)]
    assert [p[0] for p in parts[2].pieces] == ["s2x8", "uA"]
    groups = gene_groups(genes, bs)
    assert set(groups["s2x8"]) >= {genes[0], genes[1]}
    tsv = gene_groups_tsv(genes, bs)
    assert "geneA1" in tsv and tsv.startswith("block\t")
    ptsv = partition_tsv(genes, bs)
    assert "geneA2" in ptsv and "uA:" in ptsv


def test_read_gff3_and_tsv(tmp_path):
    bs = two_genome_bs()
    gff = tmp_path / "x.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "A&c&l\tsrc\tgene\t2\t7\t.\t+\t.\tID=g1;product=thing\n"
        "A&c&l\tsrc\tregion\t1\t12\t.\t+\t.\tID=skip\n"
        "unknown\tsrc\tgene\t1\t4\t.\t-\t.\tID=g2\n"
    )
    genes = read_gff3(str(gff), bs)
    assert len(genes) == 1
    assert genes[0].gene_id == "g1" and genes[0].start == 1 and genes[0].end == 7
    tsv = tmp_path / "g.tsv"
    tsv.write_text("B&c&l\t0\t4\t-\tg3\tstuff\n")
    genes2 = read_genes_tsv(str(tsv), bs)
    assert genes2[0].strand == -1 and genes2[0].gene_id == "g3"
