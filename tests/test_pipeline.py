"""End-to-end pipeline tests: the minimum slice of SURVEY.md §7
(2 genomes, one chip) plus determinism and validator gates."""

import numpy as np

from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.config import default_config
from npge_tpu.model.hashing import blockset_hash
from npge_tpu.model.stats import is_good_block
from npge_tpu.util.synthetic import synthetic_arena


def small_cfg():
    return default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3
    )


def test_two_genome_pangenome_valid():
    arena = synthetic_arena(
        n_genomes=2, length=8000, seed=42, sub_rate=0.01, indel_rate=0.0
    )
    cfg = small_cfg()
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, rep.messages
    # most of the genome should sit in multi-fragment blocks at 1% divergence
    multi = sum(b.n_frags * b.n_cols for b in bs.blocks if b.n_frags >= 2)
    total = arena.total_length
    assert multi / total > 0.55, f"only {multi}/{total} in shared blocks"


def test_pangenome_deterministic():
    arena = synthetic_arena(n_genomes=2, length=5000, seed=3, indel_rate=0.0)
    cfg = small_cfg()
    h = [blockset_hash(build_pangenome(arena, cfg)[0]) for _ in range(2)]
    assert h[0] == h[1]


def test_three_genomes_with_inversion():
    arena = synthetic_arena(
        n_genomes=3, length=6000, seed=11, sub_rate=0.008,
        indel_rate=0.0, n_inversions=1,
    )
    cfg = small_cfg()
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, rep.messages
    # inversion should produce at least one mixed-orientation block
    mixed = [
        b for b in bs.blocks
        if b.n_frags >= 2 and len(set(b.frags.ori.tolist())) > 1
    ]
    assert mixed, "expected mixed-orientation blocks from the inversion"


def test_all_blocks_good():
    arena = synthetic_arena(n_genomes=2, length=4000, seed=8, indel_rate=0.0)
    cfg = small_cfg()
    bs, _ = build_pangenome(arena, cfg)
    for b in bs.blocks:
        assert is_good_block(b, bs.arena, cfg)
