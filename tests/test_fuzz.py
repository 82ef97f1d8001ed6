"""Randomized end-to-end robustness: every synthetic world, whatever the
mutation mix, must produce a valid pangenome (IsPangenome green) with a
deterministic hash."""

import numpy as np
import pytest

from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.config import default_config
from npge_tpu.model.hashing import blockset_hash
from npge_tpu.util.synthetic import synthetic_arena

CASES = [
    # (n_genomes, length, sub, indel, inversions, seed)
    (2, 4000, 0.002, 0.0, 0, 101),
    (2, 4000, 0.03, 0.001, 1, 102),
    (4, 3000, 0.01, 0.0005, 2, 103),
    (3, 2500, 0.05, 0.002, 0, 104),   # heavy divergence
    (5, 2000, 0.005, 0.0, 1, 105),
    (2, 1000, 0.0, 0.0, 0, 106),      # identical genomes
    (3, 3000, 0.015, 0.0015, 3, 107), # indel + inversion rich
]


@pytest.mark.parametrize("ng,length,sub,indel,inv,seed", CASES)
def test_fuzz_world_valid(ng, length, sub, indel, inv, seed):
    arena = synthetic_arena(
        n_genomes=ng, length=length, seed=seed, sub_rate=sub,
        indel_rate=indel, n_inversions=inv,
    )
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=6, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=4,
    )
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, (seed, rep.messages)
    h1 = blockset_hash(bs)
    bs2, _ = build_pangenome(arena, cfg)
    assert blockset_hash(bs2) == h1, "non-deterministic result"


def test_world_with_assembly_gaps_of_N():
    """N runs (assembly gaps) must be handled: no anchors inside them, valid
    partition around them."""
    arena = synthetic_arena(n_genomes=2, length=5000, seed=55, indel_rate=0.0)
    seqs = [arena.seq_codes(i).copy() for i in range(2)]
    for s in seqs:
        s[1000:1100] = 4  # N run
        s[3000:3010] = 4
    from npge_tpu.model.arena import GenomeArena

    arena2 = GenomeArena(arena.names, seqs)
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=6, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=3,
    )
    bs, _ = build_pangenome(arena2, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, rep.messages
    # no multi-fragment block may contain an all-N column: such a column
    # can never satisfy the identical-column rule, so the builder must not
    # have extended through it
    for b in bs.blocks:
        if b.n_frags >= 2:
            rows = b.rows(bs.arena)
            all_n_cols = (rows == 4).all(axis=0)
            assert not all_n_cols.any(), (
                f"block {b.name}: {int(all_n_cols.sum())} all-N columns"
            )


@pytest.mark.parametrize("ng,length,sub,indel,inv,seed", [
    (3, 3000, 0.01, 0.001, 1, 108),
    (4, 2500, 0.004, 0.0008, 2, 109),
    (2, 2000, 0.03, 0.002, 0, 110),
])
def test_fuzz_circular_world_valid(ng, length, sub, indel, inv, seed):
    """Circular genomes: origin-wrap fragments, cyclic anchors, origin
    joins — same validity + determinism bar as the linear fuzz."""
    arena = synthetic_arena(
        n_genomes=ng, length=length, seed=seed, sub_rate=sub,
        indel_rate=indel, n_inversions=inv, circular=True,
    )
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=6, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=4,
    )
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, (seed, rep.messages)
    h1 = blockset_hash(bs)
    bs2, _ = build_pangenome(arena, cfg)
    assert blockset_hash(bs2) == h1, "non-deterministic result"
