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


def test_multi_chromosome_genomes():
    """Two genomes x two chromosomes: blocks must never mix chromosomes of
    one genome into a 'stem' classification wrongly, and the partition holds
    per sequence."""
    import numpy as np
    from npge_tpu.model.arena import GenomeArena
    from npge_tpu.util.synthetic import mutate, random_ancestor

    rng = np.random.default_rng(71)
    chr1 = random_ancestor(rng, 4000)
    chr2 = random_ancestor(rng, 3000)
    arena = GenomeArena(
        ["GA&chr1&c", "GA&chr2&c", "GB&chr1&c", "GB&chr2&c"],
        [
            mutate(rng, chr1, sub_rate=0.01, indel_rate=0.0),
            mutate(rng, chr2, sub_rate=0.01, indel_rate=0.0),
            mutate(rng, chr1, sub_rate=0.01, indel_rate=0.0),
            mutate(rng, chr2, sub_rate=0.01, indel_rate=0.0),
        ],
    )
    cfg = small_cfg()
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, rep.messages
    assert arena.genomes() == ["GA", "GB"]
    # stem blocks pair chr1-with-chr1 and chr2-with-chr2 (one frag per genome)
    stems = [b for b in bs.blocks if (b.name or "").startswith("s")]
    assert stems
    for b in stems:
        chrs = {bs.arena.parsed[int(s)].chromosome for s in b.frags.seq_id}
        assert len(chrs) == 1, "a stem block must stay on one chromosome"
