"""Consensus re-seed loop: ConSeq/DeConSeq mapping + coverage refinement."""

import numpy as np

from npge_tpu.algo.conseq import consensus_arena, deconseq
from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.util import codes as C
from npge_tpu.util.synthetic import synthetic_arena


def test_consensus_arena_and_deconseq_roundtrip():
    arena = GenomeArena.from_strings(
        {"A&c&l": "ACGTACGTACGT", "B&c&l": "ACGTACGTACGT"}
    )
    bs = BlockSet(
        arena, [Block(FragmentTable.from_rows([(0, 0, 12, 1), (1, 0, 12, 1)]))]
    )
    cons, src = consensus_arena(bs)
    assert cons.n_seqs == 1 and src[0][0] == 0
    assert np.array_equal(src[0][1], np.arange(12))
    assert C.decode(cons.seq_codes(0)) == "ACGTACGTACGT"
    # a candidate on the consensus maps back to all source fragments
    cand = [Block(FragmentTable.from_rows([(0, 2, 8, 1), (0, 2, 8, 1)]))]
    # (degenerate 2-frag candidate over the same cons seq twice)
    mapped = deconseq(cand, src, bs)
    assert len(mapped) == 1 and mapped[0].n_frags == 4


def test_deconseq_orientation_flip():
    arena = GenomeArena.from_strings({"A&c&l": "AACCGGTTAACC"})
    bs = BlockSet(arena, [Block(FragmentTable.from_rows([(0, 0, 12, 1)]))])
    cons, src = consensus_arena(bs)
    cand = [Block(FragmentTable.from_rows([(0, 0, 6, -1)]))]
    mapped = deconseq(cand, src, bs)
    # single-fragment results are dropped (len < 2)
    assert mapped == []
    cand2 = [Block(FragmentTable.from_rows([(0, 0, 6, -1), (0, 6, 6, 1)]))]
    mapped2 = deconseq(cand2, src, bs)
    assert len(mapped2) == 1
    rows = mapped2[0].rows(arena)
    assert C.decode(rows[0]) == C.decode(C.revcomp(arena.seq_codes(0)[0:6]))
    assert C.decode(rows[1]) == C.decode(arena.seq_codes(0)[6:12])


def test_reseed_improves_stem_coverage():
    arena = synthetic_arena(
        n_genomes=3, length=12000, seed=5, sub_rate=0.02,
        indel_rate=0.0, n_inversions=1,
    )
    cfg = default_config().replace(
        ANCHOR_SIZE=21, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=6,
    )
    bs, _ = build_pangenome(arena, cfg)
    rep = check_is_pangenome(bs, cfg)
    assert rep.ok, rep.messages
    shared = sum(b.n_frags * b.n_cols for b in bs.blocks if b.n_frags >= 2)
    assert shared / arena.total_length > 0.95


def test_deconseq_fast_path_parity():
    from npge_tpu.algo.conseq import _deconseq_fast, _deconseq_general
    from npge_tpu.model.hashing import block_hash

    arena = GenomeArena.from_strings(
        {
            "A&c&l": "ACGTACGTACGTTTTT",
            "B&c&l": "ACGTACGTACGTGGGG",
            "C&c&l": "AAAACGTACGTACGT",
        }
    )
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 12, 1), (1, 0, 12, 1)])),
            Block(FragmentTable.from_rows([(2, 3, 12, 1)])),
            Block(FragmentTable.from_rows([(0, 12, 4, 1), (1, 12, 4, -1)])),
        ],
    )
    cons, src = consensus_arena(bs)
    # candidates on the consensus arena, incl. reverse orientation
    cand = [
        Block(FragmentTable.from_rows([(0, 2, 8, 1), (1, 2, 8, 1)])),
        Block(FragmentTable.from_rows([(0, 0, 6, -1), (1, 4, 6, 1)])),
        Block(FragmentTable.from_rows([(2, 0, 4, 1), (0, 8, 4, -1)])),
    ]
    fast = _deconseq_fast(cand, src, bs)
    slow = _deconseq_general(cand, src, bs)
    assert fast is not None and len(fast) == len(slow) > 0
    ha = sorted(block_hash(b, arena) for b in fast)
    hb = sorted(block_hash(b, arena) for b in slow)
    assert ha == hb


def test_cache_hit_counters_recorded():
    """VERDICT r4 item 10: the reseed loop's cross-round caches must report
    hit/miss counters in StageTimings, and on a multi-round world the
    object-identity caches must actually hit (the host-speed story rests
    on them)."""
    from npge_tpu.algo.pangenome import build_pangenome
    from npge_tpu.config import default_config

    arena = synthetic_arena(
        n_genomes=4, length=60_000, seed=5, sub_rate=0.004,
        indel_rate=0.0003, n_inversions=2,
    )
    bs, tm = build_pangenome(arena, default_config())
    c = tm.counters
    for key in ("cache.cons_hit", "cache.canon_hit", "cache.rest_hit",
                "cache.join_stat_hit", "cache.join_stat_miss"):
        assert c.get(key, 0) > 0, (key, c)
    # identity-carried blocks must make later rounds mostly cache hits
    # (the first round is all misses by definition, so only the consensus
    # cache — keyed to multi-fragment blocks that survive rounds — gets a
    # majority floor)
    assert c["cache.cons_hit"] >= c.get("cache.cons_miss", 0), c


def test_deep_probe_proof_matches_independent_check():
    """The construction loop's `deep.proven_at_kmin` marker claims the
    deep IsPangenome re-seed probe is non-improving WITHOUT running it
    (check --deep reuses it). Verify the claim against the independent
    full deep check across several worlds: whenever the marker is set,
    check_is_pangenome(deep=True) must pass."""
    from npge_tpu.algo.is_pangenome import check_is_pangenome
    from npge_tpu.algo.pangenome import build_pangenome
    from npge_tpu.config import default_config

    proven = 0
    for seed in (5, 21, 77):
        arena = synthetic_arena(
            n_genomes=3, length=40_000, seed=seed, sub_rate=0.005,
            indel_rate=0.0004, n_inversions=1,
        )
        cfg = default_config()
        bs, tm = build_pangenome(arena, cfg)
        if tm.counters.get("deep.proven_at_kmin"):
            proven += 1
            rep = check_is_pangenome(bs, cfg, deep=True)
            assert rep.ok, (seed, rep.messages)
    assert proven >= 2, "marker should be recorded on most worlds"
