"""C++ greedy resolver parity with the Python path (bit-exact)."""

import numpy as np

from npge_tpu import native
from npge_tpu.algo.anchors import find_anchors
from npge_tpu.algo.extender import extend_anchor_groups
from npge_tpu.algo.overlaps import resolve_overlaps
from npge_tpu.config import default_config
from npge_tpu.model.blocks import BlockSet
from npge_tpu.model.hashing import blockset_hash
from npge_tpu.util.synthetic import synthetic_arena


def test_native_resolver_matches_python():
    assert native.have_native()
    arena = synthetic_arena(
        n_genomes=3, length=8000, seed=17, sub_rate=0.015,
        indel_rate=0.0, n_inversions=1,
    )
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=4, MIN_LENGTH=60, MIN_END=3
    )
    groups = find_anchors(arena, cfg)
    cand = extend_anchor_groups(arena, groups, cfg)
    assert len(cand) > 100
    a = resolve_overlaps(cand, arena, cfg, use_native=True)
    b = resolve_overlaps(cand, arena, cfg, use_native=False)
    ha = blockset_hash(BlockSet(arena, a))
    hb = blockset_hash(BlockSet(arena, b))
    assert len(a) == len(b)
    assert ha == hb, "native and python resolver diverge"
