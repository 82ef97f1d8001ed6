"""Multi-host partitioned scan: slices must union to the single-host scan
bit-for-bit (the distributed correctness bar with the halo recipe)."""

import numpy as np

from npge_tpu.algo.anchors import find_anchors, form_groups
from npge_tpu.config import default_config
from npge_tpu.parallel.distributed import host_slice, multihost_find_anchors, scan_slice
from npge_tpu.util.synthetic import synthetic_arena


def test_host_slice_partition():
    parts = [host_slice(103, i, 4) for i in range(4)]
    assert parts[0][0] == 0 and parts[-1][1] == 103
    for (a, b), (c, d) in zip(parts, parts[1:]):
        assert b == c


def test_sliced_scan_unions_to_single_host():
    arena = synthetic_arena(n_genomes=2, length=6000, seed=31, indel_rate=0.0)
    cfg = default_config().replace(ANCHOR_SIZE=17, MINIMIZER_WINDOW=8)
    single = find_anchors(arena, cfg)
    for pc in (2, 5):
        hs, ls, ps, ss = [], [], [], []
        for pi in range(pc):
            lo, hi = host_slice(arena.total_length, pi, pc)
            h, l, p, s = scan_slice(arena, cfg, cfg.ANCHOR_SIZE, lo, hi)
            hs.append(h)
            ls.append(l)
            ps.append(p)
            ss.append(s)
        h = np.concatenate(hs)
        l = np.concatenate(ls)
        p = np.concatenate(ps)
        s = np.concatenate(ss)
        order = np.lexsort((p, l, h))
        merged = form_groups(
            h[order], l[order], p[order], s[order], arena, cfg, cfg.ANCHOR_SIZE
        )
        np.testing.assert_array_equal(merged.offsets, single.offsets)
        np.testing.assert_array_equal(merged.pos, single.pos)
        np.testing.assert_array_equal(merged.strand, single.strand)


def test_multihost_single_process_equals_find_anchors():
    arena = synthetic_arena(n_genomes=2, length=3000, seed=9, indel_rate=0.0)
    cfg = default_config().replace(ANCHOR_SIZE=17, MINIMIZER_WINDOW=8)
    a = find_anchors(arena, cfg)
    b = multihost_find_anchors(arena, cfg)
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.pos, b.pos)
