"""Mesh-sharded stages must be bit-identical to single-device results
(the distributed correctness bar, SURVEY.md §4) — run on the 8-virtual-
device CPU mesh from conftest."""

import numpy as np

import jax

from npge_tpu.algo.anchors import find_anchors
from npge_tpu.config import default_config
from npge_tpu.parallel.mesh import make_mesh
from npge_tpu.parallel.sharded import sharded_find_anchors
from npge_tpu.util.synthetic import synthetic_arena


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_anchors_match_single_device():
    arena = synthetic_arena(n_genomes=2, length=4000, seed=21, indel_rate=0.0)
    cfg = default_config().replace(ANCHOR_SIZE=17, MINIMIZER_WINDOW=8)
    single = find_anchors(arena, cfg)
    for n in (2, 8):
        mesh = make_mesh(n)
        sharded = sharded_find_anchors(arena, cfg, mesh)
        np.testing.assert_array_equal(sharded.offsets, single.offsets)
        np.testing.assert_array_equal(sharded.pos, single.pos)
        np.testing.assert_array_equal(sharded.seq_id, single.seq_id)
        np.testing.assert_array_equal(sharded.strand, single.strand)


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    assert int(np.asarray(out[0])) > 0  # some positions selected
    ge.dryrun_multichip(8)


def test_full_pipeline_mesh_equals_single_device():
    from npge_tpu.algo.pangenome import build_pangenome
    from npge_tpu.model.hashing import blockset_hash

    arena = synthetic_arena(
        n_genomes=3, length=5000, seed=13, sub_rate=0.01, indel_rate=0.0005
    )
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=3,
    )
    single, _ = build_pangenome(arena, cfg)
    meshed, _ = build_pangenome(arena, cfg, mesh=make_mesh(8))
    assert blockset_hash(meshed) == blockset_hash(single)
