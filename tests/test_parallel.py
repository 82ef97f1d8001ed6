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


def test_sharded_extension_splits_work_per_device():
    """The extension stage under a mesh must (a) produce candidate blocks
    bit-identical to the single-device run and (b) actually SPLIT the batch:
    every device owns exactly 1/N of the padded group axis (VERDICT r2
    item 4 — extension was previously replicated, N devices bought zero
    extension parallelism)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from npge_tpu.algo.anchors import find_anchors
    from npge_tpu.algo.extender import extend_anchor_groups
    from npge_tpu.ops.extend import extend_rounds_rows, make_codes2_rows
    import jax.numpy as jnp

    arena = synthetic_arena(n_genomes=3, length=6000, seed=3, indel_rate=0.0)
    cfg = default_config().replace(ANCHOR_SIZE=17, MINIMIZER_WINDOW=8)
    groups = find_anchors(arena, cfg)
    single = extend_anchor_groups(arena, groups, cfg)
    mesh = make_mesh(8)
    meshed = extend_anchor_groups(arena, groups, cfg, mesh=mesh)
    assert len(single) == len(meshed)
    for a, b in zip(single, meshed):
        np.testing.assert_array_equal(a.frags.start, b.frags.start)
        np.testing.assert_array_equal(a.frags.length, b.frags.length)

    # per-device split: run the underlying op with a sharded batch and
    # check each device holds exactly B/N rows of input AND output
    B, F, chunk = 256, 2, 64
    T = arena.total_length
    rows = make_codes2_rows(jnp.asarray(arena.codes))
    rng = np.random.default_rng(0)
    base = rng.integers(0, T, (B, F)).astype(np.int32)
    fmask = np.ones((B, F), bool)
    cap = np.full((B, F), chunk, np.int32)
    sh = NamedSharding(mesh, P("d", None))
    base_sh = jax.device_put(base, sh)
    assert base_sh.addressable_shards[0].data.shape[0] == B // 8
    total, _ = extend_rounds_rows(
        rows, 2 * T, base_sh, jax.device_put(fmask, sh),
        jax.device_put(cap, sh), 9, 10, chunk, 2,
    )
    out_shard_rows = {
        s.data.shape[0] for s in total.addressable_shards
    }
    assert out_shard_rows == {B // 8}
    # and the sharded result equals the unsharded one
    total1, _ = extend_rounds_rows(
        rows, 2 * T, base, fmask, cap, 9, 10, chunk, 2
    )
    np.testing.assert_array_equal(np.asarray(total), np.asarray(total1))


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
