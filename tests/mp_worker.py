"""Worker for test_distributed_two_process: one jax.distributed process.

Usage: python mp_worker.py <process_id> <num_processes> <coordinator> <out>
Computes the multihost anchor scan on a fixed synthetic world and writes a
digest of the merged groups (identical on every process and identical to the
single-process scan)."""

import hashlib
import os
import sys


def main():
    pid, nproc, coord, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from npge_tpu.config import default_config
    from npge_tpu.parallel.distributed import multihost_find_anchors
    from npge_tpu.util.synthetic import synthetic_arena

    arena = synthetic_arena(
        n_genomes=3, length=20_000, seed=31, sub_rate=0.004,
        indel_rate=0.0005, n_inversions=1,
    )
    cfg = default_config().replace(ANCHOR_SIZE=17, MINIMIZER_WINDOW=6)
    groups = multihost_find_anchors(arena, cfg)
    d = hashlib.sha256()
    for a in (groups.offsets, groups.pos, groups.seq_id, groups.strand):
        d.update(a.tobytes())
    with open(out, "w") as fh:
        fh.write(f"{groups.n_groups} {len(groups.pos)} {d.hexdigest()}\n")


if __name__ == "__main__":
    main()
