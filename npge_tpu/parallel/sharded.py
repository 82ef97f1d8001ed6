"""Sharded pipeline stages: mesh-parallel seed + extend with deterministic
merge.

The distributed-correctness bar (SURVEY.md §4): the blockset produced with N
devices is bit-identical to the 1-device result. Achieved by keeping every
decision rule a pure function of globally-ordered data: the k-mer scan and
extension are elementwise over positions/groups (sharding-invariant), and
candidate compaction goes through one deterministic host-side sort
(key, position) — the all_gather + sorted-dedup merge of SURVEY §2.6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from npge_tpu.config import Config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.ops.kmers import kmer_scan, minimizer_mask
from npge_tpu.parallel.mesh import make_mesh, shard_1d
from npge_tpu.algo.anchors import AnchorGroups


def sharded_anchor_occurrences(
    arena: GenomeArena, cfg: Config, mesh=None, k: int | None = None
):
    """Position-sharded k-mer scan + minimizer sampling over the mesh.

    Pads the arena to the device count (pad code N / seq_id -1 keeps padded
    windows invalid), runs the jit'd scan with inputs sharded over the
    position axis, then compacts + sorts on host. Output arrays are
    identical to the single-device ops.kmers.find_anchor_occurrences.
    """
    k = k or cfg.ANCHOR_SIZE
    mesh = mesh or make_mesh()
    codes_sh, T = shard_1d(mesh, arena.codes, pad_value=4)
    sid_sh, _ = shard_1d(
        mesh, arena.seq_id_of_pos(), pad_value=np.int32(-1)
    )
    canon_hi, canon_lo, strand, valid = kmer_scan(codes_sh, sid_sh, k)
    sel = minimizer_mask(canon_hi, canon_lo, valid, cfg.MINIMIZER_WINDOW)
    sel = sel & (strand != 0)
    sel_np = np.asarray(sel)[:T]
    idx = np.flatnonzero(sel_np).astype(np.int64)
    h = np.asarray(canon_hi)[:T][idx]
    l = np.asarray(canon_lo)[:T][idx]
    s = np.asarray(strand)[:T][idx]
    order = np.lexsort((idx, l, h))  # deterministic global merge order
    return h[order], l[order], idx[order], s[order]


def sharded_find_anchors(
    arena: GenomeArena, cfg: Config, mesh=None, k: int | None = None
) -> AnchorGroups:
    """Mesh-parallel AnchorFinder with single-device-identical output."""
    from npge_tpu.algo.anchors import form_groups

    k = k or cfg.ANCHOR_SIZE
    h, l, pos, strand = sharded_anchor_occurrences(arena, cfg, mesh, k)
    # group formation shared with algo.anchors.find_anchors (bit-identical)
    return form_groups(h, l, pos, strand, arena, cfg, k)
