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
import numpy as np

from npge_tpu.config import Config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.ops.kmers import find_anchor_occurrences
from npge_tpu.parallel.mesh import make_mesh
from npge_tpu.algo.anchors import AnchorGroups


def sharded_anchor_occurrences(
    arena: GenomeArena, cfg: Config, mesh=None, k: int | None = None
):
    """Position-sharded k-mer scan + minimizer sampling over the mesh.

    Delegates to ops.kmers.find_anchor_occurrences with ``mesh``: the
    padded scan inputs are sharded over the position axis (pad code N /
    device-built seq ids keep padded windows invalid), compaction happens
    on device, and only the compact occurrence rows reach the host.
    Output arrays are bit-identical to the single-device pass (tested).
    """
    k = k or cfg.ANCHOR_SIZE
    mesh = mesh or make_mesh()
    return find_anchor_occurrences(
        arena.codes, None, k, cfg.MINIMIZER_WINDOW,
        offsets=arena.offsets, mesh=mesh,
    )


def sharded_find_anchors(
    arena: GenomeArena, cfg: Config, mesh=None, k: int | None = None
) -> AnchorGroups:
    """Mesh-parallel AnchorFinder with single-device-identical output."""
    from npge_tpu.algo.anchors import form_groups

    k = k or cfg.ANCHOR_SIZE
    h, l, pos, strand = sharded_anchor_occurrences(arena, cfg, mesh, k)
    # group formation shared with algo.anchors.find_anchors (bit-identical)
    return form_groups(h, l, pos, strand, arena, cfg, k)
