"""Rest — cover every unclaimed position with unique 1-fragment blocks.

Equivalent of the reference's ``Rest`` processor (``src/algo/Rest.cpp``
⚠[B], SURVEY.md §2.3): establishes the *partition* invariant — after Rest,
every genome position belongs to exactly one block.
"""

from __future__ import annotations

import numpy as np

from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block
from npge_tpu.model.fragments import FragmentTable


def _runs_false(mask: np.ndarray):
    d = np.diff(mask.astype(np.int8))
    starts = (np.flatnonzero(d == -1) + 1).tolist()
    ends = (np.flatnonzero(d == 1) + 1).tolist()
    if len(mask) and not mask[0]:
        starts = [0] + starts
    if len(mask) and not mask[-1]:
        ends = ends + [len(mask)]
    return zip(starts, ends)


def rest_blocks(arena: GenomeArena, occ: list[np.ndarray]) -> list[Block]:
    """One unique block per maximal uncovered interval (ori=+1)."""
    out = []
    for seq_id in range(arena.n_seqs):
        for st, en in _runs_false(occ[seq_id]):
            out.append(
                Block(
                    FragmentTable.from_rows([(seq_id, st, en - st, 1)])
                )
            )
    return out
