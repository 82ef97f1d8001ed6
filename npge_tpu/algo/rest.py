"""Rest — cover every unclaimed position with unique 1-fragment blocks.

Equivalent of the reference's ``Rest`` processor (``src/algo/Rest.cpp``
⚠[B], SURVEY.md §2.3): establishes the *partition* invariant — after Rest,
every genome position belongs to exactly one block.
"""

from __future__ import annotations

import numpy as np

from npge_tpu import native
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block
from npge_tpu.model.fragments import FragmentTable


def rest_blocks(arena: GenomeArena, occ: list[np.ndarray]) -> list[Block]:
    """One unique block per maximal uncovered interval (ori=+1)."""
    out = []
    for seq_id in range(arena.n_seqs):
        starts, ends = native.uncovered_runs(
            np.ascontiguousarray(occ[seq_id], np.uint8)
        )
        for st, en in zip(starts.tolist(), ends.tolist()):
            out.append(
                Block(FragmentTable.from_rows([(seq_id, st, en - st, 1)]))
            )
    return out
