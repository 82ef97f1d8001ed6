"""ConSeq / DeConSeq — search the compressed (consensus) representation.

Equivalent of the reference's consensus stage (``src/algo/ConSeq.cpp``,
``DeConSeq.cpp`` ⚠[B], SURVEY.md §2.3): build one consensus sequence per
block, search for similarity *between* consensuses, then map hits back
through the originating blocks to genome fragments. In the reference the
search is external BLAST; here it is the same k-mer anchor machinery run on
the consensus arena (the north star explicitly replaces BLAST with hashed
k-mer anchors + extension).

Current limitation (documented): exact column mapping assumes gapless source
blocks (true for every block the round-1 pipeline constructs); gapped blocks
contribute their consensus but are skipped in DeConSeq mapping.
"""

from __future__ import annotations

import numpy as np

from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable


def consensus_arena(bs: BlockSet) -> tuple[GenomeArena, list[int]]:
    """One consensus sequence per block (canonical block order).

    Returns (arena of consensus sequences, list mapping cons seq index ->
    block index in bs.blocks). Blocks whose consensus is empty are skipped.
    """
    names, seqs, src = [], [], []
    for i, b in enumerate(bs.blocks):
        cons = b.consensus(bs.arena)
        if len(cons) == 0:
            continue
        names.append(f"cons{i}&b&l")
        seqs.append(cons)
        src.append(i)
    return GenomeArena(names, seqs), src


def deconseq(
    cand: list[Block], cons_src: list[int], bs: BlockSet
) -> list[Block]:
    """Map candidate blocks found on the consensus arena back to genome
    space: a consensus fragment (cons_i, start, len, ori) expands to *all*
    fragments of source block i sliced to those columns (orientation flips
    applied via Block.inverse). Fragments of one candidate concatenate into
    a single genome-space gapless block."""
    out: list[Block] = []
    for cb in cand:
        rows = []
        ok = True
        for fi in range(cb.n_frags):
            ci, st, ln, o = cb.frags.row(fi)
            src_block = bs.blocks[cons_src[ci]]
            if not src_block.is_gapless:
                ok = False
                break
            piece = src_block.slice(st, st + ln)
            if piece is None:
                ok = False
                break
            if o == -1:
                piece = piece.inverse()
            for gi in range(piece.n_frags):
                rows.append(piece.frags.row(gi))
        if not ok or len(rows) < 2:
            continue
        out.append(Block(FragmentTable.from_rows(rows)))
    return out
