"""ConSeq / DeConSeq — search the compressed (consensus) representation.

Equivalent of the reference's consensus stage (``src/algo/ConSeq.cpp``,
``DeConSeq.cpp`` ⚠[B], SURVEY.md §2.3): build one consensus sequence per
block, search for similarity *between* consensuses, then map hits back
through the originating blocks to genome fragments. In the reference the
search is external BLAST; here it is the same k-mer anchor machinery run on
the consensus arena (the north star explicitly replaces BLAST with hashed
k-mer anchors + extension).

Gapped source blocks are supported through the consensus column map
(Block.consensus_with_map): a consensus interval maps to the enclosing
alignment-column range. Candidates whose mapped pieces end up with unequal
column widths (possible only across gapped sources) are skipped — columns
could not be concatenated consistently without a re-alignment pass.
"""

from __future__ import annotations

import numpy as np

from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable


def consensus_arena(
    bs: BlockSet,
) -> tuple[GenomeArena, list[tuple[int, np.ndarray]]]:
    """One consensus sequence per block (canonical block order).

    Returns (arena of consensus sequences, list of (block index, column map)
    per consensus sequence). Blocks with empty consensus are skipped.
    """
    names, seqs, src = [], [], []
    for i, b in enumerate(bs.blocks):
        cons, cmap = b.consensus_with_map(bs.arena)
        if len(cons) == 0:
            continue
        names.append(f"cons{i}&b&l")
        seqs.append(cons)
        src.append((i, cmap))
    return GenomeArena(names, seqs), src


def deconseq(
    cand: list[Block], cons_src: list[tuple[int, np.ndarray]], bs: BlockSet
) -> list[Block]:
    """Map candidate blocks found on the consensus arena back to genome
    space: a consensus fragment (cons_i, start, len, ori) expands to *all*
    fragments of source block i sliced to the enclosing alignment columns
    (orientation flips applied via Block.inverse). Pieces of one candidate
    concatenate column-wise into a single genome-space block."""
    out: list[Block] = []
    for cb in cand:
        pieces: list[Block] = []
        ok = True
        for fi in range(cb.n_frags):
            ci, st, ln, o = cb.frags.row(fi)
            bi, cmap = cons_src[ci]
            src_block = bs.blocks[bi]
            c0, c1 = int(cmap[st]), int(cmap[st + ln - 1]) + 1
            piece = src_block.slice(c0, c1)
            if piece is None:
                ok = False
                break
            if o == -1:
                piece = piece.inverse()
            pieces.append(piece)
        if not ok or not pieces:
            continue
        widths = {p.n_cols for p in pieces}
        if len(widths) != 1:
            continue  # unequal-width gapped pieces need re-alignment; skip
        rows = []
        arows = []
        gapless = all(p.is_gapless for p in pieces)
        for p in pieces:
            for gi in range(p.n_frags):
                rows.append(p.frags.row(gi))
            if not gapless:
                arows.append(p.rows(bs.arena))
        if len(rows) < 2:
            continue
        aln = None if gapless else np.concatenate(arows, axis=0)
        out.append(Block(FragmentTable.from_rows(rows), aln))
    return out
