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
from npge_tpu.model.blocks import Block, BlockSet, normalize_wrap_starts
from npge_tpu.model.fragments import FragmentTable


def consensus_arena(
    bs: BlockSet,
    cache: dict | None = None,
) -> tuple[GenomeArena, list[tuple[int, np.ndarray]]]:
    """One consensus sequence per block (canonical block order).

    Returns (arena of consensus sequences, list of (block index, column map)
    per consensus sequence). Blocks with empty consensus are skipped.

    ``cache`` (id -> (block, cons, cmap)) carries per-block consensus rows
    across calls: blocks are immutable and the reseed loop preserves object
    identity for unchanged blocks, so successive rounds only recompute the
    consensus of blocks that actually changed (VERDICT r3 weak #3). Entries
    pin their block object, so ids cannot be recycled onto stale rows.
    """
    names, seqs, src = [], [], []
    for i, b in enumerate(bs.blocks):
        # unique gapless blocks (the per-round Rest fillers, fresh objects
        # every round) read their consensus straight from the arena — not
        # worth pinning in the cache
        cacheable = cache is not None and (
            b.n_frags >= 2 or b.alignment is not None
        )
        hit = cache.get(id(b)) if cacheable else None
        if hit is not None:
            cons, cmap = hit[1], hit[2]
        else:
            cons, cmap = b.consensus_with_map(bs.arena)
            if cacheable:
                cache[id(b)] = (b, cons, cmap)
        if len(cons) == 0:
            continue
        names.append(f"cons{i}&b&l")
        seqs.append(cons)
        src.append((i, cmap))
    return GenomeArena(names, seqs), src


def _deconseq_fast(
    cand: list[Block], cons_src: list[tuple[int, np.ndarray]], bs: BlockSet
) -> list[Block] | None:
    """Vectorized DeConSeq for the common case: every candidate and every
    source block gapless. Returns None when any source is gapped (caller
    falls back to the general path). For a gapless source the consensus
    column map is the identity, so cons coords ARE alignment columns."""
    blocks = bs.blocks
    srcs = [bi for bi, _ in cons_src]
    if any(blocks[bi].alignment is not None for bi in srcs):
        return None
    if any(not cb.is_gapless for cb in cand):
        return None
    if not cand:
        return []
    # source fragment tables, CSR over cons seq index
    nsrc = len(srcs)
    s_off = np.zeros(nsrc + 1, np.int64)
    np.cumsum([blocks[bi].n_frags for bi in srcs], out=s_off[1:])
    s_seq = np.concatenate([blocks[bi].frags.seq_id for bi in srcs])
    s_start = np.concatenate([blocks[bi].frags.start for bi in srcs])
    s_len = np.concatenate([blocks[bi].frags.length for bi in srcs])
    s_ori = np.concatenate([blocks[bi].frags.ori for bi in srcs])
    # flatten candidate fragments
    c_off = np.zeros(len(cand) + 1, np.int64)
    np.cumsum([cb.n_frags for cb in cand], out=c_off[1:])
    ci = np.concatenate([cb.frags.seq_id for cb in cand]).astype(np.int64)
    st = np.concatenate([cb.frags.start for cb in cand]).astype(np.int64)
    ln = np.concatenate([cb.frags.length for cb in cand]).astype(np.int64)
    o = np.concatenate([cb.frags.ori for cb in cand]).astype(np.int64)
    cid = np.repeat(np.arange(len(cand)), np.diff(c_off))
    # expand each candidate-fragment into its source block's fragments
    counts = (s_off[ci + 1] - s_off[ci]).astype(np.int64)
    rep = np.repeat(np.arange(len(ci)), counts)
    # index of the source fragment within the source block
    inner = np.arange(len(rep)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    sfi = s_off[ci[rep]] + inner
    c0 = st[rep]
    c1 = st[rep] + ln[rep]
    fo = s_ori[sfi].astype(np.int64)
    out_seq = s_seq[sfi]
    out_start = np.where(
        fo == 1, s_start[sfi] + c0, s_start[sfi] + s_len[sfi] - c1
    )
    # wrap sources (start+length > seq_len, circular) can push derived
    # starts past the origin; renormalize into [0, seq_len)
    seq_lens = (
        bs.arena.offsets[out_seq + 1] - bs.arena.offsets[out_seq]
    ).astype(np.int64)
    out_start = np.where(out_start >= seq_lens, out_start - seq_lens, out_start)
    out_len = c1 - c0
    out_ori = (fo * np.where(o[rep] == -1, -1, 1)).astype(np.int32)
    out_cid = cid[rep]
    # assemble per-candidate blocks (>= 2 fragments)
    out: list[Block] = []
    bounds = np.flatnonzero(np.diff(out_cid, prepend=-1, append=-2))
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        if b1 - b0 < 2:
            continue
        out.append(
            Block(
                FragmentTable(
                    out_seq[b0:b1],
                    out_start[b0:b1].astype(np.int32),
                    out_len[b0:b1].astype(np.int32),
                    out_ori[b0:b1],
                )
            )
        )
    return out


def deconseq(
    cand: list[Block], cons_src: list[tuple[int, np.ndarray]], bs: BlockSet
) -> list[Block]:
    """Map candidate blocks found on the consensus arena back to genome
    space: a consensus fragment (cons_i, start, len, ori) expands to *all*
    fragments of source block i sliced to the enclosing alignment columns
    (orientation flips applied via Block.inverse). Pieces of one candidate
    concatenate column-wise into a single genome-space block."""
    fast = _deconseq_fast(cand, cons_src, bs)
    if fast is not None:
        return fast
    return _deconseq_general(cand, cons_src, bs)


def _deconseq_general(
    cand: list[Block], cons_src: list[tuple[int, np.ndarray]], bs: BlockSet
) -> list[Block]:
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
            piece = normalize_wrap_starts(piece, bs.arena)
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
