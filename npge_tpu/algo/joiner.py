"""Joiner — merge neighboring blocks that are adjacent in every genome.

Equivalent of the reference's ``Joiner`` processor (``src/algo/Joiner.hpp``
⚠[B], SURVEY.md §2.3): two blocks are joinable when their fragments pair up
one-to-one such that every pair sits adjacent on the same sequence with the
same orientation and a single consistent direction, so the joined block is a
valid alignment concatenation. Round-1 restriction: exact adjacency (gap 0);
the reference's bounded-gap join limits [C] are a later refinement.

Also exports ``joinable_pairs`` used by IsPangenome's "no joinable
neighbors" predicate in dry mode [B].
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.util import codes as C


def _adjacency_links(bs: BlockSet):
    """Yield (bi, fi, bj, fj, direction) for fragments of different blocks
    that are exactly adjacent on a sequence. direction=+1 means block j's
    columns continue block i's alignment (j after i in column space)."""
    # index all fragments: (seq, start, end, ori, block, frag)
    per_seq: dict[int, list[tuple[int, int, int, int, int]]] = defaultdict(list)
    for bi, b in enumerate(bs.blocks):
        f = b.frags
        for i in range(len(f)):
            s, st, ln, o = f.row(i)
            per_seq[s].append((st, st + ln, o, bi, i))
    links = []
    for s, items in per_seq.items():
        items.sort()
        for a in range(len(items) - 1):
            st1, en1, o1, b1, f1 = items[a]
            st2, en2, o2, b2, f2 = items[a + 1]
            if en1 != st2 or b1 == b2 or o1 != o2:
                continue
            if o1 == 1:
                # downstream-in-sequence = downstream-in-columns
                links.append((b1, f1, b2, f2, +1))
            else:
                # minus strand reads right-to-left: the later-position
                # fragment comes EARLIER in column space
                links.append((b2, f2, b1, f1, +1))
    return links


def joinable_pairs(bs: BlockSet) -> list[tuple[int, int, list[tuple[int, int]]]]:
    """All (block_i, block_j, pairing) where j can be appended after i.

    pairing is a list of (frag_of_i, frag_of_j). Requires a perfect 1:1
    pairing covering every fragment of both blocks, all in the same
    direction.
    """
    by_pair: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
    for b1, f1, b2, f2, _d in _adjacency_links(bs):
        by_pair[(b1, b2)].append((f1, f2))
    out = []
    for (b1, b2), pairs in sorted(by_pair.items()):
        n1 = bs.blocks[b1].n_frags
        n2 = bs.blocks[b2].n_frags
        if n1 != n2 or len(pairs) != n1:
            continue
        if len({p[0] for p in pairs}) != n1 or len({p[1] for p in pairs}) != n1:
            continue
        out.append((b1, b2, sorted(pairs)))
    return out


def _join_two(bs: BlockSet, b1: Block, b2: Block, pairing) -> Block:
    rows1 = b1.rows(bs.arena)
    rows2 = b2.rows(bs.arena)
    frows = []
    arows = []
    for f1, f2 in pairing:
        s, st1, ln1, o = b1.frags.row(f1)
        _, st2, ln2, _ = b2.frags.row(f2)
        frows.append((s, min(st1, st2), ln1 + ln2, o))
        arows.append(np.concatenate([rows1[f1], rows2[f2]]))
    aln = np.stack(arows)
    gapless = not (aln == C.GAP).any()
    return Block(FragmentTable.from_rows(frows), None if gapless else aln)


def join_blocks(bs: BlockSet) -> int:
    """Greedily apply joins until none remain. Returns number of joins.

    Deterministic: candidate pairs are processed in sorted block-index
    order; chains (A+B then (AB)+C) are handled by iterating to fixpoint.
    """
    total = 0
    while True:
        cands = joinable_pairs(bs)
        if not cands:
            return total
        consumed: set[int] = set()
        new_blocks: list[Block] = []
        for b1, b2, pairing in cands:
            if b1 in consumed or b2 in consumed:
                continue
            new_blocks.append(_join_two(bs, bs.blocks[b1], bs.blocks[b2], pairing))
            consumed.update((b1, b2))
            total += 1
        bs.blocks = [
            b for i, b in enumerate(bs.blocks) if i not in consumed
        ] + new_blocks
