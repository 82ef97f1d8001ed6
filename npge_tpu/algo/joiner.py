"""Joiner — merge neighboring blocks that are adjacent in every genome.

Equivalent of the reference's ``Joiner`` processor (``src/algo/Joiner.hpp``
⚠[B], SURVEY.md §2.3): two blocks are joinable when their fragments pair up
one-to-one such that every pair sits on the same sequence with the same
orientation, in one consistent direction, separated by at most MAX_JOIN_GAP
positions with *no other fragment in between* (guaranteed here by deriving
links from consecutive entries of the per-sequence sorted fragment index).
Nonzero gap regions are aligned with the SimilarAligner patch MSA
(algo/similar.py) and spliced in as gapped columns — the reference's
"join within gap limits" [B]/[C]. A join is only performed if the joined
block still satisfies the good-block predicate, so Joiner never breaks the
IsPangenome quality invariant.

``joinable_pairs`` doubles as IsPangenome's dry-run "no joinable
neighbors" check [B].
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from npge_tpu.config import Config
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.model.stats import is_good_block
from npge_tpu.algo.similar import msa_short
from npge_tpu.util import codes as C


def _adjacency_links(bs: BlockSet, max_gap: int):
    """Yield (bi, fi, bj, fj, flip) for fragment pairs of different blocks
    that are consecutive on a sequence (nothing between) and separated by a
    gap in [0, max_gap]. (bi, fi) precedes (bj, fj) in block i's COLUMN
    space; flip means block j must be inverted before concatenation.

    Orientation-general: a block and its inverse represent the same aligned
    object, so joinability must not depend on the stored representation
    (anchor canonicalization makes representations arbitrary). For the
    earlier-on-sequence fragment with ori +1, the later fragment continues
    its columns; for the later fragment with ori -1 (reading right-to-left),
    the earlier fragment continues its columns."""
    per_seq: dict[int, list[tuple[int, int, int, int, int]]] = defaultdict(list)
    for bi, b in enumerate(bs.blocks):
        f = b.frags
        for i in range(len(f)):
            s, st, ln, o = f.row(i)
            per_seq[s].append((st, st + ln, o, bi, i))
    links = []  # (bi, fi, bj, fj, flip_i, flip_j)
    for s, items in per_seq.items():
        items.sort()
        for a in range(len(items) - 1):
            st1, en1, o1, b1, f1 = items[a]
            st2, en2, o2, b2, f2 = items[a + 1]
            gap = st2 - en1
            if gap < 0 or gap > max_gap or b1 == b2:
                continue
            if o1 == 1:
                links.append((b1, f1, b2, f2, False, o2 != 1))
            if o2 == -1:
                links.append((b2, f2, b1, f1, False, o1 != -1))
            if o1 == -1 and o2 == 1:
                # both representations point outward: the join is
                # b1.inverse ++ b2 (flip the FIRST block)
                links.append((b1, f1, b2, f2, True, False))
    return links


def joinable_pairs(
    bs: BlockSet, cfg: Config | None = None
) -> list[tuple[int, int, list[tuple[int, int]]]]:
    """All (block_i, block_j, pairing) where j can be appended after i and
    the joined block remains good. pairing: list of (frag_of_i, frag_of_j).
    Requires a perfect 1:1 pairing covering every fragment of both blocks."""
    max_gap = cfg.MAX_JOIN_GAP if cfg else 0
    by_pair: dict[tuple[int, int, bool, bool], list[tuple[int, int]]] = defaultdict(list)
    for b1, f1, b2, f2, flip1, flip2 in _adjacency_links(bs, max_gap):
        by_pair[(b1, b2, flip1, flip2)].append((f1, f2))
    out = []
    for (b1, b2, flip1, flip2), pairs in sorted(by_pair.items()):
        n1 = bs.blocks[b1].n_frags
        n2 = bs.blocks[b2].n_frags
        if n1 != n2 or len(pairs) != n1:
            continue
        if len({p[0] for p in pairs}) != n1 or len({p[1] for p in pairs}) != n1:
            continue
        pairing = sorted(pairs)
        if cfg is not None and n1 >= 2:
            joined = _join_two(
                bs, bs.blocks[b1], bs.blocks[b2], pairing, cfg, flip1, flip2
            )
            if not is_good_block(joined, bs.arena, cfg):
                continue
        out.append((b1, b2, pairing, flip1, flip2))
    return out


def _join_two(
    bs: BlockSet,
    b1: Block,
    b2: Block,
    pairing,
    cfg: Config | None = None,
    flip1: bool = False,
    flip2: bool = False,
) -> Block:
    """Join b2 after b1 in b1's column space, bridging per-pair gaps.
    flip1/flip2 invert the respective block first (fragment row order is
    preserved by inverse, so pairing indices stay valid)."""
    arena = bs.arena
    if flip1:
        b1 = b1.inverse()
    if flip2:
        b2 = b2.inverse()
    rows1 = b1.rows(arena)
    rows2 = b2.rows(arena)
    gaps: list[np.ndarray] = []
    frows = []
    for f1, f2 in pairing:
        s, st1, ln1, o = b1.frags.row(f1)
        _, st2, ln2, _ = b2.frags.row(f2)
        if o == 1:
            glo, ghi = st1 + ln1, st2
            seg = arena.seq_codes(s)[glo:ghi]
        else:
            glo, ghi = st2 + ln2, st1
            seg = C.revcomp(arena.seq_codes(s)[glo:ghi])
        gaps.append(np.asarray(seg, np.uint8))
        frows.append(
            (s, min(st1, st2), ln1 + (ghi - glo) + ln2, o)
        )
    if all(len(g) == 0 for g in gaps):
        aln = np.concatenate(
            [rows1[[p[0] for p in pairing]], rows2[[p[1] for p in pairing]]],
            axis=1,
        )
    else:
        sw = dict(match=cfg.SW_MATCH, mismatch=cfg.SW_MISMATCH, gap=cfg.SW_GAP) if cfg else {}
        mid = msa_short(gaps, **sw)
        aln = np.concatenate(
            [
                rows1[[p[0] for p in pairing]],
                mid,
                rows2[[p[1] for p in pairing]],
            ],
            axis=1,
        )
    gapless = not (aln == C.GAP).any()
    return Block(FragmentTable.from_rows(frows), None if gapless else aln)


def join_blocks(bs: BlockSet, cfg: Config | None = None) -> int:
    """Greedily apply joins until none remain. Returns number of joins.

    Deterministic: candidate pairs are processed in sorted block-index
    order; chains (A+B then (AB)+C) are handled by iterating to fixpoint.
    """
    total = 0
    while True:
        cands = joinable_pairs(bs, cfg)
        if not cands:
            return total
        consumed: set[int] = set()
        new_blocks: list[Block] = []
        for b1, b2, pairing, flip1, flip2 in cands:
            if b1 in consumed or b2 in consumed:
                continue
            new_blocks.append(
                _join_two(
                    bs, bs.blocks[b1], bs.blocks[b2], pairing, cfg, flip1, flip2
                )
            )
            consumed.update((b1, b2))
            total += 1
        bs.blocks = [
            b for i, b in enumerate(bs.blocks) if i not in consumed
        ] + new_blocks
