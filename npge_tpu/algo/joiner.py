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
    """Yield (bi, fi, bj, fj, flip_i, flip_j, wrap) for fragment pairs of
    different blocks that are consecutive on a sequence (nothing between)
    and separated by a gap in [0, max_gap]. (bi, fi) precedes (bj, fj) in
    block i's COLUMN space; flip means block j must be inverted before
    concatenation. wrap marks an *origin pair* on a circular sequence: the
    first fragment ends at the sequence end (cyclically) and the second
    starts after the origin; joining produces a wrap fragment
    (start + length > seq_len, model/fragments.frag_spans).

    Orientation-general: a block and its inverse represent the same aligned
    object, so joinability must not depend on the stored representation
    (anchor canonicalization makes representations arbitrary). For the
    earlier-on-sequence fragment with ori +1, the later fragment continues
    its columns; for the later fragment with ori -1 (reading right-to-left),
    the earlier fragment continues its columns.

    Adjacency comes from :meth:`FragmentIndex.adjacent_pairs` (the shared
    sorted per-sequence backbone — VERDICT r2 item 6), including the cyclic
    origin pairs of circular sequences."""
    from npge_tpu.model.fragindex import FragmentIndex

    idx = FragmentIndex(bs.arena, bs.blocks)
    ia, ib, _gap, wraps = idx.adjacent_pairs(max_gap)
    links = []  # (bi, fi, bj, fj, flip_i, flip_j, wrap)
    o_a, o_b = idx.u_ori[ia], idx.u_ori[ib]
    bl_a, bl_b = idx.u_block[ia], idx.u_block[ib]
    fr_a, fr_b = idx.u_frag[ia], idx.u_frag[ib]
    for j in range(len(ia)):
        o1, o2 = int(o_a[j]), int(o_b[j])
        b1, f1 = int(bl_a[j]), int(fr_a[j])
        b2, f2 = int(bl_b[j]), int(fr_b[j])
        wrap = bool(wraps[j])
        if o1 == 1:
            links.append((b1, f1, b2, f2, False, o2 != 1, wrap))
        if o2 == -1:
            links.append((b2, f2, b1, f1, False, o1 != -1, wrap))
        if o1 == -1 and o2 == 1:
            # both representations point outward: the join is
            # b1.inverse ++ b2 (flip the FIRST block)
            links.append((b1, f1, b2, f2, True, False, wrap))
    return links


class _StatCache:
    """Per-block good-column stats for incremental join goodness checks:
    (good_count, total, head_good[:m], tail_good[-m:]) with good = identical
    AND gapless columns (exactly model.stats.column_classes semantics).
    Blocks are immutable, so caching by object id is safe within a pass."""

    def __init__(self, bs: BlockSet, m: int):
        self.bs = bs
        self.m = m
        self.d: dict[int, tuple] = {}

    def get(self, block: Block):
        key = id(block)
        hit = self.d.get(key)
        if hit is not None:
            return hit
        from npge_tpu.model.stats import column_classes

        rows = block.rows(self.bs.arena)
        ident, gapless = column_classes(rows)
        good = ident & gapless
        m = min(self.m, len(good))
        val = (
            int(good.sum()),
            int(len(good)),
            good[:m].copy(),
            good[len(good) - m :].copy(),
        )
        self.d[key] = val
        return val

    def put_joined(self, joined: Block, b1: Block, b2: Block,
                   flip1: bool, flip2: bool, mid_good: int, mid_w: int):
        g1, t1, h1, ta1 = self.get(b1)
        g2, t2, h2, ta2 = self.get(b2)
        if flip1:
            h1, ta1 = ta1[::-1], h1[::-1]
        if flip2:
            h2, ta2 = ta2[::-1], h2[::-1]
        self.d[id(joined)] = (g1 + g2 + mid_good, t1 + t2 + mid_w, h1, ta2)


def _pair_gap_geometry(arena, s, st1, ln1, st2, ln2, o, wrap):
    """(gap_start_mod_L, gap_width, joined_start) for one fragment pair in
    the joined column orientation. With wrap the gap crosses the origin of
    circular sequence s and the joined fragment wraps."""
    L = arena.seq_len(s)
    en1, en2 = st1 + ln1, st2 + ln2
    if not wrap:
        if o == 1:
            return en1, st2 - en1, min(st1, st2)
        return en2, st1 - en2, min(st1, st2)
    if o == 1:  # f1 at the high end, f2 after the origin
        return en1 % L, st2 + L - en1, st1
    # o == -1: f1 at the low end; column-leftward crosses the origin to f2
    return en2 % L, st1 + L - en2, st2


def _gap_segments(bs: BlockSet, b1: Block, b2: Block, pairing, flip1, flip2):
    """Per-pair gap texts in the joined column orientation."""
    arena = bs.arena
    o1s = -b1.frags.ori if flip1 else b1.frags.ori
    gaps = []
    for f1, f2, wrap in pairing:
        s, st1, ln1, _ = b1.frags.row(f1)
        _, st2, ln2, _ = b2.frags.row(f2)
        o = int(o1s[f1])
        glo, gw, _ = _pair_gap_geometry(arena, s, st1, ln1, st2, ln2, o, wrap)
        seg = arena.circ_codes(s, glo, gw) if gw else arena.seq_codes(s)[:0]
        if o != 1:
            seg = C.revcomp(seg)
        gaps.append(np.asarray(seg, np.uint8))
    return gaps


def _join_good_incremental(
    bs: BlockSet, b1: Block, b2: Block, pairing, flip1, flip2,
    cfg: Config, cache: _StatCache,
) -> tuple[bool, int, int]:
    """Good-block predicate of the joined block WITHOUT materializing it.
    Returns (good, mid_good_count, mid_width). Exactly equivalent to
    is_good_block(_join_two(...)) for blocks of length >= m on both sides."""
    from npge_tpu.model.stats import column_classes

    g1, t1, h1, ta1 = cache.get(b1)
    g2, t2, h2, ta2 = cache.get(b2)
    if flip1:
        h1, ta1 = ta1[::-1], h1[::-1]
    if flip2:
        h2, ta2 = ta2[::-1], h2[::-1]
    gaps = _gap_segments(bs, b1, b2, pairing, flip1, flip2)
    if all(len(g) == 0 for g in gaps):
        mid_good, mid_w = 0, 0
    else:
        sw = dict(match=cfg.SW_MATCH, mismatch=cfg.SW_MISMATCH, gap=cfg.SW_GAP)
        mid = msa_short(gaps, **sw)
        ident, gapless = column_classes(mid)
        mid_good, mid_w = int((ident & gapless).sum()), mid.shape[1]
    total = t1 + t2 + mid_w
    goodn = g1 + g2 + mid_good
    m = min(cfg.MIN_END, total)
    if t1 >= m and t2 >= m:
        ends_ok = bool(h1[:m].all() and ta2[len(ta2) - m :].all())
    else:
        return (None, mid_good, mid_w)  # caller falls back to full build
    ok = (
        total >= cfg.MIN_LENGTH
        and ends_ok
        and cfg.MIN_IDENTITY.le_ratio(goodn, total)
    )
    return (ok, mid_good, mid_w)


def joinable_pairs(
    bs: BlockSet,
    cfg: Config | None = None,
    cache: _StatCache | None = None,
    rejected: set | None = None,
) -> list[tuple[int, int, list[tuple[int, int]]]]:
    """All (block_i, block_j, pairing) where j can be appended after i and
    the joined block remains good. pairing: list of (frag_of_i, frag_of_j).
    Requires a perfect 1:1 pairing covering every fragment of both blocks."""
    max_gap = cfg.MAX_JOIN_GAP if cfg else 0
    by_pair: dict[tuple[int, int, bool, bool], list] = defaultdict(list)
    for b1, f1, b2, f2, flip1, flip2, wrap in _adjacency_links(bs, max_gap):
        by_pair[(b1, b2, flip1, flip2)].append((f1, f2, wrap))
    out = []
    for (b1, b2, flip1, flip2), pairs in sorted(by_pair.items()):
        n1 = bs.blocks[b1].n_frags
        n2 = bs.blocks[b2].n_frags
        if n1 != n2 or len(pairs) != n1:
            continue
        if len({p[0] for p in pairs}) != n1 or len({p[1] for p in pairs}) != n1:
            continue
        pairing = sorted(pairs)
        rkey = (
            id(bs.blocks[b1]), id(bs.blocks[b2]), flip1, flip2, tuple(pairing)
        )
        if rejected is not None and rkey in rejected:
            continue
        mid_stats = None
        if cfg is not None and n1 >= 2:
            # assembly-gap guard: a gap containing N is unknown sequence —
            # bridging it would assert homology across an assembly gap and
            # produce all-N alignment columns (tests/test_fuzz.py). Such a
            # pair is never joinable.
            gaps = _gap_segments(
                bs, bs.blocks[b1], bs.blocks[b2], pairing, flip1, flip2
            )
            if any((g >= 4).any() for g in gaps):
                if rejected is not None:
                    rejected.add(rkey)
                continue
            if cache is not None:
                ok, mg, mw = _join_good_incremental(
                    bs, bs.blocks[b1], bs.blocks[b2], pairing,
                    flip1, flip2, cfg, cache,
                )
                if ok is not None:
                    mid_stats = (mg, mw)
            else:
                ok = None
            if ok is None:  # short block or no cache: full construction
                joined = _join_two(
                    bs, bs.blocks[b1], bs.blocks[b2], pairing, cfg,
                    flip1, flip2,
                )
                ok = is_good_block(joined, bs.arena, cfg)
            if not ok:
                if rejected is not None:
                    rejected.add(rkey)
                continue
        out.append((b1, b2, pairing, flip1, flip2, mid_stats))
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
    gaps: list[np.ndarray] = []
    frows = []
    for f1, f2, wrap in pairing:
        s, st1, ln1, o = b1.frags.row(f1)
        _, st2, ln2, _ = b2.frags.row(f2)
        glo, gw, jstart = _pair_gap_geometry(
            arena, s, st1, ln1, st2, ln2, o, wrap
        )
        seg = arena.circ_codes(s, glo, gw) if gw else arena.seq_codes(s)[:0]
        if o != 1:
            seg = C.revcomp(seg)
        gaps.append(np.asarray(seg, np.uint8))
        frows.append((s, jstart, ln1 + gw + ln2, o))
    no_gaps = all(len(g) == 0 for g in gaps)
    if no_gaps and b1.is_gapless and b2.is_gapless:
        # gapless fast path: the joined block is gapless; its rows are
        # implicit — no alignment materialization needed
        return Block(FragmentTable.from_rows(frows), None)
    rows1 = b1.rows(arena)
    rows2 = b2.rows(arena)
    if no_gaps:
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
    cache = _StatCache(bs, cfg.MIN_END) if cfg is not None else None
    rejected: set = set()  # probe results persist across fixpoint rounds
    while True:
        cands = joinable_pairs(bs, cfg, cache, rejected)
        if not cands:
            return total
        consumed: set[int] = set()
        new_blocks: list[Block] = []
        for b1, b2, pairing, flip1, flip2, mid_stats in cands:
            if b1 in consumed or b2 in consumed:
                continue
            joined = _join_two(
                bs, bs.blocks[b1], bs.blocks[b2], pairing, cfg, flip1, flip2
            )
            if cache is not None and mid_stats is not None:
                cache.put_joined(
                    joined, bs.blocks[b1], bs.blocks[b2],
                    flip1, flip2, *mid_stats,
                )
            new_blocks.append(joined)
            consumed.update((b1, b2))
            total += 1
        bs.blocks = [
            b for i, b in enumerate(bs.blocks) if i not in consumed
        ] + new_blocks
