"""IsPangenome — the correctness oracle.

Equivalent of the reference's ``IsPangenome`` processor (SURVEY.md §3.4 ⚠[B]).
Per SURVEY §0.4 this predicate set *defines* a valid output while the
reference is unavailable:

  1. partition: every genome position belongs to exactly one block
     (CheckNoOverlaps + empty Rest);
  2. every multi-fragment block is "good": length >= MIN_LENGTH,
     identity >= MIN_IDENTITY, first/last MIN_END columns identical;
  3. no two neighboring blocks are joinable (Joiner dry run empty);
  4. (optional, when re-seeding is enabled) re-seeding on block consensuses
     yields no new good block — the k-mer analog of the reference's
     all-vs-all BLAST emptiness check [B].
"""

from __future__ import annotations

from dataclasses import dataclass, field

from npge_tpu.config import Config
from npge_tpu.model.blocks import BlockSet
from npge_tpu.model.stats import is_good_block
from npge_tpu.algo.joiner import joinable_pairs


@dataclass
class PangenomeReport:
    ok: bool
    uncovered_positions: int = 0
    overcovered_positions: int = 0
    bad_blocks: list[str] = field(default_factory=list)
    joinable: int = 0
    snappable: int = 0
    new_hits: int = 0
    messages: list[str] = field(default_factory=list)


def check_is_pangenome(
    bs: BlockSet, cfg: Config, deep: bool = False
) -> PangenomeReport:
    rep = PangenomeReport(ok=True)

    # 1. partition invariant
    cov = bs.coverage_per_seq()
    for seq_id, c in enumerate(cov):
        un = int((c == 0).sum())
        ov = int((c > 1).sum())
        rep.uncovered_positions += un
        rep.overcovered_positions += ov
        if un or ov:
            rep.ok = False
            rep.messages.append(
                f"seq {bs.arena.names[seq_id]}: {un} uncovered, {ov} overcovered"
            )

    # 2. good blocks
    for i, b in enumerate(bs.blocks):
        if not is_good_block(b, bs.arena, cfg):
            rep.ok = False
            rep.bad_blocks.append(b.name or f"#{i}")
    if rep.bad_blocks:
        rep.messages.append(f"{len(rep.bad_blocks)} bad blocks")

    # 3. no joinable neighbors (incl. bounded-gap joins that would stay good)
    from npge_tpu.algo.joiner import _StatCache

    rep.joinable = len(joinable_pairs(bs, cfg, _StatCache(bs, cfg.MIN_END)))
    if rep.joinable:
        rep.ok = False
        rep.messages.append(f"{rep.joinable} joinable block pairs")

    # 3b. no snappable boundaries (Stick dry run — small boundary overlaps
    # within STICK_MAX_SHIFT; VERDICT round-1 item 7). Subsumed by the
    # partition check for self-built sets, but gives imported blocksets a
    # precise boundary-placement verdict.
    from npge_tpu.algo.stick import snappable_pairs

    rep.snappable = len(snappable_pairs(bs, cfg))
    if rep.snappable:
        rep.ok = False
        rep.messages.append(
            f"{rep.snappable} snappable block pairs (run Stick)"
        )

    # 4. (deep) re-seeding on block consensuses yields no admissible good
    # hit — the k-mer analog of the reference's all-vs-all BLAST emptiness
    # check [B]. A "new hit" is a mapped candidate that would be admitted
    # against the current partition and raise the quality metric.
    if deep:
        from npge_tpu.algo.anchors import find_anchors
        from npge_tpu.algo.conseq import consensus_arena, deconseq
        from npge_tpu.algo.extender import extend_anchor_groups
        from npge_tpu.algo.overlaps import resolve_overlaps
        from npge_tpu.algo.surgery import quality_metric

        full = BlockSet(bs.arena, list(bs.blocks))
        full.canonicalize()
        cons, src = consensus_arena(full)
        # probe at the finest seed size the construction loop ever uses
        k = cfg.MIN_ANCHOR_SIZE
        groups = find_anchors(cons, cfg, k=k)
        cand = extend_anchor_groups(cons, groups, cfg)
        mapped = deconseq(cand, src, full)
        if mapped:
            multi = [b for b in full.blocks if b.n_frags >= 2]
            base = quality_metric(BlockSet(bs.arena, multi))
            trial = resolve_overlaps(multi + mapped, bs.arena, cfg)
            trial_bs = BlockSet(bs.arena, trial)
            if quality_metric(trial_bs) > base:
                rep.new_hits = len(mapped)
                rep.ok = False
                rep.messages.append(
                    f"re-seeding finds improving hits ({len(mapped)} candidates)"
                )

    return rep
