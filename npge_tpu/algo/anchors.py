"""AnchorFinder — exact k-mer anchor groups across genomes and strands.

Pipeline equivalent of the reference's ``AnchorFinder`` processor
(``src/algo/AnchorFinder.cpp`` ⚠[B], SURVEY.md §2.3 / §3.2): find short exact
matches occurring >= 2 times (across or within genomes), strand-canonical.
The device pass (ops/kmers.py) does the scan + minimizer sampling + key sort;
this module forms groups on host and emits candidate fragments.

Differences from the reference, by design (north star: hashed k-mer anchors
replace BLAST; SURVEY §2.6):
  - perfect 2-bit k-mer keys, no hash collisions, no Bloom filter;
  - optional minimizer sampling (MINIMIZER_WINDOW>1) thins the candidate set
    shift-invariantly instead of emitting every repeated window;
  - groups larger than MAX_ANCHOR_FRAGMENTS are dropped (repeat guard).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from npge_tpu.config import Config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.ops.kmers import find_anchor_occurrences


@dataclass
class AnchorGroups:
    """Ragged groups of anchor occurrences (CSR layout).

    Occurrence m of group g (offsets[g] <= m < offsets[g+1]):
      pos[m]     arena-global start of the k-mer window
      seq_id[m]  owning sequence
      strand[m]  +1 if forward text equals the canonical form, else -1
    """

    k: int
    offsets: np.ndarray  # int64 [G+1]
    pos: np.ndarray      # int64 [M]
    seq_id: np.ndarray   # int32 [M]
    strand: np.ndarray   # int8  [M]

    @property
    def n_groups(self) -> int:
        return len(self.offsets) - 1

    def group(self, g: int):
        a, b = self.offsets[g], self.offsets[g + 1]
        return self.pos[a:b], self.seq_id[a:b], self.strand[a:b]

    def sizes(self) -> np.ndarray:
        return np.diff(self.offsets)


def dedupe_parallel_groups(
    groups: AnchorGroups, window: int
) -> AnchorGroups:
    """Drop groups that are shifted copies of a nearby kept group.

    Adjacent minimizers of one conserved locus yield many groups whose
    occurrence sets are parallel translates (same sequences, same strands,
    identical position deltas). Extending every one is redundant — they all
    grow into the same block and lose in overlap resolution. Key = (seqs,
    strands, position deltas); within a key, groups whose first position is
    within ``window`` of the previously kept group are dropped (the kept
    seed's extension covers the same regions). Deterministic: groups are
    scanned in canonical (key-sorted) order.
    """
    if groups.n_groups == 0:
        return groups
    from collections import defaultdict

    keep = np.ones(groups.n_groups, dtype=bool)
    by_key: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for g in range(groups.n_groups):
        a, b = groups.offsets[g], groups.offsets[g + 1]
        pos = groups.pos[a:b]
        key = (
            groups.seq_id[a:b].tobytes(),
            groups.strand[a:b].tobytes(),
            (pos[1:] - pos[:-1]).tobytes(),
        )
        by_key[key].append((int(pos[0]), g))
    for lst in by_key.values():
        lst.sort()
        last = None
        for p0, g in lst:
            if last is not None and p0 - last <= window:
                keep[g] = False
            else:
                last = p0
    if keep.all():
        return groups
    sizes = groups.sizes()[keep]
    keep_m = np.repeat(keep, groups.sizes())
    offsets = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return AnchorGroups(
        groups.k,
        offsets,
        groups.pos[keep_m],
        groups.seq_id[keep_m],
        groups.strand[keep_m],
    )


def _cyclic_scan(arena: GenomeArena, k: int, w: int):
    """Anchor occurrences with a cyclic halo on circular sequences.

    Each circular sequence of length >= k gets its first k+w-2 bases appended
    (same seq_id), so (a) k-mer windows crossing the origin exist and (b)
    minimizer selection near the origin sees the same cyclic windows it would
    after any rotation. Scanned occurrences map back to original coordinates;
    halo duplicates are deduped; windows that would wrap the origin are
    dropped (their fragments would be wrap fragments at birth, which the
    extender cannot grow — origin *joins* heal the origin instead; see
    algo/joiner). SURVEY §2.1 Sequence circularity [A]."""
    halos = np.array(
        [
            min(k + w - 2, arena.seq_len(i))
            if (arena.circular(i) and arena.seq_len(i) >= k)
            else 0
            for i in range(arena.n_seqs)
        ],
        np.int64,
    )
    parts = []
    eoff = np.zeros(arena.n_seqs + 1, np.int64)
    for i in range(arena.n_seqs):
        s = arena.seq_codes(i)
        seg = np.concatenate([s, s[: halos[i]]]) if halos[i] else s
        parts.append(seg)
        eoff[i + 1] = eoff[i] + len(seg)
    codes_ext = np.concatenate(parts)
    # device-built seq ids from the extended offsets (no 4 B/pos upload)
    h, l, pos, strand = find_anchor_occurrences(
        jnp.asarray(codes_ext), None, k, w, offsets=eoff
    )
    seq = np.searchsorted(eoff, pos, side="right") - 1
    lens = (arena.offsets[seq + 1] - arena.offsets[seq]).astype(np.int64)
    local = pos - eoff[seq]
    local = np.where(local >= lens, local - lens, local)
    keep = local + k <= lens  # drop origin-wrapping windows
    seq, local = seq[keep], local[keep]
    h, l, strand = h[keep], l[keep], strand[keep]
    pos = arena.offsets[seq] + local
    order = np.lexsort((pos, l, h))
    h, l, pos, strand = h[order], l[order], pos[order], strand[order]
    if len(h):  # dedupe halo copies of the same (key, position)
        uniq = np.ones(len(h), bool)
        uniq[1:] = (h[1:] != h[:-1]) | (l[1:] != l[:-1]) | (pos[1:] != pos[:-1])
        h, l, pos, strand = h[uniq], l[uniq], pos[uniq], strand[uniq]
    return h, l, pos, strand


def find_anchors(
    arena: GenomeArena,
    cfg: Config,
    codes_dev=None,
    seq_id_dev=None,
    k: int | None = None,
) -> AnchorGroups:
    """Find anchor groups over the whole arena.

    codes_dev/seq_id_dev may be passed to reuse device-resident arrays
    across pipeline stages (linear-only arenas; arenas with circular
    sequences take the cyclic-halo scan)."""
    k = k or cfg.ANCHOR_SIZE
    w = cfg.MINIMIZER_WINDOW
    if any(
        arena.circular(i) and arena.seq_len(i) >= k
        for i in range(arena.n_seqs)
    ):
        h, l, pos, strand = _cyclic_scan(arena, k, w)
        return form_groups(h, l, pos, strand, arena, cfg, k)
    if codes_dev is None:
        codes_dev = jnp.asarray(arena.codes)
    # seq ids are built on device from the tiny offsets table unless the
    # caller already holds a device-resident copy
    h, l, pos, strand = find_anchor_occurrences(
        codes_dev, seq_id_dev, k, cfg.MINIMIZER_WINDOW,
        offsets=arena.offsets,
    )
    return form_groups(h, l, pos, strand, arena, cfg, k)


def form_groups(h, l, pos, strand, arena: GenomeArena, cfg: Config, k: int) -> AnchorGroups:
    """Group key-sorted occurrences, apply size bounds and parallel-group
    dedupe. Shared by the single-device and mesh-sharded paths so both are
    bit-identical by construction."""
    if len(h) == 0:
        return AnchorGroups(
            k,
            np.zeros(1, np.int64),
            np.asarray(pos, np.int64),
            np.zeros(0, np.int32),
            np.asarray(strand, np.int8),
        )
    new = np.ones(len(h), dtype=bool)
    new[1:] = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    gid = np.cumsum(new) - 1
    sizes = np.bincount(gid)
    keep_g = (sizes >= 2) & (sizes <= cfg.MAX_ANCHOR_FRAGMENTS)
    keep_m = keep_g[gid]
    pos, strand, gid = pos[keep_m], strand[keep_m], gid[keep_m]
    # re-number kept groups compactly, preserving sorted-key order
    kept_sizes = sizes[keep_g]
    offsets = np.zeros(len(kept_sizes) + 1, np.int64)
    np.cumsum(kept_sizes, out=offsets[1:])
    seq_id = (
        np.searchsorted(arena.offsets, pos, side="right").astype(np.int32) - 1
    )
    groups = AnchorGroups(
        k, offsets, pos.astype(np.int64), seq_id, strand.astype(np.int8)
    )
    if cfg.ANCHOR_DEDUPE_WINDOW > 0:
        groups = dedupe_parallel_groups(groups, cfg.ANCHOR_DEDUPE_WINDOW)
    return groups
