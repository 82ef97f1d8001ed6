"""SplitExtendable subsumption proof (VERDICT r2 missing #4 / SURVEY §2.3).

The reference's SplitExtendable splits a block when a SUBSET of its
fragments could extend further than the whole block can (extension is
lockstep over all fragments, so one divergent fragment freezes the rest).
This engine never needs the processor: extension operates on anchor
groups, and every repeated k-mer seeds its own group — the "extendable
subset" is seeded directly and the overlap resolver trims it against the
bigger block. This test constructs the canonical reference scenario (a
3-genome block whose continuation exists in only 2 genomes) and asserts
the pipeline recovers BOTH the 3-fragment block and the 2-fragment
continuation block that only a split could have exposed in the
reference's design.
"""

import numpy as np

from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.util import codes as C


def _rand(rng, n):
    return rng.integers(0, 4, n).astype(np.uint8)


def test_subset_continuation_is_recovered_without_split_processor():
    rng = np.random.default_rng(77)
    X = _rand(rng, 300)   # shared by A, B, C
    Y = _rand(rng, 200)   # continuation shared ONLY by A, B
    Z = _rand(rng, 200)   # C diverges right after X
    seqs = {
        "A&chr&l": np.concatenate([_rand(rng, 150), X, Y, _rand(rng, 150)]),
        "B&chr&l": np.concatenate([_rand(rng, 160), X, Y, _rand(rng, 140)]),
        "C&chr&l": np.concatenate([_rand(rng, 170), X, Z, _rand(rng, 130)]),
    }
    arena = GenomeArena.from_strings(
        {k: C.decode(v) for k, v in seqs.items()}
    )
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=3,
    )
    bs, _ = build_pangenome(arena, cfg)
    assert check_is_pangenome(bs, cfg).ok

    # the 3-fragment block covering X must exist...
    three = [b for b in bs.blocks if b.n_frags == 3]
    assert any(b.n_cols >= 250 for b in three), [b.n_cols for b in three]
    # ...and the A+B-only continuation must have become its own
    # 2-fragment block (the content the reference exposes via
    # SplitExtendable + re-extension)
    y_start_a = 150 + 300  # Y's start in genome A
    found = None
    for b in bs.blocks:
        if b.n_frags != 2:
            continue
        sids = set(b.frags.seq_id.tolist())
        if sids != {0, 1}:
            continue
        a_row = int(np.flatnonzero(b.frags.seq_id == 0)[0])
        st = int(b.frags.start[a_row])
        en = st + int(b.frags.length[a_row])
        # block must cover the bulk of Y in genome A
        overlap = min(en, y_start_a + 200) - max(st, y_start_a)
        if overlap >= 150:
            found = b
            break
    assert found is not None, (
        "no 2-fragment A+B block covering the continuation region; "
        f"blocks: {[(b.n_frags, b.n_cols) for b in bs.blocks]}"
    )
    # lockstep extension of the 3-block could never reach into Y: its C
    # fragment diverges there, so the 3-block must END near X's boundary
    xb = max(three, key=lambda b: b.n_cols)
    a_row = int(np.flatnonzero(xb.frags.seq_id == 0)[0])
    en = int(xb.frags.start[a_row]) + int(xb.frags.length[a_row])
    assert en <= y_start_a + 30  # small slack for chance matches of Z/Y
