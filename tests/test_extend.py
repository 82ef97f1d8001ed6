"""Group-extension kernel vs a straightforward NumPy oracle."""

import jax.numpy as jnp
import numpy as np

from npge_tpu.algo.anchors import find_anchors
from npge_tpu.algo.extender import extend_anchor_groups
from npge_tpu.config import default_config
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.stats import block_identity
from npge_tpu.ops.extend import extend_groups
from npge_tpu.util import codes as C
from npge_tpu.util.synthetic import synthetic_arena


def oracle_extend_right(codes, lo, hi, ori, fmask, cap, num, den, smax):
    """Single-side brute force for one group, following the documented rule."""
    best = 0
    cnt = 0
    s = 0
    while s < smax:
        chars = []
        usable = True
        for f in range(len(lo)):
            if not fmask[f]:
                continue
            if s >= cap[f]:
                usable = False
                break
            p = hi[f] + s if ori[f] == 1 else lo[f] - 1 - s
            if p < 0 or p >= len(codes):
                usable = False
                break
            c = int(codes[p])
            if ori[f] != 1:
                c = 3 - c if c < 4 else c
            if c >= 4:
                usable = False
                break
            chars.append(c)
        if not usable:
            break
        ident = len(set(chars)) == 1
        if ident:
            cnt += 1
        L = s + 1
        if ident and cnt * den >= num * L:
            best = L
        s += 1
    return best


def test_extend_matches_oracle_random():
    rng = np.random.default_rng(11)
    T = 800
    codes = rng.integers(0, 4, size=T).astype(np.uint8)
    # plant a shared region: copy a 120bp window to another place
    codes[500:620] = codes[100:220]
    # add noise to one copy
    for p in range(510, 610, 17):
        codes[p] = (codes[p] + 1) % 4
    B, F = 3, 2
    lo = np.array([[100, 500], [150, 550], [200, 600]], np.int32)
    hi = lo + 10
    ori = np.ones((B, F), np.int32)
    fmask = np.ones((B, F), bool)
    cap = np.full((B, F), 200, np.int32)
    el, er = extend_groups(
        jnp.asarray(codes), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(ori), jnp.asarray(fmask),
        cap, cap, 9, 10, chunk=256, max_rounds=1,
    )
    for b in range(B):
        want = oracle_extend_right(
            codes, lo[b], hi[b], ori[b], fmask[b], cap[b], 9, 10, 256
        )
        assert int(np.asarray(er)[b]) == want, f"group {b}"


def test_extend_respects_caps_and_bounds():
    codes = np.zeros(100, np.uint8)  # all 'A' — everything matches
    lo = np.array([[10, 60]], np.int32)
    hi = lo + 5
    ori = np.ones((1, 2), np.int32)
    fmask = np.ones((1, 2), bool)
    capl = np.array([[10, 3]], np.int32)
    capr = np.array([[7, 100]], np.int32)
    el, er = extend_groups(
        jnp.asarray(codes), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(ori), jnp.asarray(fmask), capl, capr,
        9, 10, chunk=64, max_rounds=1,
    )
    assert int(np.asarray(er)[0]) == 7  # min cap wins
    assert int(np.asarray(el)[0]) == 3


def test_extend_minus_strand_symmetry():
    """A group of (fwd, rc) fragments over identical text extends fully."""
    rng = np.random.default_rng(12)
    seq = rng.integers(0, 4, size=200).astype(np.uint8)
    rc = (3 - seq)[::-1].copy()
    arena = GenomeArena(["A&c&l", "B&c&l"], [seq, rc])
    codes = jnp.asarray(arena.codes)
    # anchor: A[90:110) fwd <-> B[90:110) rev (same text)
    lo = np.array([[90, 200 + 90]], np.int32)
    hi = lo + 20
    ori = np.array([[1, -1]], np.int32)
    fmask = np.ones((1, 2), bool)
    capl = np.array([[90, 90]], np.int32)
    capr = np.array([[90, 90]], np.int32)
    el, er = extend_groups(
        codes, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ori),
        jnp.asarray(fmask), capl, capr, 9, 10, chunk=128, max_rounds=1,
    )
    assert int(np.asarray(el)[0]) == 90 and int(np.asarray(er)[0]) == 90


def test_end_to_end_anchor_extension_synthetic():
    arena = synthetic_arena(n_genomes=2, length=5000, seed=9, sub_rate=0.005,
                            indel_rate=0.0)
    cfg = default_config().replace(ANCHOR_SIZE=21, MINIMIZER_WINDOW=8)
    groups = find_anchors(arena, cfg)
    blocks = extend_anchor_groups(arena, groups, cfg)
    assert len(blocks) > 0
    long_blocks = [b for b in blocks if b.n_cols >= cfg.MIN_LENGTH]
    assert long_blocks, "extension should produce long blocks on 0.5% mutated genomes"
    for b in long_blocks[:20]:
        num, den = block_identity(b, arena)
        assert cfg.MIN_IDENTITY.le_ratio(num, den)


def test_rows_path_matches_byte_gather_oracle():
    """extend_chunk_rows (row-gather + log-shift production path) must be
    bit-identical to extend_chunk (byte-gather oracle) on random inputs,
    including windows straddling arena boundaries."""
    from npge_tpu.ops.extend import (
        extend_chunk, extend_chunk_rows, make_codes2, make_codes2_rows,
    )

    rng = np.random.default_rng(7)
    T = 5000  # deliberately not a multiple of 128
    codes = rng.integers(0, 5, T, dtype=np.uint8)  # includes N codes
    codes_j = jnp.asarray(codes)
    codes2 = make_codes2(codes_j)
    codes2_rows = make_codes2_rows(codes_j)
    T2 = 2 * T
    for chunk in (128, 384):
        B, F = 16, 3
        base = rng.integers(0, T2, (B, F), dtype=np.int32)
        # force some windows to straddle the end of the doubled arena
        base[0] = T2 - chunk // 2
        fmask = rng.random((B, F)) < 0.8
        fmask[:, 0] = True
        cap = rng.integers(0, chunk + 1, (B, F), dtype=np.int32)
        cl = rng.integers(0, 100, B, dtype=np.int32)
        ci = (cl * 9) // 10
        a = extend_chunk(
            codes2, jnp.asarray(base), jnp.asarray(fmask), jnp.asarray(cap),
            jnp.asarray(cl), jnp.asarray(ci), 9, 10, chunk,
        )
        b = extend_chunk_rows(
            codes2_rows, T2, jnp.asarray(base), jnp.asarray(fmask),
            jnp.asarray(cap), jnp.asarray(cl), jnp.asarray(ci), 9, 10, chunk,
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_rounds_match_host_loop():
    """extend_sides_fused (single-dispatch lax.while_loop) must be
    bit-identical to the host-looped extend_side oracle, including the
    freeze-on-partial-chunk rule and early exit."""
    from npge_tpu.ops.extend import (
        bases_for_groups, extend_side, extend_sides_fused,
        make_codes2, make_codes2_rows,
    )

    rng = np.random.default_rng(21)
    T = 6000
    codes = rng.integers(0, 4, T).astype(np.uint8)
    codes[3000:3800] = codes[200:1000]  # long planted repeat spanning chunks
    codes_j = jnp.asarray(codes)
    codes2 = make_codes2(codes_j)
    rows = make_codes2_rows(codes_j)
    B, F, chunk, max_rounds = 12, 2, 128, 6
    lo = rng.integers(100, T - 1500, (B, F)).astype(np.int64)
    lo[0] = [250, 3050]  # inside the planted repeat -> multi-round extension
    hi = lo + 15
    ori = np.where(rng.random((B, F)) < 0.5, -1, 1).astype(np.int64)
    ori[0] = 1
    fmask = np.ones((B, F), bool)
    cl = rng.integers(0, 700, (B, F)).astype(np.int32)
    cr = rng.integers(0, 700, (B, F)).astype(np.int32)
    cr[0] = 700  # group 0 must be free to extend through multiple chunks
    base_l, base_r = bases_for_groups(lo, hi, ori, T)
    el_f, er_f, rounds = extend_sides_fused(
        rows, 2 * T, base_l, base_r, fmask, cl, cr, 9, 10, chunk, max_rounds
    )
    assert 1 <= int(rounds) <= max_rounds
    el_h = extend_side(
        codes2, jnp.asarray(base_l), jnp.asarray(fmask), cl, 9, 10,
        chunk, max_rounds,
    )
    er_h = extend_side(
        codes2, jnp.asarray(base_r), jnp.asarray(fmask), cr, 9, 10,
        chunk, max_rounds,
    )
    np.testing.assert_array_equal(np.asarray(el_f), np.asarray(el_h))
    np.testing.assert_array_equal(np.asarray(er_f), np.asarray(er_h))
    # at least one group must actually have needed multiple rounds
    assert int(np.asarray(er_f)[0]) > chunk


def test_rows_ratchet_invariance():
    """Extension results must not depend on the codes2_rows row-count
    ratchet (the compile saver for the reseed loop's shrinking arenas)."""
    import jax.numpy as jnp

    from npge_tpu.ops.extend import (
        bases_for_groups, extend_rounds_rows, make_codes2_rows,
    )
    from npge_tpu.ops.kmers import set_pad_ratchet

    rng = np.random.default_rng(21)
    T = 5000
    codes = rng.integers(0, 4, T).astype(np.uint8)
    codes[2500:2600] = codes[100:200]  # a repeat to extend
    B, F = 4, 2
    lo = np.array([[100, 2500]] * B, np.int64) + np.arange(B)[:, None]
    hi = lo + 17
    ori = np.ones((B, F), np.int64)
    fmask = np.ones((B, F), bool)
    cap = np.full((B, F), 64, np.int32)
    base_l, base_r = bases_for_groups(lo, hi, ori, T)

    def run():
        rows = make_codes2_rows(jnp.asarray(codes))
        total, rnds = extend_rounds_rows(
            rows, 2 * T, jnp.asarray(base_r), jnp.asarray(fmask),
            jnp.asarray(cap), 9, 10, 32, 4,
        )
        return np.asarray(total)

    base = run()
    try:
        set_pad_ratchet(True)
        # seed the floor with a much larger arena
        make_codes2_rows(jnp.asarray(rng.integers(0, 4, 60000).astype(np.uint8)))
        ratcheted = run()
    finally:
        set_pad_ratchet(None)
    np.testing.assert_array_equal(base, ratcheted)


def test_split_tail_extension_matches_fused():
    """The round-1-for-all + compacted-tail scheme must produce the exact
    per-group extensions of the fused while_loop path (the freeze rule
    makes per-group results batch-composition-independent), across worlds
    with indels, inversions, and deep extensions, and through the full
    pipeline (identical blockset hash)."""
    import numpy as np

    from npge_tpu.algo import extender
    from npge_tpu.algo.anchors import find_anchors
    from npge_tpu.algo.pangenome import build_pangenome
    from npge_tpu.config import default_config
    from npge_tpu.model.hashing import blockset_hash
    from npge_tpu.util.synthetic import synthetic_arena

    arena = synthetic_arena(
        n_genomes=3, length=60_000, seed=19, sub_rate=0.004,
        indel_rate=0.0004, n_inversions=2,
    )
    cfg = default_config()
    groups = find_anchors(arena, cfg)
    assert groups.n_groups > 100
    old = extender._SPLIT_TAIL_MIN_GROUPS[0]
    try:
        extender._SPLIT_TAIL_MIN_GROUPS[0] = 1 << 60  # force fused
        fused = extender.extend_anchor_groups(arena, groups, cfg)
        extender._SPLIT_TAIL_MIN_GROUPS[0] = 1  # force split
        split = extender.extend_anchor_groups(arena, groups, cfg)
        for attr in ("offsets", "seq", "start", "length", "ori"):
            np.testing.assert_array_equal(
                getattr(fused, attr), getattr(split, attr), err_msg=attr
            )
        extender._SPLIT_TAIL_MIN_GROUPS[0] = 1
        bs_split, _ = build_pangenome(arena, cfg)
        extender._SPLIT_TAIL_MIN_GROUPS[0] = 1 << 60
        bs_fused, _ = build_pangenome(arena, cfg)
        assert blockset_hash(bs_split) == blockset_hash(bs_fused)
    finally:
        extender._SPLIT_TAIL_MIN_GROUPS[0] = old
