

def test_admission_tiebreak_no_int32_wrap():
    """Regression: the canonical admission tie-break used an int32
    seq_id*(1<<28)+start key that wrapped for seq_id >= 8; with int64 keys
    the earliest (seq_id, start) fragment must win regardless of genome
    count."""
    import numpy as np
    from npge_tpu.model.arena import GenomeArena
    from npge_tpu.model.blocks import Block
    from npge_tpu.model.fragments import FragmentTable
    from npge_tpu.algo.overlaps import _block_score_key

    n_seq = 12
    arena = GenomeArena(
        [f"g{i}&chr&l" for i in range(n_seq)],
        [np.zeros(100, np.uint8) for _ in range(n_seq)],
    )
    # fragment on seq 11 at start 1 vs seq 0 at start 50: canonical first
    # fragment is (0, 50); an int32-wrapped key would rank seq 11 first
    b = Block(FragmentTable.from_rows([(11, 1, 10, 1), (0, 50, 10, 1)]))
    key = _block_score_key(b, arena)
    assert key[2][0] == 0 and key[2][1] == 50


def test_vectorized_admission_order_matches_tuple_sort():
    """_admission_order_and_wraps must reproduce the stable tuple sort over
    _block_score_key bit-for-bit (it replaced the per-candidate key calls
    for speed in r3), and flag exactly the wrap candidates."""
    import numpy as np
    from npge_tpu.model.arena import GenomeArena
    from npge_tpu.model.blocks import Block
    from npge_tpu.model.fragments import FragmentTable
    from npge_tpu.algo.overlaps import (
        _admission_order_and_wraps, _block_score_key, _FlatCandidates,
    )

    rng = np.random.default_rng(5)
    n_seq = 5
    arena = GenomeArena(
        [f"g{i}&chr&{'c' if i % 2 else 'l'}" for i in range(n_seq)],
        [np.zeros(200, np.uint8) for _ in range(n_seq)],
    )
    cand = []
    for _ in range(300):
        nf = int(rng.integers(1, 5))
        ln = int(rng.integers(5, 40))
        rows = []
        for _ in range(nf):
            s = int(rng.integers(0, n_seq))
            st = int(rng.integers(0, 195))  # may wrap on circular seqs
            rows.append((s, st, ln, int(rng.choice([-1, 1]))))
        cand.append(Block(FragmentTable.from_rows(rows)))
    order, wraps = _admission_order_and_wraps(_FlatCandidates(cand, arena), arena)
    want = sorted(
        range(len(cand)), key=lambda i: _block_score_key(cand[i], arena)
    )
    assert order.tolist() == want
    for i, b in enumerate(cand):
        w = bool(
            (
                b.frags.start.astype(np.int64) + b.frags.length
                > arena.offsets[b.frags.seq_id + 1]
                - arena.offsets[b.frags.seq_id]
            ).any()
        )
        assert wraps[i] == w
