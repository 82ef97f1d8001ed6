

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
