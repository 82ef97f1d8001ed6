import time, numpy as np
from npge_tpu.util.synthetic import synthetic_arena
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.config import default_config

t0 = time.perf_counter()
arena = synthetic_arena(n_genomes=9, length=1_000_000, seed=7, sub_rate=0.01, indel_rate=0.0002, n_inversions=2)
print(f"synth: {time.perf_counter()-t0:.1f}s total={arena.total_length}", flush=True)
cfg = default_config()
t0 = time.perf_counter()
bs, tm = build_pangenome(arena, cfg, verbose=True)
wall = time.perf_counter()-t0
print(f"WALL: {wall:.1f}s", flush=True)
print(tm.report(), flush=True)
t0 = time.perf_counter()
rep = check_is_pangenome(bs, cfg)
multi = sum(b.n_frags*b.n_cols for b in bs.blocks if b.n_frags>=2)
print(f"valid={rep.ok} msgs={rep.messages[:3]} blocks={len(bs.blocks)} shared={multi/arena.total_length:.2%} validate={time.perf_counter()-t0:.1f}s", flush=True)
