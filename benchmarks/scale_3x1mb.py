import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
from npge_tpu.util.synthetic import synthetic_arena
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.config import default_config

arena = synthetic_arena(n_genomes=3, length=1_000_000, seed=7, sub_rate=0.01, indel_rate=0.0002, n_inversions=2)
print(f"total={arena.total_length}", flush=True)
cfg = default_config()
t0 = time.perf_counter()
bs, tm = build_pangenome(arena, cfg, verbose=True)
print(f"WALL: {time.perf_counter()-t0:.1f}s", flush=True)
print(tm.report(), flush=True)
rep = check_is_pangenome(bs, cfg)
multi = sum(b.n_frags*b.n_cols for b in bs.blocks if b.n_frags>=2)
bs.canonicalize()
print(f"hash={blockset_hash(bs):#x}", flush=True)
print(f"valid={rep.ok} msgs={rep.messages[:2]} blocks={len(bs.blocks)} shared={multi/arena.total_length:.2%}", flush=True)
