import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
from npge_tpu.util.synthetic import synthetic_arena
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.config import default_config
from npge_tpu.model.naming import block_type
from npge_tpu.model.hashing import blockset_hash

arena = synthetic_arena(n_genomes=50, length=300_000, seed=50, sub_rate=0.001, indel_rate=0.00005, n_inversions=1)
print(f"total={arena.total_length}", flush=True)
cfg = default_config()
t0 = time.perf_counter()
bs, tm = build_pangenome(arena, cfg, verbose=True)
print(f"WALL: {time.perf_counter()-t0:.1f}s", flush=True)
print(tm.report(), flush=True)
rep = check_is_pangenome(bs, cfg)
occ_pos = sum(int(b.frags.length.sum()) for b in bs.blocks if b.n_frags>=2)
g = arena.genome_id_of_seq(); ng = len(arena.genomes())
types = {}
for b in bs.blocks:
    t = block_type(b, g, ng); types[t] = types.get(t,0)+1
bs.canonicalize()
print(f"hash={blockset_hash(bs):#x}", flush=True)
print(f"valid={rep.ok} msgs={rep.messages[:2]} blocks={len(bs.blocks)} types={types} shared={occ_pos/arena.total_length:.2%}", flush=True)
