"""Full-pipeline run on the REAL TPU backend (no platform override).

Usage: python benchmarks/scale_tpu.py [n_genomes] [length]
Prints per-stage timing + validity + blockset hash (for CPU/TPU equality).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np
from npge_tpu.util.jaxcache import enable_compilation_cache
enable_compilation_cache()
from npge_tpu.util.synthetic import synthetic_arena
from npge_tpu.algo.pangenome import build_pangenome
from npge_tpu.algo.is_pangenome import check_is_pangenome
from npge_tpu.config import default_config
from npge_tpu.model.naming import block_type
from npge_tpu.model.hashing import blockset_hash

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
L = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
twice = "--twice" in sys.argv  # rerun in-process for a warm wall


def _flag(name, default, cast):
    for a in sys.argv[3:]:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


# world parameters default to the canonical 17x1Mb/17x3.3Mb settings;
# override to match the other scale_* scripts exactly (hash comparisons
# across backends need identical worlds):
#   50x300kb:  --seed=50  --sub=0.001 --indel=0.00005 --inv=1
#   100x150kb: --seed=100 --sub=0.001 --indel=0.00005 --inv=1
SEED = _flag("seed", 42, int)
SUB = _flag("sub", 0.002, float)
INDEL = _flag("indel", 0.0001, float)
INV = _flag("inv", 3, int)

print(f"device={jax.devices()[0]}", flush=True)
arena = synthetic_arena(n_genomes=n, length=L, seed=SEED,
                        sub_rate=SUB, indel_rate=INDEL, n_inversions=INV)
print(f"total={arena.total_length}", flush=True)
cfg = default_config()
from npge_tpu.ops.kmers import reset_scan_timings
from npge_tpu.algo.anchors import reset_anchor_timings
reset_scan_timings(); reset_anchor_timings()
t0 = time.perf_counter()
bs, tm = build_pangenome(arena, cfg, verbose=True)
wall = time.perf_counter() - t0
print(f"WALL: {wall:.1f}s", flush=True)
print(tm.report(), flush=True)
print(f"scan: {reset_scan_timings()}", flush=True)
print(f"anchor: {reset_anchor_timings()}", flush=True)
if twice:
    t0 = time.perf_counter()
    bs, tm = build_pangenome(arena, cfg)
    print(f"WARM WALL: {time.perf_counter()-t0:.1f}s", flush=True)
    print(tm.report(), flush=True)
    print(f"scan: {reset_scan_timings()}", flush=True)
print(f"anchor: {reset_anchor_timings()}", flush=True)
rep = check_is_pangenome(bs, cfg)
occ_pos = sum(int(b.frags.length.sum()) for b in bs.blocks if b.n_frags >= 2)
g = arena.genome_id_of_seq(); ng = len(arena.genomes())
types = {}
for b in bs.blocks:
    t = block_type(b, g, ng); types[t] = types.get(t, 0) + 1
bs.canonicalize()
print(f"valid={rep.ok} msgs={rep.messages[:2]} blocks={len(bs.blocks)} "
      f"types={types} shared={occ_pos/arena.total_length:.2%} "
      f"hash={blockset_hash(bs):#x}", flush=True)
