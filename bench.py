"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: banded-SW x-drop DP cells/sec/chip (BASELINE.json `metric`: the
fragment-extension DP inner loop), measured on the Pallas wavefront kernel.
The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
measured speedup against a *vectorized NumPy* implementation of the same
banded wavefront on this host (an optimistic stand-in for the reference's
single-threaded CPU DP — it is already SIMD-wide via NumPy).

Secondary numbers (extra JSON keys, VERDICT r2 item 1):
  - extension_cells_per_sec: the PRODUCTION gapless extension op
    (`extend_chunk_rows`, the row-gather formulation the pipeline runs) at
    steady state;
  - extension_oracle_cells_per_sec: the byte-gather parity oracle (what the
    r1/r2 bench mistakenly reported as the extension number);
  - pipeline_extend_cells_per_sec: extension throughput measured THROUGH
    `extend_anchor_groups` inside a real `build_pangenome` run (honest
    real-cells counter, not padded batch cells);
  - pipeline_wall_s / pipeline17_wall_s: full genomes->blockset walls
    for the fixed 3x1Mb and canonical 17x1Mb synthetic configs on the
    default backend (first-run and steady-state), with vs_cpu ratios
    against the in-session best-of-2 CPU-backend twin (falls back to the
    recorded benchmarks/README.md wall only if the twin section fails).

Two subprocesses, each under a hard timeout: one for ALL TPU measurements
(pipeline + SW + extension — the first dispatch of a fresh process waits
minutes for the device claim on this machine, so the TPU work pays it
once) and one for the CPU-backend twin. A wedged TPU tunnel (this
environment's failure mode — a hung device call is NOT interruptible by
SIGALRM) kills only that subprocess; the parent never touches the device
and always prints the one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

NEG = -(1 << 29)

CPU_BACKEND_PIPELINE_WALL_S = 34.0  # benchmarks/README.md, 3x1Mb, this host


def numpy_sw_wavefront(qp, trp, qlen, tlen, L, W=128, match=1, mismatch=-2,
                       gap=-3, xdrop=64):
    """Vectorized NumPy version of the kernel's band recurrence (CPU
    baseline). Arrays are [B, L+2W] (non-transposed); returns best[B]."""
    B = qp.shape[0]
    band = np.arange(W)[None, :]
    prev2 = np.where(band + 0 == W // 2, 0, NEG)  # d=0: i==0 at r=W//2
    prev2 = np.broadcast_to(prev2, (B, W)).copy()
    ib1 = 1 - W // 2
    i1 = ib1 + band
    j1 = 1 - i1
    ok1 = ((i1 == 1) & (j1 == 0) & (qlen >= 1)) | (
        (i1 == 0) & (j1 == 1) & (tlen >= 1)
    )
    prev = np.where(ok1, gap, NEG)
    best = np.maximum(0, prev.max(axis=1, keepdims=True))
    for d in range(2, 2 * L + 1):
        ib = (d + 1) // 2 - W // 2
        i = ib + band
        j = d - i
        qs = qp[:, np.clip(W + ib - 1 + band, 0, qp.shape[1] - 1)[0]]
        ts = trp[:, np.clip(W + 1 + L - d + ib + band, 0, trp.shape[1] - 1)[0]]
        sub = np.where(qs == ts, match, mismatch)
        if d % 2 == 0:
            up = np.concatenate([np.full((B, 1), NEG), prev[:, :-1]], axis=1)
            left = prev
        else:
            up = prev
            left = np.concatenate([prev[:, 1:], np.full((B, 1), NEG)], axis=1)
        inside = (i <= qlen) & (j <= tlen)
        s = np.maximum(
            np.where((i >= 1) & (j >= 1) & inside, prev2 + sub, NEG),
            np.maximum(
                np.where((i >= 1) & inside & (j >= 0), up + gap, NEG),
                np.where((j >= 1) & inside & (i >= 0), left + gap, NEG),
            ),
        )
        s = np.where(s < best - xdrop, NEG, s)
        best = np.maximum(best, s.max(axis=1, keepdims=True))
        prev2, prev = prev, s
    return best[:, 0]


def _timed_loop(loop_fn, args, cells_per_iter, n1=5, n2=25):
    """Time an on-device fori_loop at two iteration counts and difference
    them out: the result excludes the (large, ~30 ms) tunnel dispatch
    latency of this environment AND defeats the relay's memoization of
    repeated identical dispatches (each loop iteration perturbs its input
    on device)."""
    for n in (n1, n2):  # compile both
        np.asarray(loop_fn(*args, n=n))
    t1 = time.perf_counter()
    np.asarray(loop_fn(*args, n=n1))
    t1 = time.perf_counter() - t1
    t2 = time.perf_counter()
    np.asarray(loop_fn(*args, n=n2))
    t2 = time.perf_counter() - t2
    per_iter = max((t2 - t1) / (n2 - n1), 1e-9)
    return cells_per_iter / per_iter


def bench_sw(rng):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from npge_tpu.ops.sw import pad_for_sw, sw_extend_padded

    B, L, W, TB = 1024, 1024, 128, 128
    qs, ts = [], []
    for _ in range(B):
        q = rng.integers(0, 4, L).astype(np.uint8)
        t = q.copy()
        m = rng.random(L) < 0.05
        t[m] = (t[m] + rng.integers(1, 4, m.sum())) % 4
        qs.append(q)
        ts.append(t)
    qp, trp, qlen, tlen = pad_for_sw(qs, ts, L, W, TB)
    args = [jnp.asarray(x) for x in (qp, trp, qlen, tlen)]

    @partial(jax.jit, static_argnames=("n",))
    def loop(qp, trp, qlen, tlen, n):
        def body(i, acc):
            bump = (qp + i.astype(jnp.uint8)) % 4
            q2 = jnp.where(qp > 3, qp, bump)
            out = sw_extend_padded(q2, trp, qlen, tlen, L=L, W=W, TB=TB)
            return acc + out[:, 0].sum()
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    cells = B * W * (2 * L - 1)
    tpu_cps = _timed_loop(loop, args, cells)

    # correctness cross-check + CPU baseline on a subset
    out = np.asarray(sw_extend_padded(*args, L=L, W=W, TB=TB))
    Bc = 128
    qp_h = qp.T[:Bc].copy()
    trp_h = trp.T[:Bc].copy()
    t0 = time.perf_counter()
    cpu_best = numpy_sw_wavefront(
        qp_h, trp_h, qlen.T[:Bc], tlen.T[:Bc], L, W
    )
    cpu_dt = time.perf_counter() - t0
    cpu_cps = Bc * W * (2 * L - 1) / cpu_dt
    agree = bool(np.array_equal(np.asarray(out)[:Bc, 0], cpu_best))
    return tpu_cps, cpu_cps, agree


def _extension_world(rng):
    T_half = 2_000_000
    half = rng.integers(0, 4, T_half).astype(np.uint8)
    other = half.copy()
    m = rng.random(T_half) < 0.02
    other[m] = (other[m] + rng.integers(1, 4, m.sum())) % 4
    codes = np.concatenate([half, other])
    B, F, CHUNK = 8192, 2, 512
    starts = rng.integers(1000, T_half - CHUNK - 1000, B).astype(np.int32)
    lo = np.stack([starts, starts + T_half], axis=1).astype(np.int32)
    hi = lo + 21
    ori = np.ones((B, F), np.int32)
    fmask = np.ones((B, F), bool)
    cap = np.full((B, F), CHUNK, np.int32)
    return codes, lo, hi, ori, fmask, cap, B, F, CHUNK


def bench_extension(rng):
    """PRODUCTION path: `extend_chunk_rows` (row-gather windows), the op
    `extend_anchor_groups` dispatches. VERDICT r2 item 1."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from npge_tpu.ops.extend import (
        bases_for_groups, extend_chunk_rows, make_codes2_rows,
    )

    codes, lo, hi, ori, fmask, cap, B, F, CHUNK = _extension_world(rng)
    T = len(codes)
    codes2_rows = make_codes2_rows(jnp.asarray(codes))
    _, base_r = bases_for_groups(lo, hi, ori, T)
    args = [codes2_rows, jnp.asarray(base_r), jnp.asarray(fmask),
            jnp.asarray(cap)]

    @partial(jax.jit, static_argnames=("n",))
    def loop(rows, base, fmask, cap, n):
        def body(i, acc):
            z = jnp.zeros(B, jnp.int32)
            ext, _, _ = extend_chunk_rows(
                rows, 2 * T, base + i, fmask, cap, z, z, 9, 10, CHUNK
            )
            return acc + ext.sum()
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return _timed_loop(loop, args, B * F * CHUNK)


def bench_extension_oracle(rng):
    """Byte-gather parity-oracle formulation (NOT the production path)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from npge_tpu.ops.extend import bases_for_groups, extend_chunk, make_codes2

    codes, lo, hi, ori, fmask, cap, B, F, CHUNK = _extension_world(rng)
    codes2 = make_codes2(jnp.asarray(codes))
    _, base_r = bases_for_groups(lo, hi, ori, len(codes))
    args = [codes2, jnp.asarray(base_r), jnp.asarray(fmask), jnp.asarray(cap)]

    @partial(jax.jit, static_argnames=("n",))
    def loop(codes2, base, fmask, cap, n):
        def body(i, acc):
            z = jnp.zeros(B, jnp.int32)
            ext, _, _ = extend_chunk(
                codes2, base + i, fmask, cap, z, z, 9, 10, CHUNK
            )
            return acc + ext.sum()
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return _timed_loop(loop, args, B * F * CHUNK, n1=2, n2=6)


def bench_pipeline(prefix="pipeline", n_genomes=3, length=1_000_000,
                   world=None):
    """Full genomes->blockset on a fixed synthetic world (3x1Mb matches
    benchmarks/scale_3x1mb.py; the 17x1Mb flagship uses the CANONICAL
    scale_17x1mb.py parameters — the 3x1Mb world's 1% substitution rate
    shatters a 17-genome world into ~100k blocks and benchmarks nothing
    realistic) on the current backend."""
    from npge_tpu.algo.pangenome import build_pangenome
    from npge_tpu.config import default_config
    from npge_tpu.util.synthetic import synthetic_arena

    arena = synthetic_arena(
        n_genomes=n_genomes, length=length,
        **(world or dict(seed=7, sub_rate=0.01, indel_rate=0.0002,
                         n_inversions=2)),
    )
    from npge_tpu.ops.kmers import reset_scan_timings

    cfg = default_config()
    reset_scan_timings()
    t0 = time.perf_counter()
    bs, tm = build_pangenome(arena, cfg)
    wall = time.perf_counter() - t0
    ext_s = tm.seconds.get("extend", 0.0)
    ext_cells = tm.counters.get("extend_cells", 0)
    scan_t = reset_scan_timings()
    return {
        f"{prefix}_wall_s": round(wall, 1),
        f"{prefix}_extend_cells_per_sec": round(
            ext_cells / ext_s if ext_s > 0 else 0.0, 0
        ),
        f"{prefix}_blocks": len(bs.blocks),
        f"{prefix}_stage_s": {
            k: round(v, 1) for k, v in tm.seconds.items()
        },
        f"{prefix}_scan_s": {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in scan_t.items()
        },
    }


def _section_main(name: str) -> dict:
    """Child-process entry: run one section, return its result dict."""
    import os

    import jax

    if os.environ.get("NPGE_FORCE_PLATFORM"):
        # the JAX_PLATFORMS env var is overridden during jax import by this
        # machine's device-tunnel sitecustomize (see tests/conftest.py);
        # only jax.config set after import actually selects the backend
        jax.config.update(
            "jax_platforms", os.environ["NPGE_FORCE_PLATFORM"]
        )
    from npge_tpu.util.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    if name == "sw":
        sw_tpu, sw_cpu, sw_agree = bench_sw(rng)
        return {
            "value": round(sw_tpu, 0),
            "vs_baseline": round(sw_tpu / sw_cpu, 2),
            "baseline_def": (
                "vectorized-NumPy same band recurrence, this host"
            ),
            "cpu_sw_cells_per_sec": round(sw_cpu, 0),
            "sw_results_match_cpu": sw_agree,
            "device": str(jax.devices()[0]),
        }
    if name == "ext":
        return {"extension_cells_per_sec": round(bench_extension(rng), 0)}
    if name == "oracle":
        return {
            "extension_oracle_cells_per_sec": round(
                bench_extension_oracle(rng), 0
            )
        }
    if name == "pipeline":
        return bench_pipeline()
    if name == "pipeline_cpu":
        # best-of-2 twin + load average (VERDICT r3 weak #5: the 2-CPU
        # box's load weather swung the denominator 29-36 s across runs;
        # the artifact now carries both walls and the box load). The
        # second run is also compile-warm, so the kept wall measures
        # WORK — r3's single-run twin silently included XLA CPU compiles.
        r1 = bench_pipeline(prefix="cpu_pipeline")
        r2 = bench_pipeline(prefix="cpu_pipeline_run2")
        w1 = r1["cpu_pipeline_wall_s"]
        w2 = r2["cpu_pipeline_run2_wall_s"]
        if w2 < w1:
            r1 = {
                k.replace("cpu_pipeline_run2", "cpu_pipeline"): v
                for k, v in r2.items()
            }
        r1["cpu_pipeline_walls_s"] = [w1, w2]
        r1["cpu_loadavg_1m"] = round(os.getloadavg()[0], 2)
        # flagship 17x1Mb twin, single run (compile-warm from the 3x1Mb
        # runs above; extension work dominates at this scale)
        r17 = bench_pipeline(
            prefix="cpu_pipeline17", n_genomes=17,
            world=dict(seed=42, sub_rate=0.002, indel_rate=0.0001,
                       n_inversions=3),
        )
        r1.update(r17)
        r1["cpu_loadavg_1m_after17"] = round(os.getloadavg()[0], 2)
        r1.update(bench_pipeline(
            prefix="cpu_pipeline50", n_genomes=50, length=300_000,
            world=dict(seed=50, sub_rate=0.001, indel_rate=0.00005,
                       n_inversions=1),
        ))
        return r1
    if name == "probe":
        import jax.numpy as jnp

        v = int(jax.jit(lambda x: (x * x).sum())(jnp.arange(512)))
        return {"probe_ok": v == 44608256, "device": str(jax.devices()[0])}
    if name == "tpu":
        # ALL TPU measurements in one process: the first dispatch of every
        # fresh process waits minutes for the device claim on this
        # machine's tunnel (measured 3s-12min, pure server-side wait) —
        # pay it once, MEASURED SEPARATELY via a trivial jit so the
        # pipeline walls report work, not tunnel lease administration.
        # Every headline number carries min/med/max over >= 3 in-process
        # reps (VERDICT r4 weak #3: single draws read as regressions when
        # the real cause is tunnel/host weather).
        import jax.numpy as jnp

        def spread(vals):
            s = sorted(vals)
            return [s[0], s[len(s) // 2], s[-1]]

        t0 = time.perf_counter()
        jax.jit(lambda x: (x * x).sum())(jnp.arange(512)).block_until_ready()
        claim_s = time.perf_counter() - t0
        # first run = the warmup-assisted cold wall (persistent XLA cache
        # warm across processes; this process pays executable loads only)
        out = bench_pipeline()
        out["device_claim_wait_s"] = round(claim_s, 1)
        # steady-state reruns: all executables loaded, device claimed
        warm_walls = []
        for _ in range(3):
            warm = bench_pipeline(prefix="pipeline_warm")
            warm_walls.append(warm["pipeline_warm_wall_s"])
        out["pipeline_warm_walls_s"] = spread(warm_walls)
        out["pipeline_warm_wall_s"] = spread(warm_walls)[1]
        out["pipeline_warm_stage_s"] = warm["pipeline_warm_stage_s"]
        out["pipeline_warm_scan_s"] = warm["pipeline_warm_scan_s"]
        # flagship 17x1Mb: first run loads/compiles the 2^25 scan + F=32
        # extension executables, the reruns are the steady-state number
        CANON17 = dict(seed=42, sub_rate=0.002, indel_rate=0.0001,
                       n_inversions=3)
        out.update(
            bench_pipeline(prefix="pipeline17", n_genomes=17, world=CANON17)
        )
        warm17_walls = []
        for _ in range(3):
            warm17 = bench_pipeline(
                prefix="pipeline17_warm", n_genomes=17, world=CANON17
            )
            warm17_walls.append(warm17["pipeline17_warm_wall_s"])
        out["pipeline17_warm_walls_s"] = spread(warm17_walls)
        out["pipeline17_warm_wall_s"] = spread(warm17_walls)[1]
        out["pipeline17_warm_stage_s"] = warm17["pipeline17_warm_stage_s"]
        out["pipeline17_warm_scan_s"] = warm17["pipeline17_warm_scan_s"]
        # fresh rng per sub-benchmark rep: identical inputs, so the spread
        # isolates tunnel/host weather, not data variation
        sw_reps, cpu_reps = [], []
        for _ in range(3):
            sw_tpu, sw_cpu, sw_agree = bench_sw(np.random.default_rng(0))
            sw_reps.append(sw_tpu)
            cpu_reps.append(sw_cpu)
        out.update({
            "value": round(spread(sw_reps)[1], 0),
            "sw_spread_cells_per_sec": [round(v, 0) for v in spread(sw_reps)],
            "vs_baseline": round(spread(sw_reps)[1] / max(cpu_reps), 2),
            "baseline_def": (
                "vectorized-NumPy same band recurrence, this host"
            ),
            "cpu_sw_cells_per_sec": round(max(cpu_reps), 0),
            "sw_results_match_cpu": sw_agree,
            "device": str(jax.devices()[0]),
        })
        ext_reps = [
            bench_extension(np.random.default_rng(0)) for _ in range(3)
        ]
        out["extension_cells_per_sec"] = round(spread(ext_reps)[1], 0)
        out["extension_spread_cells_per_sec"] = [
            round(v, 0) for v in spread(ext_reps)
        ]
        # BASELINE config 4 (50 genomes sharded-scale analog), one warm
        # pair — VERDICT r4 weak #6 asked for a stage table in the
        # artifact for at least one of configs 4-5
        # same world as benchmarks/scale_50x300kb.py (recorded table)
        CANON50 = dict(seed=50, sub_rate=0.001, indel_rate=0.00005,
                       n_inversions=1)
        bench_pipeline(prefix="pipeline50_cold", n_genomes=50,
                       length=300_000, world=CANON50)
        out.update(bench_pipeline(prefix="pipeline50", n_genomes=50,
                                  length=300_000, world=CANON50))
        return out
    raise SystemExit(f"unknown section {name}")


def _run_section(
    name: str, budget_s: int, env_extra: dict | None = None
) -> tuple[dict | None, str | None]:
    """Run a section as a subprocess with a hard timeout (a hung device
    call cannot be interrupted in-process)."""
    import os

    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        p = subprocess.run(
            [sys.executable, __file__, "--section", name],
            capture_output=True, text=True, timeout=budget_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {budget_s}s (TPU tunnel wedged?)"
    if p.returncode != 0:
        return None, (p.stderr or p.stdout)[-300:]
    try:
        return json.loads(p.stdout.strip().splitlines()[-1]), None
    except Exception:
        return None, f"unparseable section output: {p.stdout[-200:]!r}"


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        print(json.dumps(_section_main(sys.argv[2])), flush=True)
        return
    out = {
        "metric": "sw_dp_cells_per_sec_per_chip",
        "value": 0,
        "unit": "cells/s",
        "vs_baseline": 0,
    }
    # One combined TPU subprocess (pipeline + sw + ext): the first
    # dispatch of every fresh process on this machine waits minutes for
    # the device claim (measured 3s-12min of pure server-side wait), so
    # the TPU work pays it once. NOTE: no byte-gather "oracle" section by
    # default - its remote compile exceeds any sane budget here, and a
    # timed-out section leaves an ORPHANED server-side compile that
    # stalls the next runs. Opt in with: python bench.py --section oracle
    for name, budget, required, env_extra in (
        ("tpu", 2400, True, None),
        ("pipeline_cpu", 1500, False, {"NPGE_FORCE_PLATFORM": "cpu"}),
    ):
        res, err = _run_section(name, budget, env_extra)
        if res is not None:
            out.update(res)
        elif required:
            out[f"{name}_error"] = err
    cpu_wall = out.get("cpu_pipeline_wall_s", CPU_BACKEND_PIPELINE_WALL_S)
    if out.get("pipeline_wall_s"):
        out["pipeline_vs_cpu_backend"] = round(
            cpu_wall / out["pipeline_wall_s"], 2
        )
    if out.get("pipeline_warm_wall_s"):
        out["pipeline_warm_vs_cpu_backend"] = round(
            cpu_wall / out["pipeline_warm_wall_s"], 2
        )
    if out.get("pipeline17_warm_wall_s") and out.get("cpu_pipeline17_wall_s"):
        out["pipeline17_warm_vs_cpu_backend"] = round(
            out["cpu_pipeline17_wall_s"] / out["pipeline17_warm_wall_s"], 2
        )
    if out.get("pipeline50_wall_s") and out.get("cpu_pipeline50_wall_s"):
        out["pipeline50_vs_cpu_backend"] = round(
            out["cpu_pipeline50_wall_s"] / out["pipeline50_wall_s"], 2
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
