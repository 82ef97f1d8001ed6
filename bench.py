"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: banded-SW x-drop DP cells/sec/chip (BASELINE.json `metric`: the
fragment-extension DP inner loop), measured on the Pallas wavefront kernel.
The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
measured speedup against a *vectorized NumPy* implementation of the same
banded wavefront on this host (an optimistic stand-in for the reference's
single-threaded CPU DP — it is already SIMD-wide via NumPy).

Secondary numbers (extra JSON keys): the gapless group-extension kernel's
cells/sec and its CPU counterpart.
"""

from __future__ import annotations

import json
import time

import numpy as np

NEG = -(1 << 29)


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


def bench_extension(rng):
    import jax.numpy as jnp

    from npge_tpu.ops.extend import bases_for_groups, extend_chunk, make_codes2

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
    import jax
    from functools import partial

    codes2 = make_codes2(jnp.asarray(codes))
    _, base_r = bases_for_groups(lo, hi, ori, len(codes))
    args = [codes2, jnp.asarray(base_r), jnp.asarray(fmask), jnp.asarray(cap)]

    @partial(jax.jit, static_argnames=("n",))
    def loop(codes2, base, fmask, cap, n):
        def body(i, acc):
            zeros = jnp.zeros(B, jnp.int32)
            ext, _, _ = extend_chunk(
                codes2, base + i, fmask, cap, zeros, zeros, 9, 10, CHUNK
            )
            return acc + ext.sum()
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return _timed_loop(loop, args, B * F * CHUNK)


def main():
    import signal

    def _watchdog(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "sw_dp_cells_per_sec_per_chip",
                    "value": 0,
                    "unit": "cells/s",
                    "vs_baseline": 0,
                    "error": "device timeout (TPU tunnel unresponsive)",
                }
            ),
            flush=True,
        )
        raise SystemExit(3)

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(540)

    from npge_tpu.util.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    rng = np.random.default_rng(0)
    sw_tpu, sw_cpu, sw_agree = bench_sw(rng)
    ext_tpu = bench_extension(rng)
    signal.alarm(0)
    print(
        json.dumps(
            {
                "metric": "sw_dp_cells_per_sec_per_chip",
                "value": round(sw_tpu, 0),
                "unit": "cells/s",
                "vs_baseline": round(sw_tpu / sw_cpu, 2),
                "baseline_def": "vectorized-NumPy same band recurrence, this host",
                "cpu_sw_cells_per_sec": round(sw_cpu, 0),
                "sw_results_match_cpu": sw_agree,
                "extension_cells_per_sec": round(ext_tpu, 0),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
