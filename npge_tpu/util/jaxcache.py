"""Persistent XLA compilation cache.

The pipeline's device ops compile once per (shape-bucket, k) — tens of
seconds on a remote-compile TPU backend. The persistent cache makes that a
once-per-machine cost instead of once-per-process (the orchestration loop
itself never recompiles: shapes are bucketed to powers of two and scalar
arguments like T2 are traced, see ops/extend.py).

Analog of the reference's build-once/run-many posture; there is no reference
counterpart (C++ is AOT) — this is TPU-runtime plumbing.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache(path: str | None = None) -> str:
    """Idempotently point JAX at a persistent on-disk compilation cache.

    Priority: explicit arg > $NPGE_XLA_CACHE > ~/.cache/npge_tpu/xla.
    Returns the directory used. Call before the first jit dispatch for full
    effect (later calls still help subsequent compiles).
    """
    global _DONE
    import jax

    path = (
        path
        or os.environ.get("NPGE_XLA_CACHE")
        or os.path.expanduser("~/.cache/npge_tpu/xla")
    )
    if _DONE:
        return path
    # per-backend subdir: CPU AOT artifacts are machine-feature-tagged and
    # must not collide with TPU executables in one directory
    try:
        path = os.path.join(path, jax.default_backend())
    except Exception:
        pass
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _DONE = True
    return path
