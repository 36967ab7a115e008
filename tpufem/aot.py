"""Ahead-of-time compilation for the jitted solve programs.

On the axon TPU backend the dispatch-path compiler used for large
programs bypasses the persistent compilation cache and runs ~10x slower
than the explicit AOT path (measured on the 500k-dof P1 GMG CG program:
first dispatch 123-468 s and never cached, vs ``lower().compile()``
14 s cold with a cache entry written and ~2 s on any later process).
The reference reaches its first solution in seconds because its kernels
are compiled at build time (ffcx/C++, src/CMakeLists.txt:23-33); AOT
compilation with a persistent cache is the JAX equivalent.
"""

from __future__ import annotations

import jax


def compile_aot(fn, *args):
    """``jax.jit(fn)`` compiled eagerly against ``args``; returns the
    compiled executable (callable with same-structured arguments)."""
    return jax.jit(fn).lower(*args).compile()


_EXE_CACHE: dict = {}


def compile_aot_cached(key, fn_factory, *args):
    """Process-wide compiled-executable memo (the analogue of DOLFINx's
    compiled-form cache: ffcx kernels are compiled once per signature
    and reused across every form instance).  ``fn_factory()`` is only
    called — and its program traced + compiled — the first time ``key``
    is seen; later builds reuse the executable with fresh same-shaped
    arguments.  Callers must fold every shape/constant the traced
    program closes over into ``key``.  Re-tracing the RHS assembly
    program measured 0.5-0.6 s per elasticity problem build at 500k —
    pure Python tracing overhead, identical program every time."""
    exe = _EXE_CACHE.get(key)
    if exe is None:
        exe = compile_aot(fn_factory(), *args)
        _EXE_CACHE[key] = exe
    return exe
