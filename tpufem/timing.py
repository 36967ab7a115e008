"""Scoped timers and the cross-rank timing table.

Equivalent of ``dolfinx::common::Timer`` + ``dolfinx::list_timings``
(reference: src/main.cpp:130,145,208,226 and ~20 other sites). Stage
names keep the reference's ``ZZZ`` prefix so timing tables compare
line-for-line (reference: README.md:150-161).

JAX dispatch is asynchronous, so a timer that should account for device
work must synchronize; ``Timer(..., sync=x)`` blocks on ``x`` at stop.
"""

from __future__ import annotations

import collections
import time
from typing import Any, Dict, List, Optional, Tuple


class TimingRegistry:
    """Accumulates (count, total seconds) per timer name."""

    def __init__(self) -> None:
        self._data: "collections.OrderedDict[str, List[float]]" = collections.OrderedDict()

    def add(self, name: str, elapsed: float) -> None:
        rec = self._data.setdefault(name, [0, 0.0])
        rec[0] += 1
        rec[1] += elapsed

    def rows(self) -> List[Tuple[str, int, float]]:
        return [(k, int(v[0]), v[1]) for k, v in self._data.items()]

    def get(self, name: str) -> float:
        return self._data.get(name, [0, 0.0])[1]

    def reset(self) -> None:
        self._data.clear()

    def table(self, ranks: int = 1) -> str:
        """Render the timing table (the ``list_timings`` analogue,
        reference main.cpp:226 reduces min/avg/max over MPI ranks).

        Under SPMD sharding every shard executes the one compiled
        program in lockstep on this host's device mesh, so the per-shard
        wall times are identical by construction; the reduced columns
        are printed for table parity with the reference.
        """
        name_w = max([len("Summary")] + [len(k) for k, _, _ in self.rows()]) + 2
        if ranks > 1:
            lines = [f"{'Summary':<{name_w}}{'reps':>6}  {'wall min':>12}"
                     f"  {'wall avg':>12}  {'wall max':>12}"]
            for name, reps, tot in self.rows():
                avg = tot / max(reps, 1)
                lines.append(f"{name:<{name_w}}{reps:>6}  {avg:>12.6f}"
                             f"  {avg:>12.6f}  {avg:>12.6f}")
            lines.append(f"(reduced over {ranks} shards; SPMD lockstep — "
                         "one program, identical per-shard times)")
            return "\n".join(lines)
        lines = [
            f"{'Summary':<{name_w}}{'reps':>6}  {'wall avg':>12}  {'wall tot':>12}",
        ]
        has_solve = False
        for name, reps, tot in self.rows():
            avg = tot / max(reps, 1)
            lines.append(f"{name:<{name_w}}{reps:>6}  {avg:>12.6f}  {tot:>12.6f}")
            has_solve = has_solve or name == "ZZZ Solve"
        if has_solve:
            # stage-semantics note (reference: "ZZZ Solve" includes
            # PCSetUp on the first KSPSolve, poisson_problem.cpp:164-179;
            # here it additionally includes one-time XLA compilation,
            # which the reference pays at build time via ffcx/C++)
            lines.append("(ZZZ Solve includes preconditioner setup — see "
                         "'ZZZ PC setup' — and, on a cold cache, one-time "
                         "XLA program compilation)")
        return "\n".join(lines)


REGISTRY = TimingRegistry()


class Timer:
    """Context-manager timer: ``with Timer("ZZZ Solve", sync=u): ...``.

    ``sync`` may be an array/pytree; ``jax.block_until_ready`` is called
    on it before the clock stops so device work is included.
    """

    def __init__(self, name: str, registry: Optional[TimingRegistry] = None,
                 sync: Any = None) -> None:
        self.name = name
        self.registry = registry if registry is not None else REGISTRY
        self._sync = sync
        self.elapsed = 0.0
        self._t0 = 0.0

    def start(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def stop(self, sync: Any = None) -> float:
        obj = sync if sync is not None else self._sync
        if obj is not None:
            import jax
            jax.block_until_ready(obj)
        self.elapsed = time.perf_counter() - self._t0
        self.registry.add(self.name, self.elapsed)
        return self.elapsed

    def __enter__(self) -> "Timer":
        return self.start()

    def __exit__(self, *exc: Any) -> None:
        self.stop()


def list_timings(registry: Optional[TimingRegistry] = None,
                 ranks: int = 1) -> str:
    reg = registry if registry is not None else REGISTRY
    s = reg.table(ranks=ranks)
    print(s, flush=True)
    return s
