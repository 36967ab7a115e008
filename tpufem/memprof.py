"""Memory profiler: background RSS/VSIZE sampler.

Equivalent of the reference's rank-0 daemon thread reading
``/proc/self/stat`` every 100 ms and logging ``VSIZE=..., RSS=...``
under a ``[MEM]`` pattern (reference: src/mem.cpp:18-38, started/joined
around solve() at src/main.cpp:104-107,236-240).  Uses psutil; also
reports device HBM stats when a TPU is attached.
"""

from __future__ import annotations

import logging
import threading
import time

logger = logging.getLogger("tpufem")


class MemoryProfiler:
    def __init__(self, interval_s: float = 0.1) -> None:
        self.interval = interval_s
        self._quit = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        import psutil
        proc = psutil.Process()
        page_gb = 1.0 / (1 << 30)
        while not self._quit.is_set():
            mi = proc.memory_info()
            logger.info("[MEM] VSIZE = %.3f GB, RSS = %.3f GB",
                        mi.vms * page_gb, mi.rss * page_gb)
            self._quit.wait(self.interval)

    def start(self) -> "MemoryProfiler":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._thread is not None:
            self._quit.set()
            self._thread.join()
            self._thread = None


def device_memory_stats() -> dict:
    """HBM usage of the first device, when the backend reports it."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    return stats
