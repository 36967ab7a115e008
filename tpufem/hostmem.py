"""Host-memory tuning for the deployment VM.

The TPU host provisions guest pages lazily: the FIRST touch of a fresh
page runs at ~16-80 MB/s (measured; re-touch runs at 2.5-4.5 GB/s), so
every GB of new allocation costs 12-60 s of wall the first time a
process uses it.  The reference avoids this class of cost with pooled
native allocators (PETSc keeps and reuses its buffers); the equivalents
here:

- ``tune_allocator()``: glibc ``mallopt`` raises the mmap threshold and
  disables trim, so numpy's large setup temporaries are SERVED FROM THE
  HEAP POOL and reused across setup phases instead of being munmapped on
  free and re-faulted on the next allocation (measured: repeated 500k
  CSR exports 18.5 s -> 1.4 s steady-state).  Called at package import;
  idempotent, no-op on non-glibc.
- ``prefault(nbytes, background=True)``: touch ``nbytes`` of heap once
  so the pool's pages are host-materialized before the setup phases
  need them.  Run in a daemon thread it overlaps the device/tunnel
  warm-up (tens of seconds of XLA compile waits), taking the fault cost
  off the critical path.  The buffer is freed immediately — with
  ``tune_allocator`` the pool retains the warmed pages.
"""

from __future__ import annotations

import ctypes
import logging
import threading

logger = logging.getLogger("tpufem")

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_tuned = False


def tune_allocator() -> bool:
    """Raise glibc's mmap threshold (1 GiB) and disable heap trim so
    large numpy temporaries are pooled and reused.  Idempotent."""
    global _tuned
    if _tuned:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30) == 1)
    except Exception:  # pragma: no cover - non-glibc platforms
        ok = False
    _tuned = ok
    if not ok:  # pragma: no cover
        logger.debug("mallopt tuning unavailable; large numpy "
                     "temporaries will be re-faulted per allocation")
    return ok


def _touch(nbytes: int) -> None:
    # chunks BELOW the raised mmap threshold: a single >= 1 GiB buffer
    # would be served via mmap and munmapped on free (glibc always
    # unmaps mmap'd chunks), warming nothing; sub-threshold chunks grow
    # the brk heap, which the disabled trim retains.  All chunks stay
    # alive until the end so the heap grows to the full size.
    import numpy as np
    chunk = 256 << 20
    held = []
    try:
        for _ in range((nbytes + chunk - 1) // chunk):
            buf = np.empty(chunk, dtype=np.uint8)
            buf[::4096] = 1  # one write per 4 KiB page
            held.append(buf)
    except MemoryError:  # pragma: no cover
        pass
    finally:
        held.clear()


def prefault(nbytes: int = 1 << 30, background: bool = True):
    """Materialize ``nbytes`` of host pages in the malloc pool (one
    write per page).  ``background=True`` returns a started daemon
    thread (join it to be sure the pool is warm); False blocks."""
    tune_allocator()
    if not background:
        _touch(nbytes)
        return None
    th = threading.Thread(target=_touch, args=(nbytes,), daemon=True,
                          name="tpufem-prefault")
    th.start()
    return th
