"""Per-worker allocator tuning for NumPy-heavy UDF bodies.

NumPy routes large temporary buffers through glibc's mmap path
(allocations > M_MMAP_THRESHOLD are mmap'd and munmap'd every time);
under wide-executor concurrency the resulting page-fault + zero-page +
TLB churn serializes in the kernel and was measured to cost ~3.5x wall
time on the signature stage (36.5s -> 10.2s on a 400k-doc batch at
local[32]). Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps those
buffers on the (reused) heap.

Called once per Python worker process from every UDF body; no-op where
glibc is unavailable.
"""

from __future__ import annotations

import ctypes

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_worker_memory() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        one_gib = ctypes.c_int(1 << 30)
        libc.mallopt(ctypes.c_int(_M_MMAP_THRESHOLD), one_gib)
        libc.mallopt(ctypes.c_int(_M_TRIM_THRESHOLD), one_gib)
    except Exception:
        pass
    try:
        # pyarrow's default pool (mimalloc/jemalloc) mmaps its arenas
        # and returns them to the OS between batches, so every Arrow
        # IPC batch re-faults fresh pages — on hosts that service
        # first-touch faults slowly (overcommitted VMs) the UDF stages
        # block off-CPU far longer than they compute. The system pool
        # routes through glibc malloc, which the mallopt above keeps on
        # the reused heap. Harmless everywhere else.
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass
