"""Profiling/tracing harness.

The reference has no profiler story (wall-clock AverageMeters only,
SURVEY.md §5). Here: a jax-profiler trace context (loadable in
TensorBoard/xprof) and an honest wall-clock timer. NOTE for this image's
tunneled backend: `jax.block_until_ready` returns at dispatch-ack, so
`time_fn` syncs by fetching a scalar reduction of the output.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def _host_fingerprint() -> str:
    """Hash of the CPU feature set (ISA flags), so an XLA:CPU AOT blob is
    only ever reloaded on a machine that can execute it. Round-3 incident:
    a cache written on an AMX/AVX512 driver host was loaded on a plain
    AVX2 host — XLA warns this "could lead to execution errors such as
    SIGILL" (MULTICHIP_r03.json tail)."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{flags}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache; safe no-op when unsupported, the
    directory is not writable (e.g. read-only checkouts), or the backend
    is the tunneled TPU — serializing the large sampler executable through
    the axon tunnel wedges compiles for tens of minutes (and remote
    compiles never hit the cache anyway, see CLAUDE.md). CPU caches are
    keyed by a host CPU-feature fingerprint: AOT code is machine-specific
    and a cross-machine hit can SIGILL."""
    import os

    try:
        if jax.default_backend() != "cpu":
            return
        cache_dir = os.path.join(cache_dir, f"cpu-{_host_fingerprint()}")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace("/tmp/trace"): run_step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> None:
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    if leaves:
        jax.device_get(jnp.asarray(leaves[0]).ravel()[0])


def time_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    **kwargs,
) -> dict:
    """Median/min wall-clock of `fn(*args)` with real completion syncs."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "mean_s": sum(times) / len(times),
        "iters": iters,
    }
