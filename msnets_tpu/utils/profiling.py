"""Profiling & numerics-debug helpers.

Replaces the reference's ad-hoc observability (SURVEY.md §5.1/§5.2):
per-step wall-clock prints + psutil RSS there; structured ``jax.profiler``
traces, step timers and NaN tripwires here. The reference keeps
``torch.autograd.set_detect_anomaly(True)`` permanently on during training
(main_msnet.py:767); our equivalent is ``debug_nans`` (opt-in — it disables
async dispatch, like anomaly mode slowed torch).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """NaN/Inf tripwire on every jitted computation (jax_debug_nans)."""
    import jax
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Wall-clock per-step timing with simple summary statistics."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {"mean": sum(ts) / n, "p50": ts[n // 2],
                "p90": ts[min(int(n * 0.9), n - 1)], "min": ts[0],
                "max": ts[-1], "steps": n}


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats (MB) when the backend exposes them."""
    import jax
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {k: v / 2 ** 20 for k, v in s.items()
                           if "bytes" in k}
        except Exception:
            pass
    return out


NOMINAL_DISPATCH_MS = 35.0   # the axon relay's healthy per-dispatch latency


def relay_dispatch_ms(probes: int = 5) -> float:
    """Measured per-dispatch round-trip latency of the device backend.

    Times a trivial jitted op including the device->host VALUE fetch (the
    only thing that synchronizes through the axon relay) and returns the
    best of ``probes`` runs in ms. On a healthy relay this is ~35 ms; on a
    degraded day it has been observed at ~3x that — which silently pollutes
    any wall-clock serving/bench number (PERF.md round-3 serving recheck:
    127.4 vs 96.5 ms/frame across two days with identical code). Callers
    should annotate results with this number and refuse to print headline
    figures when it exceeds ~2x nominal."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    int(f(jnp.zeros((), jnp.int32)))          # compile + warm
    best = float("inf")
    for _ in range(probes):
        t0 = time.perf_counter()
        int(f(jnp.zeros((), jnp.int32)))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def relay_health(probes: int = 5):
    """(dispatch_ms, healthy) — healthy = within 2x the nominal latency."""
    ms = relay_dispatch_ms(probes)
    return ms, ms <= 2.0 * NOMINAL_DISPATCH_MS
