"""Shared timing primitive for the perf scripts.

The canonical measurement discipline (PERF.md): the axon relay has ~35 ms
per-dispatch latency and `block_until_ready` does not reliably wait — only
a device->host VALUE fetch synchronizes. So every microbenchmark runs its
workload inside an on-device `lax.scan` with a REAL data dependency between
iterations and reports (t_scanN - t_scan1) / (N - 1), which cancels the
dispatch latency and the sync fetch.

Dependency-chain rules (hard-won, see perf_shift_slices.py / PERF.md):
  * `carry * 0` constant-folds and lets XLA hoist the whole body;
  * single-element carry reads let XLA slice backwards through elementwise
    ops and DCE most of the work;
  * for grad workloads, EVERY grad leaf must feed the carry.
Use `xor_bit(carry)` to perturb uint8 inputs unfoldably, or add
`min(|carry|, 1e-30)` to float inputs (bit-identical values, real edge).
"""
import time


def xor_bit(carry):
    """Data-dependent 0/1 uint8 from a scalar carry (not foldable)."""
    import jax.numpy as jnp
    return (carry.astype(jnp.int32) & 1).astype(jnp.uint8)


def scan_time(make_loop, n_iters: int = 10, reps: int = 3):
    """Best scan-delta seconds/iteration for `make_loop(n)() -> scalar`."""
    loop_n, loop_1 = make_loop(n_iters), make_loop(1)
    float(loop_n())          # compile + warm
    float(loop_1())
    best = None
    for _ in range(reps):
        t0 = time.perf_counter(); float(loop_n()); tn = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop_1()); t1 = time.perf_counter() - t0
        dt = (tn - t1) / (n_iters - 1)
        best = dt if best is None else min(best, dt)
    return best
