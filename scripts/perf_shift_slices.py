"""Gather vs static-slice disparity shifts in the matcher stage.

`shifted_over_disp` / census's descriptor shift lower to real gathers
(jnp.take with computed indices). TPU often prefers D static pad/slice ops
that fuse into stencil loops (the zsad formulation's explicit choice). A/B
both forms of census(+clip+AML) and of the full 4-matcher feature stack at
bench feature shapes.

Usage: python scripts/perf_shift_slices.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np

H, W, D = 148, 276, 96


def timed(fn, iters=20):
    import jax, jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(a, b):
            def body(c, _):
                outs = fn(a ^ (c % 2).astype(jnp.uint8), b)
                # FULL-tensor reduction: a single-element read lets XLA
                # slice backwards through the elementwise ops and
                # dead-code-eliminate the whole volume (measured: negative
                # deltas). The extra full pass costs ~0.02 ms at 16 MB.
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return s.astype(jnp.int32) % 2, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
            return c
        return loop

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    def run(n):
        lp = make(n)
        int(lp(a, b))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(lp(a, b))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tn = run(1), run(iters)
    return (tn - t1) / (iters - 1) * 1e3


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.ops import matchers as M
    from msnets_tpu.config import INVALID

    # inline GATHER-based census — the pre-round-3 formulation, kept here
    # verbatim so the A/B stays reproducible (matchers.census itself now
    # uses the slice form this script justified)
    from msnets_tpu.ops.pallas.census_pallas import _pack_descriptors

    def census_gather(iml, imr, ndisp, wsize=11):
        Hh, Ww = iml.shape
        dl = _pack_descriptors(iml, wsize)
        dr = _pack_descriptors(imr, wsize)
        j = jnp.arange(Ww)[:, None]
        d = jnp.arange(ndisp)[None, :]
        idx = jnp.clip(j - d, 0, Ww - 1)
        nwords = dl.shape[-1]
        dr_shift = jnp.take(dr, idx.reshape(-1), axis=1).reshape(
            Hh, Ww, ndisp, nwords)
        ham = jax.lax.population_count(dl[:, :, None, :] ^ dr_shift)
        cost = ham.sum(-1).astype(jnp.float32)
        mask = jnp.asarray(M._valid_mask(Hh, Ww, ndisp, wsize))
        return jnp.where(mask, cost, INVALID)

    def census_sl(iml, imr, ndisp, wsize=11):
        Hh, Ww = iml.shape
        dl = _pack_descriptors(iml, wsize)
        dr = _pack_descriptors(imr, wsize)
        cols = []
        for d in range(ndisp):
            if d == 0:
                s = dr
            elif d < Ww:
                s = jnp.pad(dr[:, :Ww - d], ((0, 0), (d, 0), (0, 0)))
            else:
                s = jnp.zeros_like(dr)
            ham = jax.lax.population_count(dl ^ s).sum(-1)
            cols.append(ham)
        cost = jnp.stack(cols, axis=-1).astype(jnp.float32)
        mask = jnp.asarray(M._valid_mask(Hh, Ww, ndisp, wsize))
        return jnp.where(mask, cost, INVALID)

    # parity first (cheap, same device)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 256, (40, 70), dtype=np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (40, 70), dtype=np.uint8))
    ref = np.asarray(M.census(a, b, 16))
    got = np.asarray(census_sl(a, b, 16))
    assert np.array_equal(ref, got), np.abs(ref - got).max()
    print("parity ok")
    sys.stdout.flush()

    ms = timed(lambda x, y: (census_gather(x, y, D),))
    print(f"census gather : {ms:7.3f} ms")
    sys.stdout.flush()
    ms = timed(lambda x, y: (M.census(x, y, D),))
    print(f"census slices (matchers.census): {ms:7.3f} ms")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
