"""Component-level TPU timing: feature stage vs matchers vs model.

Uses the same chained-scan + value-fetch timing discipline as bench.py
(the remote relay has ~35 ms dispatch latency and its block_until_ready
does not reliably wait; only device->host value fetches synchronize).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def timed_loop(make_fn, iters=50, warmup=2):
    import jax
    import jax.numpy as jnp

    def run(n):
        fn = make_fn(n)
        int(fn())
        best = float("inf")
        for _ in range(warmup):
            t0 = time.perf_counter()
            int(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1)
    tn = run(iters)
    return (tn - t1) / (iters - 1)


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.config import MatchingConfig, ModelConfig
    from msnets_tpu.models import build_model
    from msnets_tpu.ops import matchers as M
    from msnets_tpu.ops.features import ms_features_test, downsample_half
    from msnets_tpu.ops.pallas.census_pallas import census_pallas

    H, W, D = 256, 512, 192
    mcfg = MatchingConfig()
    rng = np.random.default_rng(0)
    iml = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    h2 = jnp.asarray(rng.integers(0, 256, (H // 2 + 20, W // 2 + 20), dtype=np.uint8))
    r2 = jnp.asarray(rng.integers(0, 256, h2.shape, dtype=np.uint8))

    def scan_over(fn_apply, reduce_out=None):
        """Build a chained scan closure factory. The carry reads the output
        at a data-dependent index: XLA cannot dead-code-slice the pipeline
        (a fixed out[0] index lets it compute just one element of pure
        elementwise/reshape chains — observed 1.5 ms -> 0 distortions)."""
        def make(n):
            @jax.jit
            def loop():
                def body(c, _):
                    out = fn_apply(c)
                    o = out.ravel()
                    return (jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False)
                            .astype(jnp.float32).astype(jnp.int32) % 2), None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                    length=n)
                return c
            return loop
        return make

    dep = lambda img, c: img ^ (c % 2).astype(jnp.uint8)

    pieces = {}

    pieces["features_full(test path)"] = scan_over(
        lambda c: ms_features_test(dep(iml, c), imr, D, mcfg, True),
        lambda f: f[0, 0, 0, :].sum().astype(jnp.int32) % 2)

    D2 = D // 2
    pieces["census_xla(half-res)"] = scan_over(
        lambda c: M.census(dep(h2, c), r2, D2, 11),
        lambda f: f[20, 20, :8].sum().astype(jnp.int32) % 2)
    pieces["census_pallas(half-res)"] = scan_over(
        lambda c: census_pallas(dep(h2, c), r2, D2, 11),
        lambda f: f[20, 20, :8].sum().astype(jnp.int32) % 2)
    pieces["ncc(half-res)"] = scan_over(
        lambda c: M.ncc_nister(dep(h2, c), r2, D2, 3),
        lambda f: f[20, 20, :8].sum().astype(jnp.int32) % 2)
    pieces["zsad(half-res)"] = scan_over(
        lambda c: M.zsad(dep(h2, c), r2, D2, 5),
        lambda f: f[20, 20, :8].sum().astype(jnp.int32) % 2)
    pieces["sadsob+sobel(half-res)"] = scan_over(
        lambda c: M.sadsob(M.sobel(dep(h2, c)), M.sobel(r2), D2, 5),
        lambda f: f[20, 20, :8].sum().astype(jnp.int32) % 2)
    pieces["aml_all4(half-res)"] = scan_over(
        lambda c: M.extract_aml(
            jnp.broadcast_to((c % 2).astype(jnp.float32),
                             (4, h2.shape[0], h2.shape[1], D2)) + 1.0, 128.0),
        lambda f: f[0, 20, 20, :8].sum().astype(jnp.int32) % 2)
    pieces["downsample"] = scan_over(
        lambda c: downsample_half(dep(iml, c)),
        lambda f: f[0, :8].sum().astype(jnp.int32) % 2)

    model = build_model(ModelConfig(name="MS-GCNet", max_disp=D))
    feats = jnp.asarray(rng.random((1, D // 2, H // 2, W // 2, 8)),
                        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    pieces["gcnet_forward(bf16)"] = scan_over(
        lambda c: model.apply(variables,
                              feats + (c % 2).astype(jnp.float32), train=False),
        lambda d: d[0, 0, :8].sum().astype(jnp.int32) % 2)

    model32 = build_model(ModelConfig(name="MS-GCNet", max_disp=D,
                                      compute_dtype="float32"))
    pieces["gcnet_forward(f32)"] = scan_over(
        lambda c: model32.apply(variables,
                                feats + (c % 2).astype(jnp.float32), train=False),
        lambda d: d[0, 0, :8].sum().astype(jnp.int32) % 2)

    which = sys.argv[1:] if len(sys.argv) > 1 else list(pieces)
    for name in which:
        try:
            dt = timed_loop(pieces[name], iters=30)
            print(f"{name:32s} {dt*1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:32s} FAILED: {str(e)[:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
