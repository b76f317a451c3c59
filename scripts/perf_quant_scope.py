"""int8 quant scope A/B at bench shapes: bf16 vs static-all vs static-stem.

Round-2 verdict: static int8 over conv2 + block entries loses to bf16
(23.01 vs 22.0 ms/pair) — the s32 partial sums / dequant epilogue cost more
HBM than the MXU rate saves on the SMALL block convs. Hypothesis: restricting
quant to the stem conv2 (the 1.85x isolated winner, ~3.4 ms of the 5.7 ms
stem) keeps the win and drops the losers.

Usage: python scripts/perf_quant_scope.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np

H, W, D = 256, 512, 192


def bench_variant(tag, quant, scope):
    import jax, jax.numpy as jnp
    from msnets_tpu.config import MatchingConfig, ModelConfig
    from msnets_tpu.models import build_model
    from msnets_tpu.ops.features import ms_features_test
    import dataclasses

    mcfg = MatchingConfig()
    model_cfg = ModelConfig(name="MS-GCNet", max_disp=D, quant_eval=quant,
                            quant_mode="static" if quant else "dynamic",
                            quant_scope=scope)
    model = build_model(model_cfg)
    rng = np.random.default_rng(0)
    iml = jnp.asarray(rng.integers(0, 256, (1, H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (1, H, W), dtype=np.uint8))
    feats_shape = (1, D // 2, H // 2, W // 2, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(feats_shape, jnp.float32), train=False)
    if quant:
        calib_model = build_model(dataclasses.replace(model_cfg,
                                                      quant_mode="calib"))

        @jax.jit
        def calib(v, a, b):
            f = jax.vmap(lambda x, y: ms_features_test(
                x, y, D, mcfg, True, jnp.bfloat16))(a, b)
            _, qs = calib_model.apply(v, f, train=False,
                                      mutable=["quant_stats"])
            return qs
        variables = dict(variables, **calib(variables, iml, imr))

    @jax.jit
    def fwd(v, a, b):
        f = jax.vmap(lambda x, y: ms_features_test(
            x, y, D, mcfg, True, jnp.bfloat16))(a, b)
        return model.apply(v, f, train=False)

    def make_loop(n):
        @jax.jit
        def loop(v, a, b):
            def body(c, _):
                out = fwd(v, a ^ (c % 2).astype(jnp.uint8), b)
                return out[0, 0, :8].sum().astype(jnp.int32) % 2, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                length=n)
            return c
        return loop

    def run(n):
        lp = make_loop(n)
        int(lp(variables, iml, imr))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(lp(variables, iml, imr))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tn = run(1), run(20)
    ms = (tn - t1) / 19 * 1e3
    print(f"{tag:12s}: {ms:6.2f} ms/pair = {1e3 / ms:5.2f} pairs/s")
    sys.stdout.flush()
    return ms


VARIANTS = {"bf16": (False, "all"), "int8-stem": (True, "stem"),
            "int8-all": (True, "all")}

if __name__ == "__main__":
    for tag in (sys.argv[1:] or ["bf16", "int8-stem", "int8-all"]):
        bench_variant(tag, *VARIANTS[tag])
