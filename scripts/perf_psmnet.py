"""MS-PSMNet eval throughput at bench shapes (512x256, D=192, batch 1).

Same pipeline and timing discipline as bench.py (on-device lax.scan with a
real inter-iteration dependency, minus a length-1 run), with the flagship
MS-GCNet swapped for MS-PSMNet (stacked hourglass, 1 eval head — reference
psmnet_3dcnn.py:176-179 returns only disp3 in eval).

Usage: python scripts/perf_psmnet.py [iters]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

H, W, D = 256, 512, 192


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.config import MatchingConfig, ModelConfig
    from msnets_tpu.models import build_model
    from msnets_tpu.ops.features import ms_features_test

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    mcfg = MatchingConfig()
    # A/B knobs: PSM_PACKED_OUTER=0 -> full-layout eval outer graph;
    # PSM_QUANT=1 -> int8 eval of the gated convs;
    # PSM_QUANT_MODE=static -> calibrated fixed activation scales
    import os
    quant_mode = os.environ.get("PSM_QUANT_MODE", "dynamic")
    model = build_model(ModelConfig(
        name="MS-PSMNet", max_disp=D,
        quant_eval=bool(int(os.environ.get("PSM_QUANT", "0"))),
        quant_mode=quant_mode,
        packed_eval_outer=bool(int(os.environ.get("PSM_PACKED_OUTER", "1")))))

    B = int(os.environ.get("PSM_BATCH", "1"))
    rng = np.random.default_rng(0)
    iml = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    feats_shape = (1, D // 2, H // 2, W // 2, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(feats_shape, jnp.float32), train=False)
    if quant_mode == "static":
        calib = build_model(ModelConfig(name="MS-PSMNet", max_disp=D,
                                        quant_eval=True, quant_mode="calib"))
        f = jax.vmap(lambda a, b: ms_features_test(a, b, D, mcfg, True,
                                                   jnp.bfloat16))(iml, imr)
        _, qs = calib.apply(variables, f, train=False,
                            mutable=["quant_stats"])
        variables = dict(variables, **jax.device_get(qs))

    def fwd(variables, iml, imr):
        f = jax.vmap(lambda a, b: ms_features_test(a, b, D, mcfg, True,
                                                   jnp.bfloat16))(iml, imr)
        return model.apply(variables, f, train=False)

    def make_loop(n):
        @jax.jit
        def loop(variables, iml, imr):
            def body(carry, _):
                a = iml ^ (carry % 2).astype(jnp.uint8)
                out = fwd(variables, a, imr)
                return out[0, 0, :8].sum().astype(jnp.int32) % 2, None
            carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                    None, length=n)
            return carry
        return loop

    def timed(fn):
        int(fn(variables, iml, imr))          # compile + sync (value fetch)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(fn(variables, iml, imr))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make_loop(1))
    tn = timed(make_loop(iters))
    per = (tn - t1) / (iters - 1) / B
    print(f"MS-PSMNet eval (batch {B}): {per*1e3:.1f} ms/pair = "
          f"{1/per:.1f} pairs/s (t1 {t1*1e3:.0f} ms, t{iters} {tn*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
