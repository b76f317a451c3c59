"""True device time of full-res KITTI cross-val inference (384x1248, D=192)
using the on-device lax.scan timing discipline (see PERF.md), plus the same
for the Middlebury/ETH3D crop (576x960).

Bench shape (256x512) reads ~21.5 ms/pair; KITTI is 3.66x the volume, so
linear scaling predicts ~79 ms. Anything far above that is a tiling cliff
worth chasing.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np


def timed_loop(make_fn, iters=10, warmup=2):
    def run(n):
        fn = make_fn(n)
        int(fn())
        best = float("inf")
        for _ in range(warmup):
            t0 = time.perf_counter(); int(fn()); best = min(best, time.perf_counter() - t0)
        return best
    t1 = run(1); tn = run(iters)
    return (tn - t1) / (iters - 1)


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import MatchingConfig, ModelConfig
    from msnets_tpu.models import build_model
    from msnets_tpu.ops.features import ms_features_test

    import sys as _s
    model_name = "MS-PSMNet" if "--psmnet" in _s.argv else "MS-GCNet"
    mcfg = MatchingConfig()
    rng = np.random.default_rng(0)
    # EVAL_QUANT=dynamic|static -> int8 eval arms (see ModelConfig.quant_mode)
    quant = _os.environ.get("EVAL_QUANT", "")
    for (H, W, D, label) in [(384, 1248, 192, "KITTI 384x1248"),
                             (576, 960, 192, "MB/ETH 576x960"),
                             (256, 512, 192, "bench 256x512")]:
        model = build_model(ModelConfig(
            name=model_name, max_disp=D, quant_eval=bool(quant),
            quant_mode=quant if quant == "static" else "dynamic"))
        iml = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
        imr = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
        feats_shape = (1, D // 2, H // 2, W // 2, 8)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros(feats_shape, jnp.float32), train=False)
        if quant == "static":
            calib = build_model(ModelConfig(name=model_name, max_disp=D,
                                            quant_eval=True,
                                            quant_mode="calib"))
            f = ms_features_test(iml, imr, D, mcfg, True, jnp.bfloat16)[None]
            _, qs = calib.apply(v, f, train=False, mutable=["quant_stats"])
            v = dict(v, **jax.device_get(qs))

        def make(n, v=v, iml=iml, imr=imr, model=model, D=D):
            @jax.jit
            def loop(v, a, b):
                def body(c, _):
                    f = ms_features_test(a ^ c.astype(a.dtype), b, D, mcfg,
                                         True, jnp.bfloat16)[None]
                    out = model.apply(v, f, train=False)
                    o = out.ravel()
                    return jax.lax.dynamic_index_in_dim(
                        o, c % o.size, 0, False).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                    length=n)
                return c
            return lambda: loop(v, iml, imr)
        try:
            dt = timed_loop(make)
            print(f"{label:18s} {dt*1e3:8.1f} ms/frame device time")
        except Exception as e:
            print(f"{label:18s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
