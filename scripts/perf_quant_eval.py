"""int8 quant_eval A/B: throughput + disparity divergence vs the bf16 path.

Builds the full bench-shape eval forward (device MS features -> MS-GCNet)
twice from ONE shared parameter set — quant_eval off/on — scan-times both,
and reports the disparity delta between them on a structured synthetic
stereo pair (smooth texture, known shift). The delta is the quantization
noise of the whole network; the reference accuracy gate is bad-3 (3 px),
so deltas well under 1 px are inert.

Usage: python scripts/perf_quant_eval.py [iters]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

H, W, D = 256, 512, 192


def synth_pair(h, w, shift=17, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 4, (w + shift) // 4 + 1))
    base = cv2.resize(base.astype(np.uint8), (w + shift, h),
                      interpolation=cv2.INTER_CUBIC)
    noise = rng.integers(0, 32, base.shape, dtype=np.uint8)
    base = np.clip(base.astype(np.int32) + noise, 0, 255).astype(np.uint8)
    return base[:, :w], base[:, shift:shift + w]


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.config import MatchingConfig, ModelConfig
    from msnets_tpu.models import build_model
    from msnets_tpu.ops.features import ms_features_test

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    mcfg = MatchingConfig()
    iml_np, imr_np = synth_pair(H, W)
    iml = jnp.asarray(iml_np[None])
    imr = jnp.asarray(imr_np[None])

    feats_shape = (1, D // 2, H // 2, W // 2, 8)
    model_f = build_model(ModelConfig(name="MS-GCNet", max_disp=D))
    model_q = build_model(ModelConfig(name="MS-GCNet", max_disp=D,
                                      quant_eval=True))
    model_c = build_model(ModelConfig(name="MS-GCNet", max_disp=D,
                                      quant_eval=True, quant_mode="calib"))
    model_s = build_model(ModelConfig(name="MS-GCNet", max_disp=D,
                                      quant_eval=True, quant_mode="static"))
    variables = model_f.init(jax.random.PRNGKey(0),
                             jnp.zeros(feats_shape, jnp.float32), train=False)

    def make_fwd(model):
        @jax.jit
        def fwd(variables, iml, imr):
            f = jax.vmap(lambda a, b: ms_features_test(
                a, b, D, mcfg, True, jnp.bfloat16))(iml, imr)
            return model.apply(variables, f, train=False)
        return fwd

    fwd_f, fwd_q, fwd_s = make_fwd(model_f), make_fwd(model_q), \
        make_fwd(model_s)

    # calibration: one bf16 forward recording per-layer input absmax
    feats = jax.vmap(lambda a, b: ms_features_test(
        a, b, D, mcfg, True, jnp.bfloat16))(iml, imr)
    _, qs = model_c.apply(variables, feats, train=False,
                          mutable=["quant_stats"])
    variables_s = dict(variables, **jax.device_get(qs))

    d_f = np.asarray(fwd_f(variables, iml, imr))[0]
    d_q = np.asarray(fwd_q(variables, iml, imr))[0]
    d_s = np.asarray(fwd_s(variables_s, iml, imr))[0]
    for label, d in (("int8-dynamic", d_q), ("int8-static", d_s)):
        delta = np.abs(d_f - d)
        print(f"{label} disparity delta: mean {delta.mean():.4f} px  "
              f"p99 {np.percentile(delta, 99):.4f}  max {delta.max():.4f}  "
              f"frac>0.5px {(delta > 0.5).mean():.5f}")

    def make_loop(fwd, n):
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

    def timed(fn, v):
        int(fn(v, iml, imr))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(fn(v, iml, imr))
            best = min(best, time.perf_counter() - t0)
        return best

    for label, fwd, v in (("bf16", fwd_f, variables),
                          ("int8-dynamic", fwd_q, variables),
                          ("int8-static", fwd_s, variables_s)):
        t1 = timed(make_loop(fwd, 1), v)
        tn = timed(make_loop(fwd, iters), v)
        per = (tn - t1) / (iters - 1)
        print(f"{label}: {per * 1e3:7.2f} ms/pair = {1.0 / per:6.2f} pairs/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
