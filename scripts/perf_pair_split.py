"""Split the bench pair time into in-graph features vs model portions.

bench.py fuses features+model in one jit; isolated microbenches have not
been predicting the fused time (XLA fuses layout ops into producers). This
times, with the same scan-chain discipline:
  A) features only (bf16 emit, as bench)
  B) model only, from a materialized volume
  C) the full fused pair (bench's fwd)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np

H, W, D = 256, 512, 192


def timed_loop(make_fn, iters=20, warmup=2):
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

    mcfg = MatchingConfig()
    model = build_model(ModelConfig(name="MS-GCNet", max_disp=D))
    rng = np.random.default_rng(0)
    iml = jnp.asarray(rng.integers(0, 256, (1, H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (1, H, W), dtype=np.uint8))
    fshape = (1, D // 2, H // 2, W // 2, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(fshape, jnp.float32), train=False)
    f0 = jnp.asarray(rng.uniform(0, 1, fshape), jnp.bfloat16)

    def scan_time(apply, label):
        def make(n):
            @jax.jit
            def loop():
                def body(c, _):
                    out = apply(c)
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return loop
        d = timed_loop(make)
        print(f"{label:44s} {d*1e3:8.2f} ms")
        sys.stdout.flush()

    def feats(c):
        a = iml ^ (c % 2).astype(jnp.uint8)
        return jax.vmap(lambda x, y: ms_features_test(
            x, y, D, mcfg, True, jnp.bfloat16))(a, imr).astype(jnp.float32)

    def model_only(c):
        f = f0 + c.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        return model.apply(variables, f, train=False)

    def full(c):
        a = iml ^ (c % 2).astype(jnp.uint8)
        f = jax.vmap(lambda x, y: ms_features_test(
            x, y, D, mcfg, True, jnp.bfloat16))(a, imr)
        return model.apply(variables, f, train=False)

    scan_time(feats, "A features only (in-graph, bf16 emit)")
    scan_time(model_only, "B model only (from volume)")
    scan_time(full, "C full fused pair")


if __name__ == "__main__":
    main()
