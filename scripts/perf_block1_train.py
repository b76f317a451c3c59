"""Isolate block1's train-mode fwd+bwd cost (41 ms marginal in the budget
table — 5.9x its eval forward; scripts/perf_train_prefix.py) and attribute
it across: the packed-entry stride-2 conv, the wshift inner convs, and
PackedPhaseBN.

Variants (each timed fwd+bwd with every grad leaf consumed, scan-delta):
  packed   — production path: s2d entry (packed stem input) + wshift inner
             convs + PackedPhaseBN
  full     — full-layout block (entry consumes an unpacked stem, inner
             convs full layout, flax BatchNorm)
  entry    — ONLY the entry conv (packed path), +BN
  inner    — ONLY the two wshift inner convs, +BN

Input: the packed-std stem output shape at the reference recipe,
[2, 96, 64, 128, 128] bf16.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from _perf_common import scan_time

N_ITERS = 8


def main():
    import jax, jax.numpy as jnp
    from flax import linen as nn
    from msnets_tpu.models.layers import Conv3DBlock, ConvBN3D, hw_unpack

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(2, 96, 64, 128, 128)) * 0.5,
                     jnp.bfloat16)

    class EntryOnly(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return nn.relu(ConvBN3D(64, 2, dtype=jnp.bfloat16,
                                    name="convbn_3d_1")(x, train, "std",
                                                        "full"))

    class InnerOnly(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            x = nn.relu(ConvBN3D(64, 1, dtype=jnp.bfloat16,
                                 name="convbn_3d_2")(x, train, "full",
                                                     "wshift"))
            return nn.relu(ConvBN3D(64, 1, dtype=jnp.bfloat16,
                                    name="convbn_3d_3")(x, train, "wshift",
                                                        "full"))

    inner_in = jnp.asarray(rng.normal(size=(2, 48, 32, 64, 64)) * 0.5,
                           jnp.bfloat16)
    variants = {
        "packed": (Conv3DBlock(64, 2, dtype=jnp.bfloat16), xp, ("std",)),
        "full":   (Conv3DBlock(64, 2, dtype=jnp.bfloat16), hw_unpack(xp),
                   ("full",)),
        "entry":  (EntryOnly(), xp, ()),
        "inner":  (InnerOnly(), inner_in, ()),
    }
    for name, (mod, x, extra) in variants.items():
        v = mod.init(jax.random.PRNGKey(0), x, False, *extra)

        def make_loop(n, mod=mod, x=x, extra=extra, v=v):
            def loss_fn(params, xx):
                out, _ = mod.apply(
                    {"params": params, **{k: v[k] for k in v
                                          if k != "params"}},
                    xx, True, *extra, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))

            vg = jax.value_and_grad(loss_fn)

            # x and params enter as jit ARGUMENTS: a closed-over concrete
            # array bakes into the HLO as a literal and the 400 MB body
            # exceeds the relay's request-size limit (HTTP 413)
            @jax.jit
            def loop(xx, params):
                def body(carry, _):
                    z = jnp.minimum(jnp.abs(carry), 1e-30).astype(xx.dtype)
                    val, g = vg(params, xx + z)
                    gn = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                             for l in jax.tree.leaves(g))
                    return val.astype(jnp.float32) + gn, None
                out, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=n)
                return out
            import functools
            return functools.partial(loop, x, v["params"])

        t = scan_time(make_loop, N_ITERS) * 1e3
        print(f"block1 train fwd+bwd [{name:6s}]: {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
