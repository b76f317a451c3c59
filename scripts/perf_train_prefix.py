"""Backward-pass budget table: fwd+bwd cost of true PREFIXES of the train
graph (the VERDICT-r3 item: train is 88 ms/pair vs eval's 20 where the
roofline says ~60-65 — find which stages' backward runs below the forward's
polish).

For each stop_at stage s (stem, block1..4, deconv1..3, full) this times

    value_and_grad(params -> sum(model(feats, train=True, stop_at=s)))

at the reference recipe (crop 256x512, D=192, batch 2, bf16 compute,
train-mode BN via mutable batch_stats). Differences between consecutive
rows give the marginal fwd+bwd cost of each stage, directly comparable to
the eval prefix table in PERF.md (scripts/perf_model_prefix.py).

Features are computed OUTSIDE the timed region (they are a constant w.r.t.
params — the real step treats them the same way); the "full" row adds the
head + loss. Scan-delta timing per PERF.md discipline.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from _perf_common import scan_time

N_ITERS = 8
STAGES = ["stem", "block1", "block2", "block3", "block4",
          "deconv1", "deconv2", "deconv3", "full"]


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer
    from msnets_tpu.engine import loss as L
    from msnets_tpu.ops.features import ms_features_train

    mcfg = MatchingConfig()
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name="MS-GCNet", max_disp=192),
                 train=TrainConfig(crop_height=256, crop_width=512,
                                   batch_size=2),
                 data=DataConfig())
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(2))
    rng = np.random.default_rng(0)
    bh, bwl = mcfg.board_h, 192
    shape = (2, 256 + 2 * bh, 512 + bwl)
    iml = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    target = jnp.asarray(np.full((2, 256, 512), 8.0, np.float32))
    model = tr.model

    feats = jax.jit(lambda a, b: jax.vmap(lambda x, y: ms_features_train(
        x, y, 192, mcfg, bh, bwl, 0, mcfg.left_only, jnp.bfloat16))(a, b))(
            iml, imr)
    feats = jax.block_until_ready(feats)
    mask = L.train_valid_mask(target, 192)

    def make_loop(stage, n):
        def loss_fn(params, f):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                f, train=True, mutable=["batch_stats"],
                stop_at="" if stage == "full" else stage)
            if stage == "full":
                return L.gcnet_loss(out, target, mask, False, 3.0, 2.0)
            return jnp.sum(out.astype(jnp.float32))

        vg = jax.value_and_grad(loss_fn)

        @jax.jit
        def loop():
            def body(carry, _):
                # real data dependency XLA cannot fold away: carry*0 would
                # constant-fold (x*0 -> 0) and hoist the whole body out of
                # the scan; adding min(|carry|, 1e-30) leaves bf16 feats
                # bit-identical while staying data-dependent
                z = jnp.minimum(jnp.abs(carry), 1e-30).astype(feats.dtype)
                v, g = vg(state.params, feats + z)
                # EVERY grad leaf must feed the carry: with only one leaf
                # consumed, XLA DCEs the dW computation of all the others
                # (caught comparing against perf_train_bisect_stages — the
                # first version under-measured the backward by ~2x)
                gn = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                         for l in jax.tree.leaves(g))
                return v.astype(jnp.float32) + gn, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out
        return loop

    prev = 0.0
    print(f"{'stage':<10} {'fwd+bwd ms':>11} {'marginal ms':>12}")
    for s in STAGES:
        t = scan_time(lambda n, s=s: make_loop(s, n), N_ITERS) * 1e3
        print(f"{s:<10} {t:11.1f} {t - prev:12.1f}", flush=True)
        prev = t


if __name__ == "__main__":
    main()
