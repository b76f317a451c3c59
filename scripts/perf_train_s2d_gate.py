"""A/B: stride-2 conv lowering for the TRAIN step's block entry convs.

The backward-budget table (perf_train_prefix.py) shows block2's marginal
fwd+bwd at 10.9 ms where FLOP scaling from block1 predicts ~5: block2-4's
entry convs fall below conv3d_ndhwc's >=1M-voxel gate and lower natively,
and XLA's VJP for a native strided conv is a dense lhs_dilation conv (the
lowering PERF.md already measured as pathological elsewhere). The s2d
space-to-depth form turns the stride-2 conv into stride-1 2-D convs whose
VJPs are stride-1 convs.

Times the full train step (reference recipe) with the gate at its default
(1M voxels) vs forced to 0 (every even-dim stride-2 conv takes s2d).
Scan-delta discipline.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from _perf_common import scan_time

N_ITERS = 8


def step_time(gate):
    import importlib
    import jax, jax.numpy as jnp
    import msnets_tpu.models.layers as L
    L._S2_HW_S2D_MIN_VOXELS = gate
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer

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
    step = tr.step_fn(bh, bwl, 0)

    def make_loop(n):
        @jax.jit
        def loop():
            def body(carry, _):
                st, dep = carry
                s2, m, _ = step(st, iml ^ (dep.astype(jnp.int32) & 1
                                           ).astype(jnp.uint8),
                                imr, target, jnp.float32(1e-3))
                return (s2, m["loss"]), None
            (st, out), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                        None, length=n)
            return out
        return loop

    return scan_time(make_loop, N_ITERS)


def main():
    for gate, label in ((1_000_000, "default gate (1M voxels)"),
                        (0, "forced s2d everywhere")):
        t = step_time(gate)
        print(f"train step, {label:28s}: {t*1e3:7.1f} ms (batch 2)",
              flush=True)


if __name__ == "__main__":
    main()
