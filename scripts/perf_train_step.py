"""Time the full jitted train step (features+fwd+bwd+Adam) on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import Config, DataConfig, MatchingConfig, ModelConfig, TrainConfig
    from msnets_tpu.engine import Trainer

    mdm = sys.argv[1] if len(sys.argv) > 1 else "dense"
    mcfg = MatchingConfig()
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name="MS-GCNet", max_disp=192,
                                   mid_deconv_mode=mdm,
                                   mid_deconv_mode_train=mdm),
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
    disp = jnp.asarray(np.full((2, 256, 512), 8.0, np.float32))
    lr = jnp.asarray(1e-3, jnp.float32)
    fn = tr.step_fn(bh, bwl, 0)

    state, m, _ = fn(state, iml, imr, disp, lr)
    _ = float(m["loss"])  # sync
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, m, _ = fn(state, iml, imr, disp, lr)
        _ = float(m["loss"])  # value fetch = sync
        times.append(time.perf_counter() - t0)
    ts = sorted(times)
    print(f"train step (batch 2): min {ts[0]*1e3:.1f} ms, med {ts[len(ts)//2]*1e3:.1f} ms"
          f" -> {2/ts[0]:.2f} pairs/s")

if __name__ == "__main__":
    main()
