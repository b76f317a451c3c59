"""Train throughput vs (batch_size, grad_accum) on one chip.

Batch 2 direct fits HBM without remat (199 ms/step). Larger batches must
micro-batch through grad_accum; this sweeps whether amortizing the Adam
update + feature stage over more pairs beats the per-step cost.

Usage: python scripts/perf_train_batch_sweep.py [bs:accum ...]
       default sweep: 2:1 4:2 8:4
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer

    specs = [tuple(int(v) for v in a.split(":"))
             for a in (sys.argv[1:] or ["2:1", "4:2", "8:4"])]
    for bs, accum in specs:
        mcfg = MatchingConfig()
        cfg = Config(matching=mcfg,
                     model=ModelConfig(name="MS-GCNet", max_disp=192),
                     train=TrainConfig(crop_height=256, crop_width=512,
                                       batch_size=bs, grad_accum=accum),
                     data=DataConfig())
        tr = Trainer(cfg)
        state = tr.init_state(tr.feats_shape_for(bs))
        rng = np.random.default_rng(0)
        bh, bwl = mcfg.board_h, 192
        shape = (bs, 256 + 2 * bh, 512 + bwl)
        iml = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
        imr = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
        disp = jnp.asarray(np.full((bs, 256, 512), 8.0, np.float32))
        lr = jnp.asarray(1e-3, jnp.float32)
        fn = tr.step_fn(bh, bwl, 0)
        try:
            state, m, _ = fn(state, iml, imr, disp, lr)
            _ = float(m["loss"])
        except Exception as e:
            print(f"bs={bs} accum={accum}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            state, m, _ = fn(state, iml, imr, disp, lr)
            _ = float(m["loss"])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"bs={bs} accum={accum}: {best*1e3:.1f} ms/step = "
              f"{bs/best:.2f} pairs/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
