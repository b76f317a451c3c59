"""Bisect the TPU train-step crash: size, dtype, remat via argv."""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import Config, DataConfig, MatchingConfig, ModelConfig, TrainConfig
    from msnets_tpu.engine import Trainer

    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    remat = (sys.argv[3] if len(sys.argv) > 3 else "remat") == "remat"
    accum = 1
    if scale == "small":
        ch, cw, md, bs = 128, 256, 64, 1
    elif scale == "mid":
        ch, cw, md, bs = 256, 512, 192, 1
    elif scale == "full-accum":
        ch, cw, md, bs = 256, 512, 192, 2
        accum = 2
    else:
        ch, cw, md, bs = 256, 512, 192, 2
    mdm = sys.argv[4] if len(sys.argv) > 4 else "dense"
    mcfg = MatchingConfig()
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name="MS-GCNet", max_disp=md, compute_dtype=dtype,
                                   mid_deconv_mode=mdm,
                                   mid_deconv_mode_train=mdm),
                 train=TrainConfig(crop_height=ch, crop_width=cw,
                                   batch_size=bs, remat=remat,
                                   grad_accum=accum),
                 data=DataConfig())
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(bs))
    rng = np.random.default_rng(0)
    bh, bwl = mcfg.board_h, md
    shape = (bs, ch + 2 * bh, cw + bwl)
    iml = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    disp = jnp.asarray(np.full((bs, ch, cw), 8.0, np.float32))
    lr = jnp.asarray(1e-3, jnp.float32)
    fn = tr.step_fn(bh, bwl, 0)
    t0 = time.time()
    state, m, _ = fn(state, iml, imr, disp, lr)
    print(f"{scale}/{dtype}/remat={remat}: loss={float(m['loss']):.4f} "
          f"(compile+run {time.time()-t0:.0f}s)")
    t0 = time.perf_counter()
    state, m, _ = fn(state, iml, imr, disp, lr)
    _ = float(m["loss"])
    print(f"step time: {(time.perf_counter()-t0)*1e3:.0f} ms")

if __name__ == "__main__":
    main()
