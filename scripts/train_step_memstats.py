"""AOT-compile the train step and print XLA's HBM memory analysis.

Usage: python scripts/train_step_memstats.py [small|mid|full] [dtype] [remat|norem]
No execution — safe to probe shapes that crash the worker at run time.
"""
import os, sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import Config, DataConfig, MatchingConfig, ModelConfig, TrainConfig
    from msnets_tpu.engine import Trainer

    scale = sys.argv[1] if len(sys.argv) > 1 else "full"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    remat = (sys.argv[3] if len(sys.argv) > 3 else "remat") == "remat"
    if scale == "small":
        ch, cw, md, bs = 128, 256, 64, 1
    elif scale == "mid":
        ch, cw, md, bs = 256, 512, 192, 1
    else:
        ch, cw, md, bs = 256, 512, 192, 2
    mcfg = MatchingConfig()
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name="MS-GCNet", max_disp=md, compute_dtype=dtype),
                 train=TrainConfig(crop_height=ch, crop_width=cw,
                                   batch_size=bs, remat=remat),
                 data=DataConfig())
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(bs))
    bh, bwl = mcfg.board_h, md
    im = jax.ShapeDtypeStruct((bs, ch + 2 * bh, cw + bwl), jnp.uint8)
    tgt = jax.ShapeDtypeStruct((bs, ch, cw), jnp.float32)
    lr = jax.ShapeDtypeStruct((), jnp.float32)
    fn = tr.step_fn(bh, bwl, 0)
    lowered = fn.lower(state, im, im, tgt, lr)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    gb = 1024 ** 3
    print(f"{scale}/{dtype}/remat={remat}:")
    print(f"  temp   {m.temp_size_in_bytes / gb:.2f} GiB")
    print(f"  argument {m.argument_size_in_bytes / gb:.2f} GiB")
    print(f"  output   {m.output_size_in_bytes / gb:.2f} GiB")
    print(f"  alias    {m.alias_size_in_bytes / gb:.2f} GiB")
    tot = (m.temp_size_in_bytes + m.argument_size_in_bytes +
           m.output_size_in_bytes - m.alias_size_in_bytes)
    print(f"  peak ~= {tot / gb:.2f} GiB (v5e HBM: 16 GiB)")


if __name__ == "__main__":
    main()
