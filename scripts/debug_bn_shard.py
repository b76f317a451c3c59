"""Repro the sharded-vs-unsharded BN batch_stats mismatch; isolate mesh axis."""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from msnets_tpu.config import (Config, DataConfig, MatchingConfig, ModelConfig,
                               TrainConfig)
from msnets_tpu.engine import Trainer
from msnets_tpu.parallel import mesh as pm


def _cfg(batch):
    return Config(
        matching=MatchingConfig(board_h=4),
        model=ModelConfig(name="MS-GCNet", max_disp=32, base_filters=8,
                          compute_dtype="float32"),
        train=TrainConfig(crop_height=64, crop_width=128, batch_size=batch,
                          remat=False),
        data=DataConfig(),
    )


cfg = _cfg(4)
mcfg = cfg.matching
rng = np.random.default_rng(0)
bh, bwl = mcfg.board_h, cfg.model.max_disp
shape = (4, cfg.train.crop_height + 2 * bh, cfg.train.crop_width + bwl)
iml = rng.integers(0, 256, shape, dtype=np.uint8)
imr = rng.integers(0, 256, shape, dtype=np.uint8)
disp = np.full((4, cfg.train.crop_height, cfg.train.crop_width), 8.0, np.float32)
lr = jnp.asarray(1e-3, jnp.float32)

tr0 = Trainer(cfg)
s0 = tr0.init_state(tr0.feats_shape_for(4), seed=0)
fn0 = tr0.step_fn(4, 32, 0)
s0b, m0, d0 = fn0(s0, jnp.asarray(iml), jnp.asarray(imr), jnp.asarray(disp), lr)
l0 = jax.tree_util.tree_leaves_with_path(s0b.batch_stats)

for mshape in [(2, 1, 1), (1, 2, 1), (1, 1, 2), (1, 2, 2), (2, 2, 1),
               (2, 1, 2), (2, 2, 2)]:
    n = int(np.prod(mshape))
    mesh = pm.make_mesh(shape=mshape, devices=jax.devices()[:n])
    tr1 = Trainer(cfg, mesh=mesh)
    with mesh:
        s1 = tr1.init_state(tr1.feats_shape_for(4), seed=0)
        fn1 = tr1.step_fn(4, 32, 0)
        s1b, m1, d1 = fn1(s1, jnp.asarray(iml), jnp.asarray(imr),
                          jnp.asarray(disp), lr)
    l1 = jax.tree_util.tree_leaves_with_path(s1b.batch_stats)
    bad = []
    for (k0, a), (k1, b) in zip(l0, l1):
        a, b = np.asarray(a), np.asarray(b)
        md = np.max(np.abs(a - b))
        if md > 1e-4:
            bad.append((jax.tree_util.keystr(k0), float(md),
                        float(np.median(np.where(b != 0, a / np.where(b == 0, 1, b), 1)))))
    print(mshape, "disp maxdiff %.4f" % float(jnp.max(jnp.abs(d0 - d1))),
          "BAD:" if bad else "OK")
    for row in bad:
        print("   ", row)
