"""Worker process for the real multi-process distributed test.

Launched by tests/test_distributed.py as 2 OS processes on the CPU backend:
each process owns ONE local CPU device, `jax.distributed.initialize` joins
them into a 2-device global mesh (data=2), each host loads ITS OWN
TrainPipeline shard (num_hosts=2, host_id=pid), and both run lockstep jitted
train steps whose gradient psum / BN cross-replica stats ride the
collective backend for real (SURVEY.md §5.8 — the path a virtual
single-process mesh cannot exercise).

Also runs in a single-process control mode (pid == -1): 2 virtual local
devices, same mesh shape, batches assembled from both host shards — the
ground truth the distributed metrics must match bit-for-bit.

Mesh shapes (6th arg, default "2,1,1"):
  * "2,1,1" — data parallel: per-host input shards, gradient psum + BN
    cross-replica stats across the process boundary
  * "1,2,1" — spatial (H) sharding: GSPMD halo exchanges for every 3-D conv
    cross the process boundary
  * "1,1,2" — disparity sharding: the softmax/soft-argmin reductions cross
    the process boundary

Usage: python -m tests.distributed_worker <coordinator> <nproc> <pid>
           <data_root> <list_path> [mesh_shape]
"""
import json
import os
import sys


def main():
    coordinator, nproc, pid, data_root, lst = sys.argv[1:6]
    mesh_shape = tuple(int(v) for v in
                       (sys.argv[6] if len(sys.argv) > 6 else "2,1,1").split(","))
    nproc, pid = int(nproc), int(pid)
    single_process_control = pid < 0

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count="
        + ("2" if single_process_control else "1"))
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.data.pipeline import TrainPipeline
    from msnets_tpu.engine import Trainer
    from msnets_tpu.parallel import mesh as pm

    if single_process_control:
        nh, hid = 1, 0
    else:
        nh, hid = pm.init_distributed(coordinator, nproc, pid)
        assert (nh, hid) == (nproc, pid), (nh, hid)
        assert len(jax.devices()) == nproc
        assert len(jax.local_devices()) == 1

    mesh = pm.make_mesh(shape=mesh_shape, devices=jax.devices())
    data_hosts = mesh_shape[0]                   # data-axis process count

    mcfg = MatchingConfig(board_h=4)
    cfg = Config(
        matching=mcfg,
        model=ModelConfig(name="MS-GCNet", max_disp=32, base_filters=4,
                          compute_dtype="float32"),
        train=TrainConfig(crop_height=64, crop_width=128, batch_size=2,
                          remat=False),
        data=DataConfig(data_path=data_root, training_list=lst),
    )

    def host_pipe(host_id):
        return TrainPipeline(cfg.data, mcfg, cfg.train.crop_height,
                             cfg.train.crop_width, cfg.model.max_disp,
                             batch_size=2 // data_hosts, seed=7,
                             num_threads=1, num_hosts=data_hosts,
                             host_id=host_id)

    trainer = Trainer(cfg, mesh=mesh)
    rep = pm.shard(mesh, pm.REPLICATED)

    def globalize(local_np, spec):
        s = pm.shard(mesh, spec)
        a = np.asarray(local_np)
        if data_hosts == 2 and not single_process_control:
            # DP: each process holds only ITS batch half -> local-data path
            return jax.make_array_from_process_local_data(s, a)
        # spatial/disp sharding (or the control): every process has the
        # full global batch; the callback serves each addressable shard
        return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

    with mesh:
        state = trainer.init_state(trainer.feats_shape_for(2), seed=0)
        state = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)), state)
        lr = jax.make_array_from_process_local_data(
            rep, np.asarray(1e-3, np.float32))

        if single_process_control and data_hosts == 2:
            # assemble the global batch from BOTH host shards, in host order
            pipes = [host_pipe(0), host_pipe(1)]
            streams = [p.epoch(1) for p in pipes]
            batches = []
            for _ in range(2):
                locals_ = [next(s) for s in streams]
                batches.append({
                    k: np.concatenate([b[k] for b in locals_])
                    if isinstance(locals_[0][k], np.ndarray) else locals_[0][k]
                    for k in locals_[0]})
        else:
            # DP workers: own shard; spatial/disp modes: every process
            # streams the IDENTICAL full batch (data axis unsharded)
            batches = []
            stream = host_pipe(hid if data_hosts == 2 else 0).epoch(1)
            for _ in range(2):
                batches.append(next(stream))

        results = []
        for batch in batches:
            fn = trainer.step_fn(batch["board_h"], batch["board_w_left"],
                                 batch["board_w_right"])
            state, metrics, _ = fn(state,
                                   globalize(batch["iml"], pm.IMAGES),
                                   globalize(batch["imr"], pm.IMAGES),
                                   globalize(batch["disp"], pm.TARGET),
                                   lr)
            results.append({k: float(v) for k, v in metrics.items()})

        # a replicated param leaf is fetchable on every process; its value
        # reflects the cross-process gradient psum
        leaf = float(np.asarray(
            jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])

    print("RESULT " + json.dumps(
        {"host": hid, "metrics": results, "step": int(state.step),
         "param0": leaf}), flush=True)


if __name__ == "__main__":
    main()
