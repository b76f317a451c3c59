"""Device mesh and sharding layout for SPMD execution.

The scaling axes for a 4-D cost volume workload (SURVEY.md §2.3/§5.7):

  data    - batch; gradient all-reduce (psum) over ICI          [DP]
  spatial - the H axis of images/volumes; XLA inserts halo
            exchanges for the spatially-partitioned 3-D convs   [SP analogue]
  disp    - the disparity axis; softmax + soft-argmin over D
            become cross-chip reductions                        [TP analogue]

Everything is expressed as PartitionSpecs on the train/eval step's inputs and
jit sharding constraints; XLA GSPMD propagates them through the conv stack
and materializes the halo exchanges and reductions as ICI collectives — no
hand-written transport (the reference has none either: its only parallelism
is single-process DataParallel, main_msnet.py:173-174).

Pipeline parallelism is deliberately absent: the largest model is ~2.8 M
params (SURVEY.md §2.3 row PP), thousands of times smaller than one chip's
HBM; a stage split would only add bubbles.
"""
from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "spatial", "disp")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Multi-host initialization (SURVEY.md §5.8).

    Single-process (the default, and everything the reference supports —
    its only parallelism is single-process DataParallel) is a no-op. On a
    real pod slice call with the coordinator's address, or with no args on
    Cloud TPU where jax.distributed auto-detects from the metadata server.
    Returns (num_hosts, host_id) for the input-pipeline shard
    (TrainPipeline(num_hosts=..., host_id=...)).
    """
    if coordinator_address or (num_processes or 0) > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count(), jax.process_index()


def factorize_devices(n: int) -> Tuple[int, int, int]:
    """Split n devices over (data, spatial, disp), preferring data first.

    8 -> (2, 2, 2); 4 -> (2, 2, 1); 2 -> (2, 1, 1); 1 -> (1, 1, 1);
    non-power-of-two remainders go to data.
    """
    dims = [1, 1, 1]
    i = 0
    while n % 2 == 0 and n > 1:
        dims[i % 3] *= 2
        n //= 2
        i += 1
    dims[0] *= n  # odd remainder -> data
    return tuple(dims)


def make_mesh(shape: Optional[Tuple[int, int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = factorize_devices(len(devices))
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)


# PartitionSpecs for the pipeline's arrays ---------------------------------

# uint8 image batches [N, H, W]: batch over data, rows over spatial.
IMAGES = P("data", "spatial", None)
# GT disparity [N, H, W]
TARGET = P("data", "spatial", None)
# feature / cost volumes [N, D, H, W, C]: D over disp, H over spatial.
VOLUME = P("data", "disp", "spatial", None, None)
# model outputs [N, H, W]
DISPARITY = P("data", "spatial", None)
# parameters and optimizer state: replicated.
REPLICATED = P()


def shard(mesh: Mesh, spec: P):
    return NamedSharding(mesh, spec)


def replicate(x):
    """Pin a tensor fully replicated on the active mesh (no-op otherwise).

    Workaround for a GSPMD partitioner miscompilation observed on the CPU
    backend: a conv whose RHS kernel is a *computed* value (e.g. the eval
    BN fold ``kernel * scale``) and whose LHS volume is sharded on two conv
    dims at once (disp + spatial) produces wrong values across the whole
    output — not just at halo boundaries (kernels passed straight from jit
    arguments are unaffected, single-axis sharding is unaffected; see
    tests/test_serve.py::test_serve_sharded_mesh_matches_unsharded which
    caught it). Explicitly annotating the computed kernel as replicated
    restores bit-level agreement with the unsharded graph. Cheap: kernels
    are KB-sized and replicated anyway.

    Re-checked 2026-08-20 on jax 0.9.0 (rounds 3 and 4): still required.
    A standalone ~50-line repro lives in
    ``scripts/repro_gspmd_kernel_bug.py`` (4 chained stride-2 convs with
    computed kernels + shrinking constrain_volume-style re-annotations;
    rel maxdiff 1.0 unpinned vs 3e-7 pinned) — run it on every toolchain
    bump; it prints PASS(bug fixed) when the pin can be retired. The
    in-tree check is tests/test_serve.py::test_serve_sharded_mesh_matches_
    unsharded with ``pm.replicate`` stubbed to identity.
    """
    mesh = _ACTIVE_MESH[-1] if _ACTIVE_MESH else None
    if mesh is None or not hasattr(x, "ndim"):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*([None] * x.ndim))))


# Trace-time active mesh for intra-model sharding re-annotation -----------

_ACTIVE_MESH = []


def current_mesh():
    """The mesh made visible by the innermost active_mesh(), or None."""
    return _ACTIVE_MESH[-1] if _ACTIVE_MESH else None


@contextlib.contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Make `mesh` visible to constrain_volume() during jit tracing.

    The model layers call constrain_volume() between stages; outside this
    context (or with mesh=None) those calls are no-ops, so single-device
    paths are untouched.
    """
    _ACTIVE_MESH.append(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.pop()


def constrain_volume(x):
    """Re-annotate a [N, D, H, W, C] volume's sharding for the active mesh.

    A mesh axis is used only while the corresponding dim still shards
    sanely: divisible by the axis size and >= 2 elements per shard for the
    conv dims D/H (kernel-3 convs need a halo of 1; a shard smaller than
    its halo makes GSPMD's halo exchange degenerate — observed to
    *miscompute* BatchNorm means by the product of the other mesh axes on
    the deepest encoder volumes, and it is a bandwidth loss on real ICI
    anyway). Deep small volumes therefore fall back to fewer sharded axes,
    which XLA implements as an all-gather at the re-annotation point.
    """
    mesh = _ACTIVE_MESH[-1] if _ACTIVE_MESH else None
    if mesh is None or getattr(x, "ndim", 0) != 5:
        return x
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def use(dim: int, ax: str, min_shard: int) -> Optional[str]:
        s = sizes.get(ax, 1)
        ok = s > 1 and dim % s == 0 and dim // s >= min_shard
        return ax if ok else None

    spec = P(use(x.shape[0], "data", 1), use(x.shape[1], "disp", 2),
             use(x.shape[2], "spatial", 2), None, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device_put a host batch with the canonical shardings."""
    out = dict(batch)
    for k in ("iml", "imr"):
        out[k] = jax.device_put(batch[k], shard(mesh, IMAGES))
    out["disp"] = jax.device_put(batch["disp"], shard(mesh, TARGET))
    return out
