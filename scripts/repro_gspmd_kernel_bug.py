"""Self-contained repro of the GSPMD computed-kernel miscompilation.

The bug (first caught by tests/test_serve.py::test_serve_sharded_mesh_
matches_unsharded, worked around by pinning every computed conv kernel
replicated — msnets_tpu/parallel/mesh.py:replicate, layers.py:_conv):

A chain of stride-2 `conv_general_dilated` ops whose RHS kernels are
COMPUTED values (``kernel * scale`` — the shape of an eval-time BatchNorm
fold), with the LHS volume sharded on two conv dims (disp x spatial) and
re-annotated between stages as shrinking dims drop mesh axes (the
constrain_volume pattern), returns wrong values across the whole output —
relative maxdiff ~1.0 vs the single-device run. Deterministic, not fp
noise. A single conv is exact; the divergence needs the 4th stage, where
both the D and H dims have shrunk below 2 elements/shard and the
re-annotation has retired both mesh axes. Kernels passed straight through
as jit arguments are exact, and pinning the computed kernel to a fully
replicated sharding restores exactness — the shipped workaround.

Run on the CPU backend with 4 virtual devices (no TPU needed):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python scripts/repro_gspmd_kernel_bug.py

Exit 1 + "FAIL(bug present)" while the bug exists (jax<=0.9.0); exit 0 +
"PASS(bug fixed)" once a toolchain fixes it — then the pmesh.replicate pin
can be retired (re-run the serve sharded test to confirm). Re-probe with
exactly this script on every jax/XLA bump.
"""
import os, sys
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def conv_s2(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, k, (2, 2, 2), [(1, 1)] * 3,
                                        dimension_numbers=dn)


def main():
    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    if len(devs) < 4:
        print("need 4 devices (set --xla_force_host_platform_device_count=4)")
        return 2
    mesh = Mesh(np.asarray(devs[:4]).reshape(2, 2), ("disp", "spatial"))
    rep = NamedSharding(mesh, P(*[None] * 5))

    def spec(D, H):
        """constrain_volume's axis-retirement rule: a mesh axis is used only
        while the dim divides it with >= 2 elements per shard."""
        d = "disp" if D % 2 == 0 and D // 2 >= 2 else None
        s = "spatial" if H % 2 == 0 and H // 2 >= 2 else None
        return NamedSharding(mesh, P(None, d, s, None, None))

    rng = np.random.default_rng(0)
    C, n = 16, 4
    ks = [jnp.asarray(rng.normal(size=(3, 3, 3, C, C)).astype(np.float32))
          for _ in range(n)]
    sc = [jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
          for _ in range(n)]
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 64, C)).astype(np.float32))

    def net(x, ks, sc, sharded, pin):
        for k, s in zip(ks, sc):
            kk = k * s                       # computed kernel (BN-fold shape)
            if sharded and pin:
                kk = jax.lax.with_sharding_constraint(kk, rep)
            x = conv_s2(x, kk)
            if sharded:
                x = jax.lax.with_sharding_constraint(
                    x, spec(x.shape[1], x.shape[2]))
        return x

    ref = np.asarray(jax.jit(
        lambda x, ks, sc: net(x, ks, sc, False, False))(x, ks, sc))
    xs = jax.device_put(x, spec(x.shape[1], x.shape[2]))
    rels = {}
    for pin in (True, False):
        got = np.asarray(jax.jit(
            lambda x, ks, sc: net(x, ks, sc, True, pin))(xs, ks, sc))
        rels[pin] = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
        print(f"sharded {'with' if pin else 'WITHOUT'} replicate pin: "
              f"rel maxdiff vs single-device = {rels[pin]:.3e}")
    assert rels[True] < 1e-4, (
        f"pinned run diverged ({rels[True]:.3e}) — not the known bug; "
        "investigate before trusting this probe")
    if rels[False] >= 1e-4:
        print("FAIL(bug present): computed-kernel conv chain under 2-axis "
              "GSPMD sharding miscompiles; keep the pmesh.replicate pin")
        return 1
    print("PASS(bug fixed): unpinned run agrees — the replicate pin can be "
          "retired (re-run tests/test_serve.py sharded test to confirm)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
