"""Worker process for the 2-process multi-host CPU test (test_multihost.py).

Each process contributes 2 virtual CPU devices; jax.distributed stitches
them into one 4-device global mesh, and one dp_train_step runs with real
cross-process collectives (the only multi-host evidence obtainable in a
single-machine environment — SURVEY §2.6 / VERDICT r1 item 5).

Usage: python multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> int:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from gsplat_tpu.parallel import initialize_multihost, make_mesh
    from gsplat_tpu.parallel.data_parallel import dp_train_step
    from gsplat_tpu.train.state import init_state

    initialize_multihost(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    from test_train import _synthetic_gaussians, _statics, W, H

    rng = np.random.default_rng(0)  # identical scene on every process
    state = init_state(_synthetic_gaussians(rng, 32), n_cap=64)
    cm, st = _statics()

    b = jax.device_count()
    mesh = make_mesh()  # global mesh over both processes
    shd = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def global_sharded(host_np):
        return jax.make_array_from_callback(
            host_np.shape, shd, lambda idx: host_np[idx]
        )

    views = global_sharded(np.tile(cm.view, (b, 1, 1)).astype(np.float32))
    projs = global_sharded(np.tile(cm.proj, (b, 1, 1)).astype(np.float32))
    campos = global_sharded(np.tile(cm.campos, (b, 1)).astype(np.float32))
    gts = global_sharded(
        np.random.default_rng(1).uniform(0, 1, (b, H, W, 3)).astype(
            np.float32
        )
    )
    bgs = global_sharded(np.zeros((b,), np.float32))
    state = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            x.shape, rep, lambda idx: np.asarray(x)[idx]
        ),
        state,
    )

    step = jax.jit(
        lambda s, v, p, c, g, bg: dp_train_step(
            s, v, p, c, g, bg, jnp.int32(0), st, mesh
        )
    )
    new_state, metrics = step(state, views, projs, campos, gts, bgs)
    loss = float(metrics["loss"])  # replicated scalar: fetchable everywhere
    moved = float(
        jnp.max(jnp.abs(new_state.params["xyz"] - state.params["xyz"]))
    )
    assert np.isfinite(loss) and moved > 0.0
    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
