"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed CPU job. Exercises the same initialize_distributed +
create_mesh path train.main uses across hosts, then runs a cross-process
collective and a sharded matmul to prove the DCN wiring works.

Invoked as: python tests/distributed_worker.py <process_id>
(env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID set by
the test).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from transformer_latent_diffusion_tpu.parallel import (  # noqa: E402
    create_mesh,
    initialize_distributed,
)


def main():
    initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    n = len(jax.devices())
    assert n == 4, jax.devices()  # 2 procs x 2 local devices

    mesh = create_mesh((n, 1))

    # cross-process collective: per-device ones, global psum
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    @jax.jit
    def global_sum():
        def f():
            return jax.lax.psum(jnp.ones(()), "data")

        return shard_map(f, mesh=mesh, in_specs=(), out_specs=P())()

    total = float(global_sum())
    assert total == float(n), total

    # sharded compute: batch split over all 4 devices across processes
    local = np.full((2, 8), 1.0 + jax.process_index(), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local, (4, 8))

    @jax.jit
    def mean_all(x):
        return jnp.mean(x)

    m = float(mean_all(arr))
    assert abs(m - 1.5) < 1e-6, m  # procs contribute 1.0 and 2.0 halves

    print(f"proc {jax.process_index()} OK (global devices={n}, "
          f"psum={total}, mean={m})", flush=True)


if __name__ == "__main__":
    main()
