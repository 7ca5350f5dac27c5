"""parallel.launch — the reference's notebook_launcher equivalent
(reference README.md:109: `notebook_launcher(main, model_cfg,
num_processes=2)`). Spawns real processes wired through jax.distributed
and returns each rank's value."""

import pytest

from transformer_latent_diffusion_tpu.parallel import launch


def _distributed_target(tag):
    # runs in a fresh interpreter (see parallel/_launch_worker.py)
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from transformer_latent_diffusion_tpu.parallel import (
        create_mesh,
        initialize_distributed,
    )

    initialize_distributed()
    mesh = create_mesh((len(jax.devices()), 1))
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    @jax.jit
    def global_sum():
        return shard_map(lambda: jax.lax.psum(jnp.ones(()), "data"),
                         mesh=mesh, in_specs=(), out_specs=P())()

    return {"rank": jax.process_index(),
            "world": jax.process_count(),
            "psum": float(global_sum()),
            "tag": tag}


def test_launch_two_processes():
    results = launch(_distributed_target, "hello",
                     num_processes=2, devices_per_process=1,
                     platform="cpu", timeout=540)
    assert [r["rank"] for r in results] == [0, 1]
    for r in results:
        assert r["world"] == 2
        assert r["psum"] == 2.0  # one device per process, summed globally
        assert r["tag"] == "hello"


def test_launch_single_process_runs_inline():
    calls = []

    def inline(x):
        calls.append(x)
        return x + 1

    assert launch(inline, 41, num_processes=1) == [42]
    assert calls == [41]


def test_launch_rejects_closures():
    with pytest.raises(ValueError):
        launch(lambda: None, num_processes=2)


def test_launch_rejects_unimportable_callables():
    """partial objects (no __name__) and __main__-defined functions can't
    be re-imported by the fresh child interpreters: clear error, not a
    per-rank AttributeError crash."""
    import functools

    with pytest.raises(ValueError, match="importable"):
        launch(functools.partial(_crash_on_rank_one), num_processes=2)

    def fake_main():  # simulate a function defined in a user's script
        pass

    fake_main.__module__ = "__main__"
    fake_main.__qualname__ = "fake_main"
    with pytest.raises(ValueError, match="importable"):
        launch(fake_main, num_processes=2)


def _crash_on_rank_one():
    import os

    if os.environ.get("JAX_PROCESS_ID") == "1":
        raise SystemExit(3)  # dies before ever joining the coordinator
    # rank 0 would block in jax.distributed.initialize waiting for rank 1;
    # the launcher's failure detection must terminate it promptly
    import jax

    from transformer_latent_diffusion_tpu.parallel import (
        initialize_distributed,
    )

    initialize_distributed()
    return jax.process_index()


def test_launch_dead_rank_does_not_hang():
    import time

    t0 = time.time()
    with pytest.raises(RuntimeError, match="process 1/2 exited 3"):
        launch(_crash_on_rank_one, num_processes=2, devices_per_process=1,
               platform="cpu", timeout=240)
    # well under jax.distributed's own multi-minute connect timeout:
    # the parent noticed the dead rank and tore down the survivor
    assert time.time() - t0 < 120
