"""Multi-process launcher: the reference's `notebook_launcher` equivalent.

The reference launches data-parallel training with HuggingFace
Accelerate's `notebook_launcher(main, model_cfg, num_processes=2)`
(reference README.md:109, train.py:179-180), which forks N processes
that each re-enter `train.main` under torch.distributed/DDP.

TPU-native equivalent: `launch(fn, *args, num_processes=N)` spawns N
fresh interpreters, wires them into one `jax.distributed` job through a
grpc coordinator on localhost (the same env-var contract
`initialize_distributed()` consumes — parallel/mesh.py), and runs
`fn(*args, **kwargs)` in each. On a real TPU pod slice each host runs
its own process and the TPU runtime supplies the device topology; this
launcher covers the single-host/multi-process and CPU-test cases where
the user would have reached for `notebook_launcher`.

Because each child is a fresh interpreter (jax.distributed cannot be
re-initialized in-process), `fn` must be importable — a module-level
function like `train.main`, not a lambda or a notebook-cell closure.
Arguments round-trip via pickle (dataclass configs are fine).
"""

from __future__ import annotations

import os
import pickle
import socket
import subprocess
import sys
import tempfile
from typing import Any, List, Optional

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_launch_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(
    fn,
    *args: Any,
    num_processes: int = 2,
    devices_per_process: Optional[int] = None,
    platform: Optional[str] = None,
    timeout: Optional[float] = None,
    **kwargs: Any,
) -> List[Any]:
    """Run `fn(*args, **kwargs)` in `num_processes` jax.distributed
    processes; returns each process's (picklable) return value, rank 0
    first.

    devices_per_process: force that many virtual CPU devices per process
      (sets --xla_force_host_platform_device_count in the children; used
      with platform="cpu" for tests/laptops).
    platform: override JAX_PLATFORMS in the children (e.g. "cpu").
    """
    if num_processes == 1:
        return [fn(*args, **kwargs)]
    name = getattr(fn, "__name__", None)
    module = getattr(fn, "__module__", None)
    if (name is None or name == "<lambda>" or module in (None, "__main__")
            or "<locals>" in getattr(fn, "__qualname__", "")):
        # __main__ is the script the user ran; the children import the
        # worker as their __main__, so the function cannot be found there
        raise ValueError(
            "launch() spawns fresh interpreters: fn must be an importable "
            "module-level function (not a lambda, closure, partial, or a "
            f"function defined in __main__), got {fn!r}")

    port = _free_port()
    with tempfile.TemporaryDirectory(prefix="tld_launch_") as tmp:
        payload_path = os.path.join(tmp, "payload.pkl")
        with open(payload_path, "wb") as f:
            pickle.dump(
                {
                    "module": fn.__module__,
                    "qualname": fn.__qualname__,
                    "args": args,
                    "kwargs": kwargs,
                },
                f,
            )

        procs = []
        try:
            for pid in range(num_processes):
                env = dict(
                    os.environ,
                    JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                    JAX_NUM_PROCESSES=str(num_processes),
                    JAX_PROCESS_ID=str(pid),
                )
                # platform plumbing rides env vars so the worker can apply
                # it before anything imports jax (see _launch_worker.py)
                if devices_per_process:
                    env["TLD_LAUNCH_DEVICES"] = str(devices_per_process)
                if platform:
                    env["TLD_LAUNCH_PLATFORM"] = platform
                result_path = os.path.join(tmp, f"result_{pid}.pkl")
                procs.append((result_path, subprocess.Popen(
                    [sys.executable, _WORKER, payload_path, result_path],
                    env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True)))

            # Failure detection: poll ALL ranks. If any rank dies (crash
            # before/inside a collective), the survivors block forever in
            # the grpc barrier — terminate them and surface the failed
            # rank's output instead of hanging the parent.
            outs, first_failed = _wait_all(
                [p for _, p in procs], num_processes, timeout)
            results = []
            if first_failed is not None:
                p = procs[first_failed][1]
                raise RuntimeError(
                    f"launch(): process {first_failed}/{num_processes} "
                    f"exited {p.returncode} (survivors terminated):"
                    f"\n{outs[first_failed][-4000:]}")
            for pid, ((result_path, p), out) in enumerate(zip(procs, outs)):
                if p.returncode != 0:
                    raise RuntimeError(
                        f"launch(): process {pid}/{num_processes} exited "
                        f"{p.returncode}:\n{out[-4000:]}")
                with open(result_path, "rb") as f:
                    results.append(pickle.load(f))
            return results
        except BaseException:
            # a spawn failure partway through (ENOMEM, EMFILE, ...) or an
            # unpickling error must not orphan already-started ranks:
            # they would block on the grpc coordinator waiting for a
            # world that will never assemble
            for _, p in procs:
                if p.poll() is None:
                    p.terminate()
            raise


def _wait_all(procs, num_processes: int, timeout: Optional[float]):
    """Wait for every worker; on the first failure (or timeout) terminate
    the survivors so a dead rank can't wedge the whole job. Returns
    (stdout per rank, index of the first genuinely-failed rank or None)."""
    import threading
    import time as _time

    outs: List[Optional[str]] = [None] * len(procs)

    def drain(i, p):  # communicate() per proc, off-thread so we can poll
        outs[i], _ = p.communicate()

    threads = [threading.Thread(target=drain, args=(i, p), daemon=True)
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    deadline = None if timeout is None else _time.monotonic() + timeout
    failed = None
    while True:
        alive = [p for p in procs if p.poll() is None]
        failed = next((i for i, p in enumerate(procs)
                       if p.poll() not in (None, 0)), None)
        timed_out = deadline is not None and _time.monotonic() > deadline
        if not alive or failed is not None or timed_out:
            break
        _time.sleep(0.2)
    if failed is not None or timed_out:
        for p in procs:
            if p.poll() is None:
                p.terminate()
    for t in threads:
        t.join(timeout=10)
    if failed is None and timed_out:
        raise TimeoutError(
            f"launch(): workers still running after {timeout}s; terminated. "
            f"rank outputs:\n" + "\n".join(
                f"--- rank {i} ---\n{(o or '')[-2000:]}"
                for i, o in enumerate(outs)))
    return [o if o is not None else "" for o in outs], failed
