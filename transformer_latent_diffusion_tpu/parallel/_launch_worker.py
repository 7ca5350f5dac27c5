"""Child bootstrap for parallel/launcher.py — runs one process of a
multi-process `launch()` job. Invoked as:

    python _launch_worker.py <payload.pkl> <result.pkl>

Env (set by the parent): JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
JAX_PROCESS_ID — consumed by `initialize_distributed()` inside the
target fn (train.main calls it first thing) — plus TLD_LAUNCH_DEVICES /
TLD_LAUNCH_PLATFORM, handled here BEFORE anything imports jax (the
payload may contain package dataclasses whose unpickle imports the
package)."""

import importlib
import os
import pickle
import sys


def main() -> None:
    payload_path, result_path = sys.argv[1], sys.argv[2]

    # platform plumbing first — before any import that drags jax in
    n_dev = os.environ.pop("TLD_LAUNCH_DEVICES", "")
    if n_dev:
        # replace (not append) any inherited device-count flag — e.g. the
        # test suite's 8-device conftest override in the parent env
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n_dev}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
    platform = os.environ.pop("TLD_LAUNCH_PLATFORM", "")
    if platform:
        os.environ["JAX_PLATFORMS"] = platform

    # make the package importable no matter the parent's cwd
    pkg_parent = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if pkg_parent not in sys.path:
        sys.path.insert(0, pkg_parent)

    if platform:
        import jax

        # the runtime image pre-imports jax on its own backend via
        # sitecustomize; env alone is not enough (CLAUDE.md)
        jax.config.update("jax_platforms", platform)

    with open(payload_path, "rb") as f:
        payload = pickle.load(f)

    mod = importlib.import_module(payload["module"])
    fn = mod
    for part in payload["qualname"].split("."):
        fn = getattr(fn, part)

    result = fn(*payload["args"], **payload["kwargs"])
    try:
        blob = pickle.dumps(result)
    except Exception:  # non-picklable return -> None, like a daemon exit
        blob = pickle.dumps(None)
    with open(result_path, "wb") as f:
        f.write(blob)


if __name__ == "__main__":
    main()
