"""Checkpointing: orbax for full train state + simple npz for param trees.

Parity with the reference checkpoint semantics (train.py:149-158 and
92-100): the saved state is {model_ema, opt_state, global_step}; resume
loads the EMA weights into the training model. Inference loads a raw param
file (diffusion.py:148-153).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def flatten_tree(tree, sep: str = "/") -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = sep.join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        out[name] = np.asarray(leaf)
    return out


def unflatten_dict(flat: Dict[str, np.ndarray], sep: str = "/"):
    tree: Dict[str, Any] = {}
    for name, arr in flat.items():
        node = tree
        parts = name.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_npz(path: str, tree) -> None:
    np.savez(path, **flatten_tree(tree))


def unflatten_npz(path: str):
    with np.load(path) as data:
        return unflatten_dict({k: data[k] for k in data.files})


class CheckpointManager:
    """Orbax-backed {ema_params, opt_state, params, global_step} checkpoints."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
        )

    def save(self, step: int, state: Dict[str, Any],
             async_: bool = False) -> None:
        """Save a checkpoint. async_=True returns after initiating the
        save (orbax fetches device arrays in the background — on the
        tunneled runtime a blocking device->host fetch of the ~1.6GB
        train state costs tens of seconds). The CALLER must pass
        non-donated arrays (e.g. an on-device jnp.copy of the state)
        and call wait() before relying on the files."""
        if step in set(self.manager.all_steps()):
            # overwrite semantics, like the reference's torch.save to a
            # fixed filename (train.py:149-158): re-running a
            # from_scratch training into the same model_name must
            # replace the stale step, not crash — this orbax version's
            # save() raises StepAlreadyExistsError regardless of force
            self.manager.wait_until_finished()
            self.manager.delete(step)
        self.manager.save(
            step, args=self._ocp.args.StandardSave(state), force=True
        )
        if not async_:
            self.manager.wait_until_finished()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()


def average_params(trees, weights=None):
    """Uniform (or weighted) average of param trees — "model soup"
    (Wortsmann et al. 2022) / late-checkpoint averaging. All trees must
    share one structure; floating leaves average in f32 and are cast
    back to the first tree's leaf dtype, non-floating leaves (step
    counters etc.) are taken from the FIRST tree unchanged."""
    trees = list(trees)
    if not trees:
        raise ValueError("average_params needs at least one tree")
    if weights is None:
        weights = [1.0 / len(trees)] * len(trees)
    weights = [float(w) for w in weights]
    if len(weights) != len(trees):
        raise ValueError(f"{len(weights)} weights for {len(trees)} trees")
    total = sum(weights)
    if not total > 0:
        raise ValueError(f"weights must sum to > 0, got {total}")
    weights = [w / total for w in weights]

    def _avg(*leaves):
        first = leaves[0]
        if not jax.numpy.issubdtype(np.asarray(first).dtype, np.floating):
            return first
        acc = sum(w * np.asarray(leaf, np.float32)
                  for w, leaf in zip(weights, leaves))
        return acc.astype(np.asarray(first).dtype)

    return jax.tree.map(_avg, *trees)


def average_checkpoints(run_dir: str, last_k: int = 3,
                        key: str = "ema_params"):
    """Average the `key` trees of the last_k orbax checkpoints under
    run_dir (a train.main run directory). Returns (tree, steps_used).
    Checkpoint averaging is the classic free final-quality bump on top
    of EMA — the soup of the last few saves evaluates better than the
    last save alone on noisy objectives."""
    import orbax.checkpoint as ocp  # noqa: F401  (import check)

    mgr = CheckpointManager(run_dir)
    steps = sorted(mgr.manager.all_steps())[-last_k:]
    if not steps:
        raise ValueError(f"no checkpoints under {run_dir}")
    trees = [mgr.restore(step=s)[key] for s in steps]
    return average_params(trees), steps
