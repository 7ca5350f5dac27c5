"""Device mesh + sharding rules: the TPU-native replacement for the
reference's Accelerate/DDP distributed layer (train.py:69,109,141,162,169).

The reference's entire distributed story is data parallelism over NCCL.
Here: a `jax.sharding.Mesh` over ('data', 'model'); the batch shards over
'data' (pure DP parity with the reference) and, beyond reference
capability, Megatron-style tensor parallelism over 'model' for the wide
matmuls (QKV / MLP expand column-sharded, out-proj / contract row-sharded)
with XLA inserting the all-reduces over ICI.

Multi-host: `initialize_distributed()` wraps `jax.distributed.initialize`
(DCN), replacing the reference's process-spawn launcher.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed() -> None:
    """Initialize JAX multi-host (idempotent; no-op for single process).

    Replaces Accelerate's process-group setup. Controlled by the standard
    JAX coordinator env vars; safe to call unconditionally.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    # NB: must not touch jax.devices()/process_count() before
    # jax.distributed.initialize — any backend-initializing call first
    # makes initialize() raise (true on CPU tests and on TPU pods alike)
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )


def create_mesh(mesh_shape: Optional[Tuple[int, int]] = None,
                devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    dp, tp = mesh_shape
    assert dp * tp == n, f"mesh {mesh_shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


# Name-based tensor-parallel rules: (path-substring, PartitionSpec for kernel)
_COLUMN_SHARDED = ("qkv_linear", "kv_linear", "expand", "mlp_c_fc", "to_q",
                   "to_k", "to_v")
_ROW_SHARDED = ("contract", "attn_out_proj", "mlp_c_proj", "to_out")


def _spec_for(path_str: str, ndim: int) -> P:
    # expert parallelism: MoE stacked expert weights (models/moe.py) carry
    # a leading (n_experts, ...) axis sharded over 'model'; the dispatched
    # activations are constrained onto the same axis inside MoEMLP and
    # GSPMD inserts the all-to-alls.
    if path_str.endswith(("/wi", "/wo", "/bi", "/bo")) and "/mlp/" in path_str:
        return P(MODEL_AXIS, *([None] * (ndim - 1)))
    if ndim < 2:
        return P()
    if any(f"/{n}/" in path_str or path_str.endswith(f"/{n}/kernel")
           for n in _COLUMN_SHARDED) and path_str.endswith("kernel"):
        return P(*([None] * (ndim - 1)), MODEL_AXIS)
    if any(f"/{n}/" in path_str or path_str.endswith(f"/{n}/kernel")
           for n in _ROW_SHARDED) and path_str.endswith("kernel"):
        return P(MODEL_AXIS, *([None] * (ndim - 1)))
    return P()


def param_shardings(params, mesh: Mesh, *, fsdp: bool = False,
                    tp: bool = True):
    """NamedShardings for a param tree: TP rules over 'model', else replicated.

    tp=False skips the Megatron rules even on a model-axis>1 mesh — used
    by pipeline parallelism, where the 'model' axis carries pipeline
    stages instead of sharded matmuls.

    fsdp=True additionally shards each leaf's largest still-free axis
    over 'data' (ZeRO-3 style fully-sharded parameters — no reference
    equivalent; the reference's Accelerate/DDP replicates, train.py:109).
    Optimizer moments and EMA placed with the same shardings give
    ZeRO-1/2 for free; GSPMD inserts the all-gathers (params, forward)
    and reduce-scatters (grads) over ICI. Axes that don't divide the
    mesh stay replicated.
    """

    def one(path, leaf):
        path_str = "/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        tp_size = mesh.shape[MODEL_AXIS] if tp else 1
        spec = (list(P()) if tp_size == 1
                else list(_spec_for(path_str, leaf.ndim)))
        spec += [None] * (leaf.ndim - len(spec))
        # only keep the TP spec if the dimension divides evenly
        if not all(s is None or leaf.shape[i] % tp_size == 0
                   for i, s in enumerate(spec)):
            spec = [None] * leaf.ndim
        dp = mesh.shape[DATA_AXIS]
        if fsdp and dp > 1 and leaf.ndim >= 1:
            # largest free axis that divides the data-axis size
            free = [i for i, s in enumerate(spec)
                    if s is None and leaf.shape[i] % dp == 0
                    and leaf.shape[i] >= dp]
            if free:
                best = max(free, key=lambda i: leaf.shape[i])
                spec[best] = DATA_AXIS
        if all(s is None for s in spec):  # P(None, None) != P() as tuples
            spec = []
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh):
    """Batch arrays shard over the 'data' axis (leading dim)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
