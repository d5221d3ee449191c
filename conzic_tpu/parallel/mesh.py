"""Device mesh + sharding for caption-batch scale-out.

The reference is strictly single-device (``/root/reference/demo.py:20-21``;
no distributed backend anywhere — SURVEY.md §2.3). Captioning is
embarrassingly parallel over (images x samples), so the TPU-native design
shards exactly that batch axis over a 1-D ``data`` mesh; model params and
vocab tables are replicated; no collectives are needed inside the Gibbs
program except the implicit all-gathers XLA inserts for logging outputs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            # a silent truncation would run on fewer chips than asked
            # (--mesh_data_axis 4 on a 1-chip platform) and the user
            # would misread every throughput number
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(data: int, model: int, devices=None) -> Mesh:
    """(data, model) mesh. The model axis shards the vocab dimension of the
    BERT word embedding / MLM projection — optional tensor-parallel headroom
    (both models fit per chip, SURVEY.md §2.3, so this is not required for
    capacity; it demonstrates and tests the TP path)."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < data * model:
        raise ValueError(
            f"requested a {data}x{model} mesh but only "
            f"{len(devices)} device(s) are visible"
        )
    devices = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def param_sharding_rules(mesh: Mesh, params):
    """NamedSharding tree for the param pytree: vocab-dim tensors sharded
    over the model axis when present, everything else replicated."""
    has_model = MODEL_AXIS in mesh.axis_names

    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)

    def rule(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if (
            has_model
            and leaf.shape
            and leaf.shape[0] % model_size == 0
            and (
                name.endswith("embeddings/word/embedding")
                or name.endswith("mlm/bias")
            )
        ):
            spec = P(MODEL_AXIS) if leaf.ndim == 1 else P(MODEL_AXIS, None)
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    import jax as _jax

    return _jax.tree_util.tree_map_with_path(rule, params)


def _put(tree, shardings):
    """device_put, or the cross-process global-array assembly when this
    is one process of a multi-host run (host data identical per process
    — parallel.distributed.put_global's contract)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    from conzic_tpu.parallel.distributed import put_global

    if isinstance(shardings, NamedSharding):
        return jax.tree_util.tree_map(
            lambda leaf: put_global(leaf, shardings), tree)
    return jax.tree_util.tree_map(put_global, tree, shardings)


def shard_params(mesh: Optional[Mesh], params):
    if mesh is None:
        return params
    return _put(params, param_sharding_rules(mesh, params))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First axis sharded over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], tree):
    """Shard every array's leading axis over the mesh (no-op without mesh)."""
    if mesh is None:
        return tree
    return _put(tree, batch_sharding(mesh))


def replicate(mesh: Optional[Mesh], tree):
    if mesh is None:
        return tree
    return _put(tree, replicated(mesh))


def data_axis_pad(mesh: Optional[Mesh], batch: int) -> int:
    """Rows to append so ``batch`` divides the mesh's data-axis size
    (0 off-mesh or when already divisible) — the one place the
    axis-name -> size lookup lives."""
    if mesh is None:
        return 0
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DATA_AXIS, 1)
    return (-batch) % n


def pad_batch_to_mesh(arrays: Sequence[np.ndarray], mesh: Optional[Mesh]):
    """Pad a host batch so its leading dim divides the mesh size; returns
    (padded arrays, original size)."""
    if mesh is None:
        return list(arrays), arrays[0].shape[0]
    B = arrays[0].shape[0]
    pad = data_axis_pad(mesh, B)
    if pad == 0:
        return list(arrays), B
    out = []
    for a in arrays:
        pad_block = np.repeat(a[-1:], pad, axis=0)
        out.append(np.concatenate([a, pad_block], axis=0))
    return out, B
