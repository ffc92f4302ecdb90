"""Device mesh + sharding rules (the TPU-native equivalent of the reference's
NCCL/DDP data parallelism, reference train.py:28-97 and SURVEY.md §2.3).

The reference launches one process per GPU and relies on DDP's implicit
all-reduce.  Here the whole training step is a single SPMD program compiled by
XLA over a ``jax.sharding.Mesh`` with two logical axes:

* ``dp`` — data parallel: the batch is sharded, gradients are combined by the
  ``psum`` XLA inserts for the replicated-parameter sharding.
* ``tp`` — tensor parallel: attention QKV/out projections and MLP hidden
  layers of the backbone transformer are sharded column/row-wise so
  activations ride ICI ``all_reduce``s inside the layer.

Collectives are never written by hand: parameters and batches carry
``NamedSharding``s and XLA inserts the ICI collectives (GSPMD).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = 'dp'
TP_AXIS = 'tp'


def parse_mesh_shape(spec: Optional[str], n_devices: int) -> Dict[str, int]:
    """Parse ``"dp=4,tp=2"`` into an axis dict; default is all-DP."""
    if not spec:
        return {DP_AXIS: n_devices, TP_AXIS: 1}
    axes: Dict[str, int] = {}
    for part in spec.split(','):
        name, _, val = part.partition('=')
        axes[name.strip()] = int(val)
    axes.setdefault(DP_AXIS, 1)
    axes.setdefault(TP_AXIS, 1)
    total = int(np.prod(list(axes.values())))
    if total != n_devices:
        raise ValueError(
            f'mesh shape {axes} needs {total} devices, have {n_devices}')
    return axes


def make_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    """Create a ``(dp, tp)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    axes = parse_mesh_shape(spec, len(devices))
    dev_array = np.asarray(devices).reshape(axes[DP_AXIS], axes[TP_AXIS])
    return Mesh(dev_array, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

# Rules map a regex over the '/'-joined param path to a PartitionSpec.
# The backbone transformer params (mmvid_tpu.models.clip) are laid out as:
#   .../blocks_<i>/attn/{qkv,out}/kernel      (D, 3D) / (D, D)
#   .../blocks_<i>/mlp/{fc,proj}/kernel       (D, 4D) / (4D, D)
# Column-parallel on the fan-out matrices, row-parallel on the fan-in ones:
# a Megatron-style split that keeps one all-reduce per block, over ICI.
_TP_RULES = [
    (re.compile(r'.*/attn/qkv/kernel$'), P(None, TP_AXIS)),
    (re.compile(r'.*/attn/(query|key|value)/kernel$'), P(None, TP_AXIS)),
    (re.compile(r'.*/attn/out/kernel$'), P(TP_AXIS, None)),
    (re.compile(r'.*/mlp/fc/kernel$'), P(None, TP_AXIS)),
    (re.compile(r'.*/mlp/proj/kernel$'), P(TP_AXIS, None)),
]


def _spec_for_path(path: str, use_tp: bool) -> P:
    if use_tp:
        for rx, spec in _TP_RULES:
            if rx.match(path):
                return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Build a NamedSharding pytree matching ``params``.

    Weights matched by the TP rules are sharded over the ``tp`` axis (when the
    mesh has one of size > 1); all other params are replicated.  XLA then
    inserts the dp-axis gradient all-reduce automatically because replicated
    params consume dp-sharded activations.
    """
    use_tp = mesh.shape.get(TP_AXIS, 1) > 1

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for keypath, leaf in flat:
        path = '/'.join(_key_str(k) for k in keypath)
        spec = _spec_for_path(path, use_tp)
        # Guard: only shard if the dim is divisible.
        if use_tp and spec != P():
            tp = mesh.shape[TP_AXIS]
            ok = all(
                s is None or leaf.shape[i] % tp == 0
                for i, s in enumerate(spec))
            if not ok:
                spec = P()
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def _key_str(k) -> str:
    # DictKey('x') -> 'x', SequenceKey(3) -> '3', GetAttrKey('x') -> 'x'
    for attr in ('key', 'idx', 'name'):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a host param pytree onto the mesh per ``param_shardings``."""
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree onto the mesh, batch-dim over dp."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
