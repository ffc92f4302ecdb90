"""Device mesh + sharding rules (the TPU-native equivalent of the reference's
NCCL/DDP data parallelism, reference train.py:28-97 and SURVEY.md §2.3).

The reference launches one process per GPU and relies on DDP's implicit
all-reduce.  Here the whole training step is a single SPMD program compiled by
XLA over a ``jax.sharding.Mesh`` with two logical axes:

* ``dp`` — data parallel: the batch is sharded, gradients are combined by the
  ``psum`` XLA inserts for the replicated-parameter sharding.
* ``pp`` — pipeline parallel (beyond parity): the backbone block stack is
  stage-partitioned over a leading stacked-layer axis and driven by the
  GPipe microbatch schedule in models/clip.py::TransformerStack._pipelined;
  the inter-stage hand-off lowers to collective-permute over ICI.
* ``tp`` — tensor parallel: attention QKV/out projections and MLP hidden
  layers of the backbone transformer are sharded column/row-wise so
  activations ride ICI ``all_reduce``s inside the layer.  With
  ``ClipStackConfig.seq_parallel`` the residual stream between blocks is
  additionally sequence-sharded over ``tp`` (Megatron-SP style).

Collectives are never written by hand: parameters and batches carry
``NamedSharding``s and XLA inserts the ICI collectives (GSPMD).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = 'dcn'
DP_AXIS = 'dp'
PP_AXIS = 'pp'
TP_AXIS = 'tp'
# axis order: dcn/dp outermost (the once-per-step gradient all-reduce
# tolerates the slowest links — DCN across slices), tp innermost (its
# per-layer all-reduces need the fastest ICI hops)
MESH_AXES = (DCN_AXIS, DP_AXIS, PP_AXIS, TP_AXIS)


def parse_mesh_shape(spec: Optional[str], n_devices: int) -> Dict[str, int]:
    """Parse ``"dp=4,tp=2"`` / ``"dcn=2,dp=2,pp=2,tp=2"`` into an axis
    dict; default is all-DP."""
    axes: Dict[str, int] = {}
    if spec:
        for part in spec.split(','):
            name, _, val = part.partition('=')
            name = name.strip()
            if name not in MESH_AXES:
                raise ValueError(
                    f'unknown mesh axis {name!r}; expected one of '
                    f'{MESH_AXES}')
            axes[name] = int(val)
    else:
        axes[DP_AXIS] = n_devices
    for name in MESH_AXES:
        axes.setdefault(name, 1)
    total = int(np.prod(list(axes.values())))
    if total != n_devices:
        raise ValueError(
            f'mesh shape {axes} needs {total} devices, have {n_devices}')
    return axes


def make_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    """Create a ``(dcn, dp, pp, tp)`` mesh over the available devices.

    ``dcn`` is extra data parallelism ACROSS pod slices: when the device set
    spans multiple slices (multi-slice TPU, ``device.slice_index`` varies),
    the mesh is laid out with ``jax.experimental.mesh_utils.
    create_hybrid_device_mesh`` so only the dcn axis crosses the
    data-center network and every other axis stays inside a slice's ICI.
    Single-slice (or CPU-simulated) device sets use a positional reshape —
    dcn then behaves as plain extra dp.
    """
    devices = devices if devices is not None else jax.devices()
    axes = parse_mesh_shape(spec, len(devices))
    shape = tuple(axes[a] for a in MESH_AXES)
    multi_slice = len({getattr(d, 'slice_index', 0) for d in devices}) > 1
    if axes[DCN_AXIS] > 1 and multi_slice:
        from jax.experimental import mesh_utils
        per_slice = (1,) + shape[1:]
        dcn_shape = (axes[DCN_AXIS],) + (1,) * (len(MESH_AXES) - 1)
        dev_array = mesh_utils.create_hybrid_device_mesh(
            per_slice, dcn_shape, devices=devices)
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over (dcn, dp), everything else replicated."""
    if DCN_AXIS in mesh.shape:
        return NamedSharding(mesh, P((DCN_AXIS, DP_AXIS)))
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

# Pipelined stack layout (ClipStackConfig.pipeline_stages > 1): ONE 'blocks'
# pytree param whose leaves carry a leading [layers] axis — sharded over pp,
# with the per-block TP split shifted one dim right.
_STACKED_RULES = [
    (re.compile(r'.*/blocks/attn/(qkv|query|key|value)/kernel$'),
     P(PP_AXIS, None, TP_AXIS)),
    (re.compile(r'.*/blocks/attn/out/kernel$'), P(PP_AXIS, TP_AXIS, None)),
    (re.compile(r'.*/blocks/mlp/fc/kernel$'), P(PP_AXIS, None, TP_AXIS)),
    (re.compile(r'.*/blocks/mlp/proj/kernel$'), P(PP_AXIS, TP_AXIS, None)),
    (re.compile(r'.*/blocks/.*'), P(PP_AXIS)),
]


def _spec_for_path(path: str, use_tp: bool, use_pp: bool) -> P:
    if use_pp and '/blocks/' in path:
        for rx, spec in _STACKED_RULES:
            if rx.match(path):
                if not use_tp:
                    spec = P(*(None if a == TP_AXIS else a for a in spec))
                return spec
        return P()
    if use_tp:
        for rx, spec in _TP_RULES:
            if rx.match(path):
                return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Build a NamedSharding pytree matching ``params``.

    Weights matched by the TP rules are sharded over the ``tp`` axis (when the
    mesh has one of size > 1), stacked pipeline blocks over ``pp``; all other
    params are replicated.  XLA then inserts the dp-axis gradient all-reduce
    automatically because replicated params consume dp-sharded activations.
    """
    use_tp = mesh.shape.get(TP_AXIS, 1) > 1
    use_pp = mesh.shape.get(PP_AXIS, 1) > 1

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for keypath, leaf in flat:
        path = '/'.join(_key_str(k) for k in keypath)
        spec = _spec_for_path(path, use_tp, use_pp)
        # Guard: only shard if every sharded dim is divisible.
        if spec != P():
            ok = all(
                s is None or leaf.shape[i] % mesh.shape[s] == 0
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
