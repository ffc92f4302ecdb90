"""SPMD training step: optimizer, LR schedules, grad clipping, and the
pjit-compiled MSM/REL/VID step.

Parity targets:
* loss combine ``beta_msm*MSM + beta_rel*REL + beta_vid*VID`` + grad-clip 1.0
  + Adam/AdamW(0.9, 0.95) (reference train.py:298-325,
  utils/utils_train.py:167-182)
* LR schedules warmuplr / warmupdecaylr / steplr / cosineannealinglr /
  reducelronplateau (utils/utils_train.py:314-388; the DeepSpeed WarmupLR
  default warms up over 5000 steps then holds)

TPU-native design: the reference runs one process per GPU with DDP allreduce
(train.py:28-97).  Here the step is ONE jitted SPMD program over the
(dcn, dp, pp, tp) mesh — the batch is (dcn, dp)-sharded, params replicated
(tp-sharded where rules apply, pipeline blocks pp-sharded), and XLA inserts
the gradient all-reduce over ICI (and DCN for the dcn axis).  The whole
3-forward loss (incl. frozen-VQGAN tokenization of targets and warped VID
negatives) compiles into the step: no host round-trips per iteration
(the reference re-encodes warped videos on host RNG every step,
dalle_bert.py:1090-1125).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mmvid_tpu.models.mmvid import MMVIDBert


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    optimizer: str = 'adam'           # adam | adamw
    lr_scheduler: str = 'warmuplr'    # warmuplr | warmupdecaylr | steplr |
    #                                   cosineannealinglr | reducelronplateau
    #                                   | none
    lr_scheduler_warmup: int = 5000
    lr_scheduler_step_size: int = 10000
    lr_scheduler_every: int = 1       # plateau check cadence (ref train.py:373)
    total_steps: int = 200000
    weight_decay: float = 0.0
    clip_grad_norm: float = 1.0
    beta_msm: float = 7.0
    beta_rel: float = 0.5
    beta_vid: float = 0.5
    msm_strategy_prob: Tuple[float, ...] = (0.7, 0.1, 0.1, 0.1)
    msm_bernoulli_prob: Tuple[float, float] = (0.2, 0.2)
    vid_strategy_prob: Tuple[float, ...] = (0.25, 0.25, 0.25, 0.25)
    pc_prob: float = 0.0
    rel_no_fully_masked: bool = False
    negvc: bool = False
    rand_visual: bool = False
    fullvc: bool = False
    vc_mode: Optional[str] = None
    visual_aug_mode: Optional[str] = None
    dropout_vc: float = 0.1

    @property
    def rel(self) -> bool:
        return self.beta_rel > 0

    @property
    def vid(self) -> bool:
        return self.beta_vid > 0


def make_lr_schedule(tc: TrainConfig):
    base = tc.learning_rate
    warm = max(tc.lr_scheduler_warmup, 1)
    if tc.lr_scheduler == 'warmuplr':
        # DeepSpeed WarmupLR: 0 -> lr over warmup, then constant
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm),
             optax.constant_schedule(base)], [warm])
    if tc.lr_scheduler == 'warmupdecaylr':
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm),
             optax.linear_schedule(base, 0.0,
                                   max(tc.total_steps - warm, 1))], [warm])
    if tc.lr_scheduler == 'steplr':
        # gamma=0.5 matching reference StepLR usage
        return optax.exponential_decay(base, tc.lr_scheduler_step_size, 0.5,
                                       staircase=True)
    if tc.lr_scheduler == 'cosineannealinglr':
        return optax.cosine_decay_schedule(base, tc.lr_scheduler_step_size)
    if tc.lr_scheduler in ('reducelronplateau', 'none'):
        # reducelronplateau: constant base LR; the plateau reduction is a
        # multiplicative update scale appended in make_optimizer.
        return optax.constant_schedule(base)
    raise ValueError(f'unknown lr_scheduler {tc.lr_scheduler!r}; expected '
                     'warmuplr|warmupdecaylr|steplr|cosineannealinglr|'
                     'reducelronplateau|none')


def make_optimizer(tc: TrainConfig):
    sched = make_lr_schedule(tc)
    if tc.optimizer == 'adamw':
        opt = optax.adamw(sched, b1=0.9, b2=0.95,
                          weight_decay=tc.weight_decay)
    elif tc.weight_decay > 0:
        # torch.optim.Adam(weight_decay=x) is L2 regularization: wd*param is
        # added to the GRADIENT before the Adam moments (after grad clip) —
        # not decoupled decay (utils/utils_train.py:167-182).
        opt = optax.chain(optax.add_decayed_weights(tc.weight_decay),
                          optax.adam(sched))
    else:
        opt = optax.adam(sched)
    parts = [optax.clip_by_global_norm(tc.clip_grad_norm), opt]
    if tc.lr_scheduler == 'reducelronplateau':
        # torch ReduceLROnPlateau(mode=min, factor=.5, patience=2,
        # cooldown=5, min_lr=1e-6, threshold=1e-4 rel)
        # (utils/utils_train.py:314-335), stepped with the current loss
        # every lr_scheduler_every iters (train.py:373-374) -> optax
        # reduce_on_plateau with the cadence as accumulation_size (it
        # averages the losses inside each window, then plateau-checks once).
        parts.append(optax.contrib.reduce_on_plateau(
            factor=0.5, patience=2, cooldown=5, rtol=1e-4,
            accumulation_size=max(tc.lr_scheduler_every, 1),
            min_scale=1e-6 / tc.learning_rate))
    # with_extra_args_support: the train step always passes value=loss; the
    # non-plateau transforms ignore it.
    return optax.with_extra_args_support(optax.chain(*parts))


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def opt_state_leaves(opt_state) -> dict:
    """Flatten an optax state into an orbax-serializable {index: leaf} dict
    (optax states are nested namedtuples, which orbax restores as plain
    containers; leaves + a fresh template round-trip exactly)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    return {str(i): leaf for i, leaf in enumerate(leaves)}


def opt_state_from_leaves(template_opt_state, leaves: dict):
    """Rebuild an optax state from opt_state_leaves output; the template is
    a freshly-initialized state of the SAME optimizer config."""
    treedef = jax.tree_util.tree_structure(template_opt_state)
    ordered = [jnp.asarray(leaves[str(i)]) for i in range(len(leaves))]
    assert treedef.num_leaves == len(ordered), (
        f'optimizer state leaf count changed: checkpoint has {len(ordered)},'
        f' current optimizer expects {treedef.num_leaves} (was the optimizer'
        ' or lr_scheduler config changed across the resume?)')
    return jax.tree_util.tree_unflatten(treedef, ordered)


def adapt_opt_state_layout(opt_state, n_layers: int, pipelined: bool):
    """Convert the params-shaped subtrees of an optax state (Adam mu/nu,
    decay masks, ...) between the per-block and the stacked pipeline
    layouts, so a resume survives a parallelism-topology change
    (--mesh_shape pp=... toggled across the restart)."""
    from mmvid_tpu.parallel.pipeline import adapt_stack_layout

    def rec(node):
        if isinstance(node, dict):
            if isinstance(node.get('transformer'), dict):
                return adapt_stack_layout(node, n_layers, pipelined)
            return {k: rec(v) for k, v in node.items()}
        if hasattr(node, '_fields'):  # namedtuple (optax states)
            return type(node)(*[rec(getattr(node, f))
                                for f in node._fields])
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(opt_state)


def create_train_state(model: MMVIDBert, tc: TrainConfig) -> TrainState:
    # Copy params: the jitted step donates its TrainState, and donation
    # would otherwise invalidate model.params (still needed for generation
    # during training).
    params = jax.tree_util.tree_map(jnp.array, model.params)
    return TrainState.create(params, make_optimizer(tc))


def make_train_step(model: MMVIDBert, tc: TrainConfig):
    """Build the pure train step: (state, batch, key) -> (state, metrics).

    batch: {'text': [B, L] int (or [B, Df] features), 'target':
    [B,T,H,W,3] in [0,1] (or [B, N] tokens), optional 'visual',
    'text_neg', 'visual_neg'}.
    """
    # int8 is serving-only: round() has zero gradient, so training a
    # quantized model would silently produce zero grads for every
    # quantized matmul (the stack-level assert only covers remat configs)
    clip_cfg = getattr(model.cfg, 'clip', None)
    assert clip_cfg is None or clip_cfg.int8_scales is None, (
        'model was quantized for serving (int8_scales set); training '
        'requires the bf16/fp32 model — build it without '
        'quantize_for_serving')
    # Same serving-only rule for MMVID_ATTN_BF16: the Pallas forward would
    # round attention probabilities to bf16 while the custom_vjp backward
    # recomputes through fp32 XLA, making grads inconsistent with the
    # forward (~1e-3).  Bench/serving may set it; training may not.
    import os as _os
    if _os.environ.get('MMVID_PALLAS_ATTN') == '1':
        # the flags are only read inside the Pallas kernel, so without
        # MMVID_PALLAS_ATTN they are inert and must not abort training
        for flag in ('MMVID_ATTN_BF16', 'MMVID_ATTN_INT8'):
            if _os.environ.get(flag) == '1':
                raise RuntimeError(
                    f'{flag}=1 is a serving/bench-only flag: its '
                    'quantized attention forward is inconsistent with '
                    'the fp32 recompute backward. Unset it for training.')
    tx = make_optimizer(tc)

    def loss_fn(params, batch, key):
        k_vc, key = jax.random.split(key)
        visual = batch.get('visual')
        visual_drop = None
        if visual is not None and tc.dropout_vc > 0 and not tc.fullvc:
            # Reference train.py:300-302: ONE draw per step passes
            # visual=None with prob dropout_vc (fullvc disables the drop);
            # visual=None means a fully-[MASK] visual token row
            # (dalle_bert.py:954-958), substituted post-tokenization in
            # model.loss so shapes stay static under jit.
            visual_drop = jax.random.bernoulli(k_vc, tc.dropout_vc)
        msm, rel, vid = model.loss(
            params, key, text=batch['text'], visual=visual,
            visual_drop=visual_drop,
            target=batch['target'], rel=tc.rel, vid=tc.vid,
            msm_strategy_prob=tc.msm_strategy_prob,
            msm_bernoulli_prob=tc.msm_bernoulli_prob,
            rel_no_fully_masked=tc.rel_no_fully_masked,
            vid_strategy_prob=tc.vid_strategy_prob, pc_prob=tc.pc_prob,
            erase_visual=tc.rand_visual and not tc.fullvc,
            vc_mode=tc.vc_mode, visual_aug_mode=tc.visual_aug_mode,
            negvc=tc.negvc, visual_neg=batch.get('visual_neg'),
            text_neg=batch.get('text_neg'))
        total = tc.beta_msm * msm + tc.beta_rel * rel + tc.beta_vid * vid
        return total, {'loss': total, 'loss_msm': msm, 'loss_rel': rel,
                       'loss_vid': vid}

    def train_step(state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params,
                                       value=metrics['loss'])
        params = optax.apply_updates(state.params, updates)
        metrics['grad_norm'] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step


def jit_train_step(model: MMVIDBert, tc: TrainConfig, mesh=None,
                   donate: bool = True):
    """jit the step; with a mesh, pin state/batch shardings so XLA lays the
    gradient all-reduce over the dp axis and tp collectives inside layers."""
    step = make_train_step(model, tc)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    from mmvid_tpu.parallel.mesh import batch_sharding, param_shardings

    def shard_state(state: TrainState) -> TrainState:
        ps = param_shardings(state.params, mesh)
        os_ = param_shardings(state.opt_state, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        return TrainState(
            step=jax.device_put(state.step, NamedSharding(mesh, P())),
            params=jax.device_put(state.params, ps),
            opt_state=jax.device_put(state.opt_state, os_))

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def run(state, batch, key):
        bs = batch_sharding(mesh)

        def put(v):
            if jax.process_count() > 1:
                # Each host holds only its local batch slice; assemble the
                # global dp-sharded array from the process-local shards
                # (a plain device_put of host-local data onto a global-mesh
                # sharding is undefined under GSPMD).
                import numpy as np
                return jax.make_array_from_process_local_data(
                    bs, np.asarray(v))
            return jax.device_put(v, bs)

        batch = {k: put(v) for k, v in batch.items() if v is not None}
        # trace/compile under the mesh context: the pipeline/seq-parallel
        # paths place bare-PartitionSpec sharding constraints that need an
        # ambient mesh (parallel/pipeline.py::maybe_constrain)
        with mesh:
            return jitted(state, batch, key)

    run.shard_state = shard_state
    return run
