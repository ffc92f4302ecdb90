"""w8a8 int8 serving quantization for the backbone transformer.

The v5e MXU issues int8 x int8 at ~2x the bf16 rate, but only if no
reduction sits between matmuls: a measured sweep (scripts/probe_int8.py,
ROADMAP.md) shows chained MLP-shaped matmuls at 283 TFLOP/s with STATIC
activation scales vs 171 bf16 — while per-row OR per-tensor dynamic
quantization (an abs-max reduce per layer) gives the whole gain back.
So this path uses:

* per-output-channel weight scales computed in-trace from the bf16/fp32
  kernel (`jnp.round(kernel / w_scale)`) — loop-invariant, so XLA hoists
  the weight quantization out of the mask-predict `while_loop`; checkpoints
  are untouched and the param tree is identical to the bf16 path;
* per-layer STATIC activation scales calibrated once from a representative
  forward (`calibrate_int8_scales`), baked into `ClipStackConfig` as a
  static tuple so changing them simply retraces.

Serving-only: `jnp.round` has a zero gradient, so training asserts the
int8 path is off.  The reference has no quantized path (beyond-parity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# sow() collection name used during calibration
CALIB_COL = 'int8_calib'

# per layer: input scales for (qkv [shared ln_1 output], out-proj input,
# mlp fc input [ln_2 output], mlp proj input [QuickGELU output])
LayerScales = Tuple[float, float, float, float]


def quantized_dense(x, kernel, bias, a_scale: float):
    """y = x @ kernel + bias with an int8 MXU matmul.

    x: [..., K] bf16/fp32 activations, |x| mostly <= a_scale (values beyond
    the calibrated scale saturate, which is the standard w8a8 trade).
    kernel: [K, N] unquantized; per-output-channel symmetric scales.
    """
    w_scale = jnp.max(jnp.abs(kernel), axis=0).astype(jnp.float32) / 127.0
    w_scale = jnp.maximum(w_scale, 1e-8)
    w_q = jnp.round(kernel.astype(jnp.float32) / w_scale[None, :]
                    ).astype(jnp.int8)
    x_q = jnp.round(jnp.clip(x.astype(jnp.float32) * (127.0 / a_scale),
                             -127.0, 127.0)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (w_scale * (a_scale / 127.0))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _leaf_values(leaf):
    if isinstance(leaf, (tuple, list)):
        out = []
        for v in leaf:
            out.extend(_leaf_values(v))
        return out
    return [float(x) for x in jnp.ravel(jnp.asarray(leaf))]


def calibrate_int8_scales(calib_trees, n_layers: int):
    """Collapse one or more sowed ``CALIB_COL`` trees (from applies with
    ``mutable=[CALIB_COL]``) into the per-layer activation-scale tuple for
    ``ClipStackConfig.int8_scales``.  Scale = max abs observed per site
    (sites: qkv_in / out_in / fc_in / proj_in, sowed in models/clip.py).
    """
    flat = {}

    def walk(tree, prefix=''):
        for k, v in tree.items():
            path = f'{prefix}{k}'
            if isinstance(v, dict):
                walk(v, path + '/')
            else:
                flat.setdefault(path, []).extend(_leaf_values(v))

    for tree in calib_trees:
        walk(tree)
    scales = []
    for i in range(n_layers):
        layer = []
        for site in ('qkv_in', 'out_in', 'fc_in', 'proj_in'):
            vals = []
            for p, v in flat.items():
                if f'blocks_{i}/' in p and p.endswith(site):
                    vals.extend(v)
            assert vals, f'no calibration record for layer {i} {site}'
            layer.append(round(max(vals), 4))
        scales.append(tuple(layer))
    return tuple(scales)


def quantize_for_serving(model, text=None, key=None):
    """Calibrate activation scales and return a new MMVIDBert whose
    backbone runs the w8a8 int8 MXU path (params shared, unchanged).

    Calibration forwards: the sampler's step-0 state (fully-[MASK] target)
    plus a random-token target, so both ends of the mask-predict
    trajectory's activation range are observed.
    """
    import dataclasses

    from mmvid_tpu.models.mmvid import MMVIDBert

    cfg = model.cfg
    key = key if key is not None else jax.random.PRNGKey(0)
    if text is None:
        if cfg.fixed_language_model is None:
            text = jax.random.randint(key, (4, cfg.text_seq_len), 1,
                                      min(1000, cfg.num_text_tokens))
        else:  # fixed-LM models take pooled float features
            text = jax.random.normal(key, (4, cfg.text_feature_dim))
    visual = (jnp.full((text.shape[0], cfg.visual_seq_len), cfg.mask_token,
                       jnp.int32) if cfg.num_visuals > 0 else None)
    masked = jnp.full((text.shape[0], cfg.target_seq_len), cfg.mask_token,
                      jnp.int32)
    random_t = jax.random.randint(key, masked.shape, 0,
                                  cfg.num_image_tokens)
    trees = []
    for target in (masked, random_t):
        _, aux = model.core.apply({'params': model.params}, text, visual,
                                  target, mutable=[CALIB_COL])
        trees.append(aux[CALIB_COL])
    scales = calibrate_int8_scales(trees, cfg.clip.layers)
    new_cfg = dataclasses.replace(
        cfg, clip=dataclasses.replace(cfg.clip, int8_scales=scales))
    return MMVIDBert(new_cfg, model.vae, cvae=model.cvae,
                     params=model.params, dtype=model.core.dtype)
