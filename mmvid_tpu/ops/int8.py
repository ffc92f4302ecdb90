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

# each calibration site records |x| at these quantiles (1.0 = abs-max),
# so scale selection (abs-max vs percentile clipping) is a calibration-
# time choice, not a re-instrumentation
CALIB_QUANTILES = (0.999, 0.9999, 1.0)


def calib_stats(x):
    """[len(CALIB_QUANTILES)] |x| quantile record for a sow site."""
    a = jnp.abs(x.astype(jnp.float32)).ravel()
    return jnp.quantile(a, jnp.asarray(CALIB_QUANTILES))


def _stat_index(percentile):
    """percentile (None = abs-max, else e.g. 99.9) -> CALIB_QUANTILES idx."""
    if percentile is None:
        return len(CALIB_QUANTILES) - 1
    q = float(percentile) / 100.0
    for i, cq in enumerate(CALIB_QUANTILES):
        if abs(cq - q) < 1e-9:
            return i
    raise ValueError(
        f'unsupported calibration percentile {percentile}; recorded '
        f'quantiles: {[q * 100 for q in CALIB_QUANTILES[:-1]]} or None '
        f'(abs-max)')


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


def quantized_conv(x, kernel, bias, a_scale: float, strides=(1, 1),
                   padding='SAME'):
    """NHWC conv on the int8 MXU path (measured 1.87x bf16 at VQGAN
    decoder shapes — probe in ROADMAP.md).  kernel [kh,kw,in,out]
    unquantized, per-output-channel symmetric weight scales computed
    in-trace (hoisted by XLA); activations quantized with the calibrated
    static ``a_scale``.
    """
    w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)
                      ).astype(jnp.float32) / 127.0
    w_scale = jnp.maximum(w_scale, 1e-8)
    w_q = jnp.round(kernel.astype(jnp.float32) / w_scale).astype(jnp.int8)
    x_q = jnp.round(jnp.clip(x.astype(jnp.float32) * (127.0 / a_scale),
                             -127.0, 127.0)).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32)
           * (w_scale * (a_scale / 127.0))[None, None, None, :])
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _flatten_calib(tree):
    """Flatten a sowed CALIB_COL tree to {'a/b/site_in': [floats]}."""
    flat = {}

    def walk(t, prefix=''):
        for k, v in t.items():
            path = f'{prefix}{k}'
            if isinstance(v, dict):
                walk(v, path + '/')
            else:
                flat.setdefault(path, []).extend(_leaf_values(v))

    walk(tree)
    return flat


def quantize_vae_decoder(vae, sample_tokens=None, key=None,
                         headroom=1.25, percentile=None):
    """Calibrate the VQGAN DECODER's conv inputs on sample token grids and
    return a new VQGanVAE whose decode path runs int8 convs (params
    shared, unchanged; encode path stays bf16/fp32 — it feeds training).

    Pass ``sample_tokens`` produced by the actual sampler where possible
    (quantize_for_serving does) — coherent token grids can excite larger
    conv activations than uniform-random ones; ``headroom`` additionally
    widens the calibrated scales so near-range inputs do not saturate.
    ``percentile`` (None = abs-max, or one of CALIB_QUANTILES as a
    percentage, e.g. 99.9) clips activation outliers for finer
    quantization of the bulk — the standard accuracy/saturation trade.
    """
    import dataclasses

    from mmvid_tpu.models.vqgan import VQGanVAE, VQModel

    key = key if key is not None else jax.random.PRNGKey(0)
    if sample_tokens is None:
        sample_tokens = jax.random.randint(
            key, (4, vae.image_seq_len), 0, vae.num_tokens)
    b, n = sample_tokens.shape
    f = int(n ** 0.5)
    _, aux = vae.module.apply(
        {'params': vae.params}, sample_tokens.reshape(b, f, f),
        method=VQModel.decode_code, mutable=[CALIB_COL])
    flat = _flatten_calib(aux[CALIB_COL])
    scales = tuple(sorted(
        (path[:-len('_in')], _site_scale(vals, percentile, headroom))
        for path, vals in flat.items() if path.endswith('_in')))
    assert scales, 'decoder calibration produced no conv records'
    new_cfg = dataclasses.replace(vae.cfg, int8_scales=scales)
    return VQGanVAE(params=vae.params, image_size=vae.image_size,
                    cfg=new_cfg, dtype=vae.module.dtype)


def _leaf_values(leaf):
    """Flatten a sow leaf to per-forward quantile records [n_quantiles].

    Sites record ``calib_stats`` vectors; a legacy scalar record (abs-max
    only) is broadcast so it still selects correctly at any percentile."""
    import numpy as np
    if isinstance(leaf, (tuple, list)):
        out = []
        for v in leaf:
            out.extend(_leaf_values(v))
        return out
    arr = np.asarray(leaf, dtype=float).ravel()
    nq = len(CALIB_QUANTILES)
    if arr.size == nq:
        return [arr]
    return [np.full(nq, float(v)) for v in arr]


def _site_scale(records, percentile, headroom=1.0):
    """Collapse a site's per-forward quantile records to one scale: the
    max over forwards of the chosen quantile (abs-max when
    percentile=None), widened by ``headroom``."""
    idx = _stat_index(percentile)
    return _safe_scale(max(float(r[idx]) for r in records) * headroom)


def calibrate_int8_scales(calib_trees, n_layers: int, percentile=None):
    """Collapse one or more sowed ``CALIB_COL`` trees (from applies with
    ``mutable=[CALIB_COL]``) into the per-layer activation-scale tuple for
    ``ClipStackConfig.int8_scales``.  Scale = max over forwards of the
    chosen |x| quantile per site (percentile=None -> abs-max; sites:
    qkv_in / out_in / fc_in / proj_in, sowed in models/clip.py).
    """
    flat = {}
    for tree in calib_trees:
        for p, vals in _flatten_calib(tree).items():
            flat.setdefault(p, []).extend(vals)
    scales = []
    for i in range(n_layers):
        layer = []
        for site in ('qkv_in', 'out_in', 'fc_in', 'proj_in'):
            vals = []
            for p, v in flat.items():
                if f'blocks_{i}/' in p and p.endswith(site):
                    vals.extend(v)
            assert vals, f'no calibration record for layer {i} {site}'
            layer.append(_site_scale(vals, percentile))
        scales.append(tuple(layer))
    return tuple(scales)


def _safe_scale(v: float) -> float:
    """Positive, rounded activation scale: a near-dead calibration site
    must not produce a 0.0 scale (quantize divides by it -> inf/NaN)."""
    return max(round(float(v), 4), 1e-4)


def quantize_for_serving(model, text=None, key=None, decoder=True,
                         percentile=None):
    """Calibrate activation scales and return a new MMVIDBert whose
    backbone (and, with ``decoder=True``, the VQGAN decoder convs) runs
    the w8a8 int8 MXU path (params shared, unchanged).

    Calibration forwards: the sampler's step-0 state (fully-[MASK] target)
    plus a random-token target, so both ends of the mask-predict
    trajectory's activation range are observed.  Pass REAL text batches
    via ``text`` where available (scripts/validate_weights.py --int8
    does) — served-distribution activations calibrate tighter scales than
    random tokens.  ``percentile`` (None = abs-max; 99.9 / 99.99) clips
    activation outliers for finer bulk quantization.
    """
    import dataclasses

    from mmvid_tpu.models.mmvid import MMVIDBert

    cfg = model.cfg
    assert cfg.clip.pipeline_stages == 1, (
        'int8 serving not supported with pipeline parallelism '
        '(pipeline_stages > 1): per-layer static scales cannot vary '
        'inside the stage scan — rebuild the model with '
        'pipeline_stages=1 for serving (checkpoints convert '
        'automatically)')
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
    scales = calibrate_int8_scales(trees, cfg.clip.layers,
                                   percentile=percentile)
    new_cfg = dataclasses.replace(
        cfg, clip=dataclasses.replace(cfg.clip, int8_scales=scales))
    vae = model.vae
    if decoder:
        # calibrate the decoder on SAMPLER-emitted token grids (a short
        # mask-predict run with the still-bf16 model) — coherent grids
        # excite larger conv activations than uniform-random tokens
        _, gen_tokens = model.generate_images(
            key, text[:2], mask_predict_steps=3, dynamic=False,
            decode=False)
        # [B, T*n] -> per-frame grids [B*T, n] (the decoder sees frames)
        frame_tokens = jnp.asarray(gen_tokens).reshape(
            -1, model.vae.image_seq_len)[:8]
        vae = quantize_vae_decoder(model.vae, sample_tokens=frame_tokens,
                                   key=key, percentile=percentile)
    return MMVIDBert(new_cfg, vae, cvae=model.cvae,
                     params=model.params, dtype=model.core.dtype)
