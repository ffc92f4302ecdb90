"""w8a8 int8 serving path (mmvid_tpu.ops.int8): op math, calibration,
backbone parity, and the serving-only guards."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.ops.int8 import (
    CALIB_COL,
    calibrate_int8_scales,
    quantize_for_serving,
    quantized_dense,
)


@pytest.mark.quick
def test_quantized_dense_matches_fp_within_quant_noise():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 48) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(48) * 0.01, jnp.float32)
    ref = x @ w + b
    out = quantized_dense(x, w, b, a_scale=float(jnp.max(jnp.abs(x))))
    # int8 symmetric quant: relative error bounded by ~(1/127) per operand
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel
    # exactness when inputs are already int8-representable on the grid
    xq = jnp.round(x)  # integers, scale 127 -> exact
    wq = jnp.round(w * 100) / jnp.max(jnp.abs(jnp.round(w * 100)),
                                      axis=0) * 127
    out2 = quantized_dense(xq, jnp.round(wq), None, a_scale=127.0)
    ref2 = xq @ jnp.round(wq)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.quick
def test_quantized_dense_saturates_beyond_scale():
    x = jnp.asarray([[200.0, -300.0]])
    w = jnp.eye(2, dtype=jnp.float32)
    out = quantized_dense(x, w, None, a_scale=100.0)
    # clipped to +-127 quants of scale 100/127
    np.testing.assert_allclose(np.asarray(out[0]), [100.0, -100.0],
                               rtol=1e-5)


@pytest.mark.quick
def test_calibration_records_all_sites():
    from mmvid_tpu.models.clip import ClipStackConfig, TransformerStack

    cfg = ClipStackConfig(width=64, layers=2, heads=2)
    stack = TransformerStack(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 64))
    params = stack.init(jax.random.PRNGKey(1), x, None)['params']
    _, aux = stack.apply({'params': params}, x, None,
                         mutable=[CALIB_COL])
    scales = calibrate_int8_scales([aux[CALIB_COL]], cfg.layers)
    assert len(scales) == 2 and all(len(s) == 4 for s in scales)
    assert all(v > 0 for layer in scales for v in layer)


@pytest.mark.quick
def test_percentile_calibration_orders_and_selects():
    """Sites record an |x| quantile vector (CALIB_QUANTILES); percentile
    calibration picks tighter scales than abs-max (monotone in the
    quantile) and unsupported percentiles are rejected loudly."""
    from mmvid_tpu.models.clip import ClipStackConfig, TransformerStack

    cfg = ClipStackConfig(width=64, layers=1, heads=2)
    stack = TransformerStack(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 257, 64))
    params = stack.init(jax.random.PRNGKey(1), x, None)['params']
    _, aux = stack.apply({'params': params}, x, None, mutable=[CALIB_COL])

    s_max = calibrate_int8_scales([aux[CALIB_COL]], 1)
    s_999 = calibrate_int8_scales([aux[CALIB_COL]], 1, percentile=99.9)
    s_9999 = calibrate_int8_scales([aux[CALIB_COL]], 1, percentile=99.99)
    # quantile monotonicity at every site; with ~33k gaussian-ish values
    # per site the 99.9% quantile sits strictly inside the max
    for site in range(4):
        assert s_999[0][site] <= s_9999[0][site] <= s_max[0][site]
    assert s_999[0][0] < s_max[0][0]
    assert all(v > 0 for v in s_999[0])
    with pytest.raises(ValueError, match='unsupported'):
        calibrate_int8_scales([aux[CALIB_COL]], 1, percentile=95.0)


def test_percentile_calibration_recommendation():
    """Synthetic-golden A/B behind the README serving default
    (--int8_percentile 99.9): outlier ACTIVATION CHANNELS — a few hidden
    channels tens of times the bulk whose output contribution is not
    proportionate (the standard transformer serving pathology;
    input-side outliers cannot reproduce it because LayerNorm bounds
    every post-LN site at sqrt(width), but the post-GELU proj_in site is
    unbounded).  Abs-max calibration stretches the int8 grid over the
    outlier channels and quantizes the 252 bulk channels to a couple of
    levels; 99.9-percentile clipping saturates the low-signal outlier
    channel and keeps the 255 bulk channels precise.  WITHOUT outliers
    both calibrations are
    near-lossless, so percentile clipping is safe to default.  Final
    arbiter on real weights is the gate's FVD delta
    (scripts/validate_weights.py --int8 --int8_percentile 99.9)."""
    import jax.tree_util as jtu

    from mmvid_tpu.models.clip import ClipStackConfig, TransformerStack

    cfg = ClipStackConfig(width=64, layers=1, heads=2)
    stack = TransformerStack(cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 65, 64))
    params = stack.init(jax.random.PRNGKey(1), x0, None)['params']

    def with_outlier_channels(p):
        """Amplify ONE of the 256 mlp hidden channels x100 and shrink its
        proj row by the same factor: the fp output is (near-)unchanged,
        but the proj_in activation site now carries 100x outliers on
        ~0.2% of its values — inside the 99.9% clip, beyond the bulk."""
        p = jtu.tree_map(lambda v: v, p)  # deep copy
        mlp = p['blocks_0']['mlp']
        fck = np.asarray(mlp['fc']['kernel']).copy()
        fcb = np.asarray(mlp['fc']['bias']).copy()
        pjk = np.asarray(mlp['proj']['kernel']).copy()
        fck[:, :1] *= 100.0
        fcb[:1] *= 100.0
        pjk[:1, :] /= 100.0
        mlp['fc'] = {'kernel': jnp.asarray(fck), 'bias': jnp.asarray(fcb)}
        mlp['proj'] = {'kernel': jnp.asarray(pjk),
                       'bias': mlp['proj']['bias']}
        return p

    def cos(a, b):
        return float(jnp.sum(a * b)
                     / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))

    for outliers in (True, False):
        p = with_outlier_channels(params) if outliers else params
        calib = jax.random.normal(jax.random.PRNGKey(2), (2, 65, 64))
        _, aux = stack.apply({'params': p}, calib, None,
                             mutable=[CALIB_COL])
        probe = jax.random.normal(jax.random.PRNGKey(3), (2, 65, 64))
        ref = stack.apply({'params': p}, probe, None)

        def quant_cos(percentile, _p=p, _probe=probe, _ref=ref, _aux=aux):
            scales = calibrate_int8_scales([_aux[CALIB_COL]], 1,
                                           percentile=percentile)
            qstack = TransformerStack(
                dataclasses.replace(cfg, int8_scales=scales))
            return cos(_ref, qstack.apply({'params': _p}, _probe, None))

        c_max, c_999 = quant_cos(None), quant_cos(99.9)
        if outliers:
            # outlier channel: percentile clipping must strictly beat
            # abs-max (bulk quantization resolution ~an order finer)
            assert c_999 > c_max, (c_999, c_max)
            assert c_999 > 0.99, c_999
        else:
            # clean activations: both near-lossless (safe default)
            assert c_max > 0.995 and c_999 > 0.995, (c_max, c_999)


def test_quantized_backbone_close_to_fp_and_samples():
    from __graft_entry__ import _flagship

    model, _ = _flagship(tiny=True)
    qmodel = quantize_for_serving(model)
    assert qmodel.params is model.params  # no weight rewrite

    text = jnp.ones((2, model.cfg.text_seq_len), jnp.int32)
    target = jax.random.randint(
        jax.random.PRNGKey(1), (2, model.cfg.target_seq_len), 0, 1024)

    lb = model.core.apply({'params': model.params}, text, None, target)[0]
    lq = qmodel.core.apply({'params': qmodel.params}, text, None, target)[0]
    cos = float(jnp.sum(lb * lq)
                / (jnp.linalg.norm(lb) * jnp.linalg.norm(lq)))
    agree = float(jnp.mean(
        (jnp.argmax(lb, -1) == jnp.argmax(lq, -1)).astype(jnp.float32)))
    assert cos > 0.99, cos
    assert agree > 0.9, agree

    videos, _ = qmodel.generate_images(
        jax.random.PRNGKey(0), text, mask_predict_steps=2, dynamic=False)
    assert bool(jnp.all(jnp.isfinite(videos)))


@pytest.mark.quick
def test_int8_is_serving_only():
    from mmvid_tpu.models.clip import ClipStackConfig, TransformerStack

    scales = (((1.0, 1.0, 1.0, 1.0),) * 2)
    cfg = ClipStackConfig(width=64, layers=2, heads=2, remat=True,
                          int8_scales=scales)
    stack = TransformerStack(cfg)
    x = jnp.zeros((1, 8, 64))
    with pytest.raises(AssertionError, match='serving-only'):
        stack.init(jax.random.PRNGKey(0), x, None)

    cfg_pp = ClipStackConfig(width=64, layers=2, heads=2,
                             pipeline_stages=2, int8_scales=scales)
    with pytest.raises(AssertionError, match='pipeline'):
        TransformerStack(cfg_pp).init(jax.random.PRNGKey(0), x, None)


def test_quantized_vae_decoder_close_to_fp():
    from mmvid_tpu.models.vqgan import VQGanConfig, VQGanVAE
    from mmvid_tpu.ops.int8 import quantize_vae_decoder

    cfg = VQGanConfig(resolution=64, ch=32, ch_mult=(1, 2),
                      num_res_blocks=1, z_channels=64, embed_dim=64,
                      n_embed=256, attn_resolutions=(32,))
    vae = VQGanVAE(image_size=64, cfg=cfg)
    qvae = quantize_vae_decoder(vae)
    assert qvae.params is vae.params  # no weight rewrite
    # every decoder conv site calibrated (conv_in/out + res/attn/upsample)
    paths = [p for p, _ in qvae.cfg.int8_scales]
    assert 'decoder/conv_in' in paths and 'decoder/conv_out' in paths
    assert any('mid_attn_1/q' in p for p in paths)
    assert any('upsample/conv' in p for p in paths)

    seq = jax.random.randint(jax.random.PRNGKey(1), (2, 1024), 0, 256)
    a = np.asarray(vae.decode(seq))
    b = np.asarray(qvae.decode(seq))
    assert np.mean(np.abs(a - b)) < 0.02
    assert np.max(np.abs(a - b)) < 0.2


def test_quantize_for_serving_includes_decoder():
    from __graft_entry__ import _flagship

    model, _ = _flagship(tiny=True)
    q = quantize_for_serving(model)
    assert q.vae.cfg.int8_scales, 'decoder not quantized by default'
    q2 = quantize_for_serving(model, decoder=False)
    assert q2.vae is model.vae
