"""Fused LN+QKV kernel vs the unfused path (interpret mode)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.clip import (
    ClipStackConfig,
    TransformerStack,
    build_attention_mask,
)


def test_fused_ln_qkv_matches_reference():
    import mmvid_tpu.ops.fused_ln_qkv as mod

    b, l, d = 2, 37, 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 9)
    x = jax.random.normal(ks[0], (b, l, d))
    scale = jax.random.normal(ks[1], (d,)) * 0.1 + 1.0
    bias = jax.random.normal(ks[2], (d,)) * 0.1
    ws = [jax.random.normal(k, (d, d)) * 0.05 for k in ks[3:6]]
    bs = [jax.random.normal(k, (d,)) * 0.05 for k in ks[6:9]]

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    refs = [h @ w + bb for w, bb in zip(ws, bs)]

    outs = mod.fused_ln_qkv(x, scale, bias, ws[0], bs[0], ws[1], bs[1],
                            ws[2], bs[2], interpret=True)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_stack_with_fused_lnqkv_matches_unfused():
    cfg = ClipStackConfig(width=128, layers=2, heads=2)
    stack = TransformerStack(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 23, 128))
    mask = build_attention_mask(23, 'mask_prev', index=[3])
    params = stack.init(jax.random.PRNGKey(2), x, mask)['params']
    base = stack.apply({'params': params}, x, mask)

    # interpret-mode routing for CPU
    import mmvid_tpu.ops.attention as attn_mod
    import mmvid_tpu.ops.fused_ln_qkv as lq_mod
    orig_a, orig_q = attn_mod.fused_attention_blhd, lq_mod.fused_ln_qkv
    attn_mod.fused_attention_blhd = (
        lambda q, k, v, m, sm_scale=None: orig_a(q, k, v, m, sm_scale,
                                                 interpret=True))
    lq_mod.fused_ln_qkv = (
        lambda *a, **kw: orig_q(*a, interpret=True))
    os.environ['MMVID_FUSED_LNQKV'] = '1'
    os.environ['MMVID_PALLAS_ATTN'] = '1'
    try:
        # param tree must be identical between paths
        params2 = stack.init(jax.random.PRNGKey(2), x, mask)['params']
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params2)
        out = stack.apply({'params': params}, x, mask)
    finally:
        attn_mod.fused_attention_blhd = orig_a
        lq_mod.fused_ln_qkv = orig_q
        del os.environ['MMVID_FUSED_LNQKV']
        del os.environ['MMVID_PALLAS_ATTN']
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
