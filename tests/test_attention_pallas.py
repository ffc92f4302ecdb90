"""Fused-attention Pallas kernel vs the jnp reference (interpret mode)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.ops.attention import fused_attention
from mmvid_tpu.models.clip import build_attention_mask


def _reference(q, k, v, mask):
    d = q.shape[-1]
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) * (d ** -0.5)
    if mask is not None:
        logits = logits + mask[None, None]
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', attn, v)


@pytest.mark.parametrize('l,mask_type', [(37, None), (64, 'causal'),
                                         (129, 'mask_prev')])
def test_fused_attention_matches_reference(l, mask_type):
    b, h, d = 2, 3, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, l, d))
    k = jax.random.normal(kk, (b, h, l, d))
    v = jax.random.normal(kv, (b, h, l, d))
    mask = None
    if mask_type == 'causal':
        mask = build_attention_mask(l, 'causal')
    elif mask_type == 'mask_prev':
        mask = build_attention_mask(l, 'mask_prev', index=[5, 6])

    ref = _reference(q, k, v, mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_transformer_stack_with_pallas_attention():
    """End-to-end: TransformerStack output identical with/without kernel."""
    from mmvid_tpu.models.clip import ClipStackConfig, TransformerStack

    cfg = ClipStackConfig(width=64, layers=2, heads=1)
    stack = TransformerStack(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 23, 64))
    params = stack.init(jax.random.PRNGKey(2), x, None)['params']
    mask = build_attention_mask(23, 'mask_prev', index=[3])

    base = stack.apply({'params': params}, x, mask)
    os.environ['MMVID_PALLAS_ATTN'] = '1'
    try:
        # CPU has no mosaic: route through interpret by monkeypatching
        import mmvid_tpu.ops.attention as attn_mod
        orig = attn_mod.fused_attention_blhd

        def interp(q, k, v, m, sm_scale=None):
            return orig(q, k, v, m, sm_scale, interpret=True)

        # the module imports inside __call__; patch at source module
        attn_mod.fused_attention_blhd = interp
        out = stack.apply({'params': params}, x, mask)
    finally:
        attn_mod.fused_attention_blhd = orig
        del os.environ['MMVID_PALLAS_ATTN']
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
