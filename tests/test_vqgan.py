"""VQGAN numerical parity vs the reference taming VQModel (golden oracle).

Strategy (SURVEY.md §4): instantiate the actual reference torch modules with
random weights, convert the state_dict with mmvid_tpu.utils.torch_compat, and
require matching outputs on fixed inputs.  This simultaneously validates the
model math and the checkpoint loader.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.vqgan import VQGanConfig, VQModel, VQGanVAE
from mmvid_tpu.ops.codebook import (
    nearest_codebook_indices,
    nearest_codebook_indices_pallas,
)
from mmvid_tpu.utils.torch_compat import convert_vqgan

from oracles import install_reference

SMALL = dict(resolution=32, ch=32, ch_mult=[1, 2], num_res_blocks=1,
             z_channels=64, attn_resolutions=[16])
SMALL_JAX = VQGanConfig(resolution=32, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, z_channels=64,
                        attn_resolutions=(16,), embed_dim=64, n_embed=128)


@pytest.fixture(scope='module')
def small_ref():
    install_reference()
    import torch
    torch.manual_seed(0)
    from taming.models.vqgan import VQModel as RefVQModel
    ref = RefVQModel(ddconfig=dict(SMALL, double_z=False, in_channels=3,
                                   out_ch=3, dropout=0.0),
                     lossconfig={'target': 'torch.nn.Identity'},
                     n_embed=128, embed_dim=64)
    # Spread the codebook out like a trained one: the default init is
    # uniform(-1/K, 1/K), which leaves every entry within float noise of
    # every other and makes the argmin meaningless for a parity test.
    with torch.no_grad():
        ref.quantize.embedding.weight.normal_(0, 1.0)
    ref.eval()
    return ref


def _params_from(ref):
    return convert_vqgan(
        {k: v.numpy() for k, v in ref.state_dict().items()})


def test_encode_indices_parity(small_ref):
    import torch
    params = _params_from(small_ref)
    model = VQModel(SMALL_JAX)

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        _, _, (_, _, ref_idx) = small_ref.encode(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_idx = ref_idx.numpy().reshape(2, -1)

    idx = model.apply({'params': params}, jnp.asarray(x),
                      method=VQModel.encode_indices)
    idx = np.asarray(idx).reshape(2, -1)
    # argmin ties can differ in float math; require near-total agreement
    agree = (idx == ref_idx).mean()
    assert agree > 0.999, f'index agreement {agree}'


def test_encoder_prequant_parity(small_ref):
    """Continuous encoder output (pre-quantization) must match closely."""
    import torch
    params = _params_from(small_ref)
    model = VQModel(SMALL_JAX)

    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        h_ref = small_ref.quant_conv(
            small_ref.encoder(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    h_ref = h_ref.numpy().transpose(0, 2, 3, 1)

    def prequant(mdl, xx):
        return mdl.quant_conv(mdl.encoder(xx))

    h = model.apply({'params': params}, jnp.asarray(x), method=prequant)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=2e-4, atol=2e-4)


def test_decode_code_parity(small_ref):
    import torch
    params = _params_from(small_ref)
    model = VQModel(SMALL_JAX)

    rng = np.random.RandomState(3)
    code = rng.randint(0, 128, size=(2, 16, 16)).astype(np.int32)

    with torch.no_grad():
        z_q = small_ref.quantize.embedding(torch.from_numpy(code).long())
        z_q = z_q.permute(0, 3, 1, 2)
        img_ref = small_ref.decode(z_q).numpy().transpose(0, 2, 3, 1)

    img = model.apply({'params': params}, jnp.asarray(code),
                      method=VQModel.decode_code)
    np.testing.assert_allclose(np.asarray(img), img_ref, rtol=2e-4, atol=2e-4)


def test_wrapper_roundtrip_semantics(small_ref):
    """VQGanVAE mirrors reference vae.py:38-56: [0,1] I/O + clamp."""
    import torch
    params = _params_from(small_ref)
    vae = VQGanVAE(params=params, image_size=32, cfg=SMALL_JAX)

    rng = np.random.RandomState(4)
    img = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)

    seq = vae.get_codebook_indices(jnp.asarray(img))
    assert seq.shape == (2, 16 * 16)

    with torch.no_grad():
        t_in = torch.from_numpy((2 * img - 1).transpose(0, 3, 1, 2))
        _, _, (_, _, ref_idx) = small_ref.encode(t_in)
    ref_idx = ref_idx.numpy().reshape(2, -1)
    assert (np.asarray(seq) == ref_idx).mean() > 0.999

    out = vae.decode(seq)
    assert out.shape == (2, 32, 32, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    with torch.no_grad():
        z = small_ref.quantize.embedding(torch.from_numpy(
            np.asarray(seq)).long().reshape(2, 16, 16))
        img_ref = small_ref.decode(z.permute(0, 3, 1, 2))
        img_ref = ((img_ref.clamp(-1, 1) + 1) * 0.5).numpy()
    np.testing.assert_allclose(np.asarray(out),
                               img_ref.transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)


def test_codebook_lookup_consistency():
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (64, 32))
    cb = jax.random.normal(jax.random.PRNGKey(1), (128, 32))
    idx = nearest_codebook_indices(z, cb)
    # brute force
    d = jnp.sum((z[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(jnp.argmin(d, axis=-1)))


def test_codebook_lookup_pallas_interpret():
    """Pallas kernel agrees with the jnp path (interpret mode on CPU)."""
    from jax.experimental import pallas as pl
    import mmvid_tpu.ops.codebook as cbmod

    z = jax.random.normal(jax.random.PRNGKey(2), (300, 128))
    cb = jax.random.normal(jax.random.PRNGKey(3), (256, 128))
    ref = nearest_codebook_indices(z, cb)

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)

    cbmod.pl.pallas_call = patched
    try:
        out = nearest_codebook_indices_pallas(z, cb, block_m=128)
    finally:
        cbmod.pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
