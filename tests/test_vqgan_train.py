"""VQGAN finetuning: LPIPS metric, discriminator, GAN train steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvid_tpu.models.lpips import LPIPS, load_lpips_lin_weights
from mmvid_tpu.models.vqgan import VQGanConfig
from mmvid_tpu.models.vqgan_losses import (
    NLayerDiscriminator,
    VQGanLossConfig,
    VQGanTrainer,
    hinge_d_loss,
)

TINY_VQ = VQGanConfig(resolution=32, ch=32, ch_mult=(1, 2),
                      num_res_blocks=1, z_channels=64, embed_dim=64,
                      n_embed=128, attn_resolutions=())


def test_lpips_lin_weights_load():
    ws = load_lpips_lin_weights()
    assert [w.shape[0] for w in ws] == [64, 128, 256, 512, 512]
    assert all((w >= 0).all() for w in ws)  # calibration weights are >= 0


def test_lpips_metric_properties():
    lp = LPIPS()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 2 - 1
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 2 - 1
    same = np.asarray(lp(x, x))
    diff = np.asarray(lp(x, y))
    assert same.shape == (2,)
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    assert (diff > 0).all()


def test_discriminator_patch_output():
    disc = NLayerDiscriminator(ndf=16, n_layers=2)
    x = jnp.zeros((2, 32, 32, 3))
    variables = disc.init(jax.random.PRNGKey(0), x, train=False)
    out = disc.apply(variables, x, train=False)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] < 32  # patch map, downsampled


def test_hinge_loss():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0
    assert float(hinge_d_loss(-real, -fake)) == 3.0


def test_gumbel_quantizer():
    from mmvid_tpu.models.vqgan import GumbelQuantize
    q = GumbelQuantize(n_embed=32, embed_dim=16)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    params = q.init({'params': jax.random.PRNGKey(1),
                     'gumbel': jax.random.PRNGKey(2)}, z, train=True)
    zq, kl, idx = q.apply(params, z, train=True, temp=1.0,
                          rngs={'gumbel': jax.random.PRNGKey(3)})
    assert zq.shape == (2, 4, 4, 16)
    assert np.isfinite(float(kl))
    assert idx.shape == (2, 4, 4) and int(idx.max()) < 32
    # eval path: deterministic argmax
    zq1, _, idx1 = q.apply(params, z, train=False)
    zq2, _, idx2 = q.apply(params, z, train=False)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))


def test_segmentation_vqgan_step():
    import optax
    from mmvid_tpu.models.vqgan_losses import (
        SegmentationVQModel,
        make_segmentation_train_step,
    )
    module = SegmentationVQModel(TINY_VQ, n_labels=5)
    x = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(0), (2, 32, 32), 0, 5), 5)
    params = module.init(jax.random.PRNGKey(1), x)['params']
    tx = optax.adam(1e-4)
    step = jax.jit(make_segmentation_train_step(module, tx))
    opt_state = tx.init(params)
    params, opt_state, m = step(params, opt_state, x)
    assert np.isfinite(float(m['loss'])) and float(m['loss']) > 0


def test_vqgan_gan_training_steps():
    trainer = VQGanTrainer(TINY_VQ, VQGanLossConfig(learning_rate=1e-4,
                                                    disc_start=0))
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=32)
    g_step = jax.jit(trainer.make_g_step())
    d_step = jax.jit(trainer.make_d_step())

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    state, gm = g_step(state, x)
    state, dm = d_step(state, x)
    for name, v in {**gm, **dm}.items():
        assert np.isfinite(float(v)), name
    assert float(gm['nll']) > 0
    assert int(state.step) == 1

    # a few alternating steps keep everything finite and update params
    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    for i in range(2):
        state, gm = g_step(state, x)
        state, dm = d_step(state, x)
    g1 = jax.tree_util.tree_leaves(state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
