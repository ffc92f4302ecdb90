"""VQGAN training losses + discriminator + GAN train step.

Parity targets:
* VQLPIPSWithDiscriminator: L1 + LPIPS + hinge GAN with adaptive generator
  weight from the grad-norm ratio at the decoder's last layer
  (taming/modules/losses/vqperceptual.py:33-160)
* NLayerDiscriminator: Pix2Pix PatchGAN (taming/modules/discriminator/
  model.py:16-103); BatchNorm variant
* BCELossWithQuant: segmentation VQGAN loss (taming/modules/losses/
  segmentation.py:11)
* Two-optimizer alternating train step replacing the Lightning
  training_step (taming/models/vqgan.py:94-204)

The whole generator/discriminator alternation compiles into two jitted SPMD
steps (batch dp-sharded, params replicated).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from mmvid_tpu.models.lpips import LPIPS
from mmvid_tpu.models.vqgan import VQGanConfig, VQModel


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator, NHWC (BatchNorm computed per batch)."""
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name='conv_0')(x)
        x = nn.leaky_relu(x, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f'conv_{n}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f'bn_{n}')(x)
            x = nn.leaky_relu(x, 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=1,
                    use_bias=False, dtype=self.dtype,
                    name=f'conv_{self.n_layers}')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name=f'bn_{self.n_layers}')(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       dtype=self.dtype, name='conv_out')(x)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


def bce_loss_with_quant(qloss, target, prediction, codebook_weight=1.0):
    """Segmentation VQGAN loss (taming segmentation.py:11-31): BCE over
    class maps + codebook term."""
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(prediction, target))
    return bce + codebook_weight * jnp.mean(qloss)


@dataclasses.dataclass(frozen=True)
class VQGanLossConfig:
    disc_start: int = 0
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 0.8
    perceptual_weight: float = 1.0
    disc_ndf: int = 64
    disc_loss: str = 'hinge'
    learning_rate: float = 4.5e-6


class VQGanTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_opt: Any
    d_params: Any
    d_state: Any      # discriminator batch stats
    d_opt: Any


class VQGanTrainer:
    """Alternating generator/discriminator finetuning of a VQModel."""

    def __init__(self, cfg: VQGanConfig, loss_cfg: VQGanLossConfig,
                 lpips: Optional[LPIPS] = None, dtype=jnp.float32):
        self.cfg = cfg
        self.lc = loss_cfg
        self.model = VQModel(cfg, dtype=dtype)
        self.disc = NLayerDiscriminator(loss_cfg.disc_ndf,
                                        loss_cfg.disc_num_layers,
                                        dtype=dtype)
        self.lpips = lpips or LPIPS(dtype=dtype)
        self.d_loss_fn = (hinge_d_loss if loss_cfg.disc_loss == 'hinge'
                          else vanilla_d_loss)
        # Adam(lr, betas=(0.5, 0.9)) as in taming configure_optimizers
        self.g_tx = optax.adam(loss_cfg.learning_rate, b1=0.5, b2=0.9)
        self.d_tx = optax.adam(loss_cfg.learning_rate, b1=0.5, b2=0.9)

    def create_state(self, key, image_size: Optional[int] = None
                     ) -> VQGanTrainState:
        size = image_size or self.cfg.resolution
        x = jnp.zeros((1, size, size, 3))
        kg, kd = jax.random.split(key)
        g_params = self.model.init(kg, x)['params']
        d_vars = self.disc.init(kd, x, train=False)
        return VQGanTrainState(
            step=jnp.zeros((), jnp.int32), g_params=g_params,
            g_opt=self.g_tx.init(g_params), d_params=d_vars['params'],
            d_state=d_vars.get('batch_stats', {}),
            d_opt=self.d_tx.init(d_vars['params']))

    # ------------------------------------------------------------------
    def _recon(self, g_params, x):
        return self.model.apply({'params': g_params}, x)

    def _nll(self, x, xrec):
        rec = jnp.abs(x - xrec)
        if self.lc.perceptual_weight > 0:
            p = self.lpips._impl(self.lpips.vgg_params, x, xrec)
            rec = jnp.mean(rec, axis=(1, 2, 3)) \
                + self.lc.perceptual_weight * p
            return jnp.mean(rec)
        return jnp.mean(rec)

    def _adaptive_weight(self, g_params, x):
        """Grad-norm ratio at decoder.conv_out.kernel
        (vqperceptual.py:71-90)."""
        last = ('decoder', 'conv_out', 'kernel')

        def pick(tree):
            node = tree
            for k in last:
                node = node[k]
            return node

        def nll_of_last(w):
            p = _tree_set(g_params, last, w)
            xrec, _ = self._recon(p, x)
            return self._nll(x, xrec)

        def g_of_last(w, d_params, d_state):
            p = _tree_set(g_params, last, w)
            xrec, _ = self._recon(p, x)
            logits = self.disc.apply(
                {'params': d_params, 'batch_stats': d_state}, xrec,
                train=False)
            return -jnp.mean(logits)

        return pick, nll_of_last, g_of_last

    def make_g_step(self):
        lc = self.lc

        def g_step(state: VQGanTrainState, x):
            def loss_fn(g_params):
                xrec, qloss = self._recon(g_params, x)
                nll = self._nll(x, xrec)
                logits_fake = self.disc.apply(
                    {'params': state.d_params,
                     'batch_stats': state.d_state}, xrec, train=False)
                g_loss = -jnp.mean(logits_fake)

                pick, nll_last, g_last = self._adaptive_weight(g_params, x)
                w = pick(g_params)
                nll_g = jax.grad(nll_last)(w)
                gan_g = jax.grad(g_last)(w, state.d_params, state.d_state)
                d_weight = jnp.linalg.norm(nll_g.reshape(-1)) / (
                    jnp.linalg.norm(gan_g.reshape(-1)) + 1e-4)
                d_weight = jax.lax.stop_gradient(
                    jnp.clip(d_weight, 0.0, 1e4)) * lc.disc_weight

                disc_factor = adopt_weight(lc.disc_factor, state.step,
                                           lc.disc_start)
                loss = (nll + d_weight * disc_factor * g_loss
                        + lc.codebook_weight * jnp.mean(qloss))
                return loss, {'aeloss': loss, 'nll': nll,
                              'g_loss': g_loss, 'd_weight': d_weight,
                              'qloss': jnp.mean(qloss)}

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.g_params)
            updates, g_opt = self.g_tx.update(grads, state.g_opt,
                                              state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return state.replace(g_params=g_params, g_opt=g_opt), metrics

        return g_step

    def make_d_step(self):
        lc = self.lc

        def d_step(state: VQGanTrainState, x):
            xrec, _ = self._recon(state.g_params, x)
            xrec = jax.lax.stop_gradient(xrec)

            def loss_fn(d_params):
                lr_, new_state = self.disc.apply(
                    {'params': d_params, 'batch_stats': state.d_state}, x,
                    train=True, mutable=['batch_stats'])
                lf_, new_state = self.disc.apply(
                    {'params': d_params,
                     'batch_stats': new_state['batch_stats']}, xrec,
                    train=True, mutable=['batch_stats'])
                disc_factor = adopt_weight(lc.disc_factor, state.step,
                                           lc.disc_start)
                loss = disc_factor * self.d_loss_fn(lr_, lf_)
                return loss, (new_state['batch_stats'],
                              {'discloss': loss,
                               'logits_real': jnp.mean(lr_),
                               'logits_fake': jnp.mean(lf_)})

            (_, (bstats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.d_params)
            updates, d_opt = self.d_tx.update(grads, state.d_opt,
                                              state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return state.replace(step=state.step + 1, d_params=d_params,
                                 d_state=bstats, d_opt=d_opt), metrics

        return d_step


class SegmentationVQModel(nn.Module):
    """Segmentation-mask VQGAN (taming VQSegmentationModel, vqgan.py:233-297):
    the standard encoder/quantizer/decoder over n_labels channels with a
    BCE-with-quant loss and a single Adam optimizer — used to train the
    'cvae' stream for mask/drawing visual controls."""
    cfg: VQGanConfig
    n_labels: int
    dtype: Any = jnp.float32

    def setup(self):
        import dataclasses as _dc
        cfg = _dc.replace(self.cfg, in_channels=self.n_labels,
                          out_ch=self.n_labels)
        self.model = VQModel(cfg, dtype=self.dtype)

    def __call__(self, x):
        return self.model(x)


def make_segmentation_train_step(module: SegmentationVQModel, tx,
                                 codebook_weight: float = 1.0):
    """(params, opt_state, x_onehot) -> (params, opt_state, metrics)."""
    import optax as _optax

    def step(params, opt_state, x):
        def loss_fn(p):
            xrec, qloss = module.apply({'params': p}, x)
            loss = bce_loss_with_quant(qloss, x, xrec, codebook_weight)
            return loss, {'loss': loss, 'qloss': jnp.mean(qloss)}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return _optax.apply_updates(params, updates), opt_state, metrics

    return step


def _tree_set(tree, path, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _tree_set(tree[path[0]], path[1:], value)}
