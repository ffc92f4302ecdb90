"""LPIPS perceptual metric (VGG16 variant) in Flax.

Parity target: taming/modules/losses/lpips.py:11-124 — ImageNet-normalized
inputs through VGG16 feature slices (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3), channel-normalized feature differences, learned 1x1 "lin" heads
(weights shipped in vgg_lpips.pth), spatially averaged and summed.

The VGG16 backbone weights come from a torchvision vgg16 state_dict
(convert with `convert_vgg16`); without them the metric runs with random
features (pipeline tests only).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_LPIPS_LIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'data_files', 'vgg_lpips.pth')

# LPIPS ScalingLayer constants (lpips.py:66-76)
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)

# VGG16 conv plan: (out_channels, pool_before)
_VGG16 = [(64, False), (64, False),          # slice1 ends after relu1_2
          (128, True), (128, False),         # slice2: relu2_2
          (256, True), (256, False), (256, False),    # slice3: relu3_3
          (512, True), (512, False), (512, False),    # slice4: relu4_3
          (512, True), (512, False), (512, False)]    # slice5: relu5_3
_SLICE_ENDS = (2, 4, 7, 10, 13)
CHNS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        for i, (ch, pool) in enumerate(_VGG16):
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
            x = nn.Conv(ch, (3, 3), dtype=self.dtype, name=f'conv_{i}')(x)
            x = nn.relu(x)
            if i + 1 in _SLICE_ENDS:
                feats.append(x)
        return feats


class LPIPS:
    """Functional LPIPS: __call__(x, y) on [B,H,W,3] in [-1,1] -> [B]."""

    def __init__(self, vgg_params=None, lin_weights=None,
                 dtype=jnp.float32):
        self.net = VGG16Features(dtype=dtype)
        if vgg_params is None:
            vgg_params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))['params']
        self.vgg_params = vgg_params
        if lin_weights is None:
            lin_weights = load_lpips_lin_weights()
        self.lin_weights = lin_weights  # list of [C] vectors
        self._fn = jax.jit(self._impl)

    def _impl(self, vgg_params, x, y):
        xs = (x - _SHIFT) / _SCALE
        ys = (y - _SHIFT) / _SCALE
        fx = self.net.apply({'params': vgg_params}, xs)
        fy = self.net.apply({'params': vgg_params}, ys)
        total = 0.0
        for k in range(len(CHNS)):
            a = fx[k] / jnp.maximum(
                jnp.linalg.norm(fx[k], axis=-1, keepdims=True), 1e-10)
            b = fy[k] / jnp.maximum(
                jnp.linalg.norm(fy[k], axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2                       # [B,H,W,C]
            w = jnp.asarray(self.lin_weights[k])   # [C]
            total = total + jnp.mean(
                jnp.sum(d * w[None, None, None, :], axis=-1), axis=(1, 2))
        return total

    def __call__(self, x, y):
        return self._fn(self.vgg_params, x, y)


def load_lpips_lin_weights(path: str = _LPIPS_LIN) -> List[np.ndarray]:
    """The 1x1 'lin' calibration weights shipped by taming (vgg.pth)."""
    import torch
    sd = torch.load(path, map_location='cpu')
    return [sd[f'lin{i}.model.1.weight'].numpy().reshape(-1)
            for i in range(5)]


def convert_vgg16(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision vgg16 state_dict ('features.N.weight') -> flax params."""
    # torchvision indices of the 13 convs in vgg16.features
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: Dict[str, Any] = {}
    for i, t in enumerate(tv_idx):
        w = np.asarray(sd[f'features.{t}.weight'])
        b = np.asarray(sd[f'features.{t}.bias'])
        params[f'conv_{i}'] = {'kernel': np.transpose(w, (2, 3, 1, 0)),
                               'bias': b}
    return params
