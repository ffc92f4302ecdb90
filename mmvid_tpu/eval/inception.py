"""InceptionV3 in Flax — image embeddings for the standalone PRD tool.

Replaces the reference's frozen TF graph Inception pool_3 embedder
(precision_recall_distributions/inception.py:12-28,
inception_network.py:23-57).  Architecture is the standard TF-slim
InceptionV3 (Szegedy et al. 2015): stem, 3x Inception-A (35x35),
Reduction-A, 4x Inception-B (17x17, 7x1/1x7 factorized), Reduction-B,
2x Inception-C (8x8, split 1x3/3x1), global average pool -> the 2048-d
"pool_3" embedding.

Every conv is Conv+BatchNorm(center-only, eps 1e-3)+ReLU ("Unit"), matching
slim's inference graph; weights convert from a TF-slim InceptionV3
checkpoint via `convert_slim_inception` (variable names like
``InceptionV3/Mixed_5b/Branch_0/Conv2d_0a_1x1/weights``).  Without weights
the module runs randomly initialized (pipeline/shape tests only).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Unit2D(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: str = 'SAME'

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, use_bias=True,
                         use_scale=False, epsilon=1e-3,
                         name='batch_norm')(x)
        return nn.relu(x)


def _avgpool_same(x):
    return nn.avg_pool(x, (3, 3), (1, 1), padding='SAME')


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b0 = Unit2D(64, name='Branch_0_Conv2d_0a_1x1')(x)
        b1 = Unit2D(48, name='Branch_1_Conv2d_0a_1x1')(x)
        b1 = Unit2D(64, (5, 5), name='Branch_1_Conv2d_0b_5x5')(b1)
        b2 = Unit2D(64, name='Branch_2_Conv2d_0a_1x1')(x)
        b2 = Unit2D(96, (3, 3), name='Branch_2_Conv2d_0b_3x3')(b2)
        b2 = Unit2D(96, (3, 3), name='Branch_2_Conv2d_0c_3x3')(b2)
        b3 = Unit2D(self.pool_features,
                    name='Branch_3_Conv2d_0b_1x1')(_avgpool_same(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = Unit2D(384, (3, 3), (2, 2), 'VALID',
                    name='Branch_0_Conv2d_1a_1x1')(x)
        b1 = Unit2D(64, name='Branch_1_Conv2d_0a_1x1')(x)
        b1 = Unit2D(96, (3, 3), name='Branch_1_Conv2d_0b_3x3')(b1)
        b1 = Unit2D(96, (3, 3), (2, 2), 'VALID',
                    name='Branch_1_Conv2d_1a_1x1')(b1)
        b2 = nn.max_pool(x, (3, 3), (2, 2), padding='VALID')
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionB(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b0 = Unit2D(192, name='Branch_0_Conv2d_0a_1x1')(x)
        b1 = Unit2D(c7, name='Branch_1_Conv2d_0a_1x1')(x)
        b1 = Unit2D(c7, (1, 7), name='Branch_1_Conv2d_0b_1x7')(b1)
        b1 = Unit2D(192, (7, 1), name='Branch_1_Conv2d_0c_7x1')(b1)
        b2 = Unit2D(c7, name='Branch_2_Conv2d_0a_1x1')(x)
        b2 = Unit2D(c7, (7, 1), name='Branch_2_Conv2d_0b_7x1')(b2)
        b2 = Unit2D(c7, (1, 7), name='Branch_2_Conv2d_0c_1x7')(b2)
        b2 = Unit2D(c7, (7, 1), name='Branch_2_Conv2d_0d_7x1')(b2)
        b2 = Unit2D(192, (1, 7), name='Branch_2_Conv2d_0e_1x7')(b2)
        b3 = Unit2D(192, name='Branch_3_Conv2d_0b_1x1')(_avgpool_same(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = Unit2D(192, name='Branch_0_Conv2d_0a_1x1')(x)
        b0 = Unit2D(320, (3, 3), (2, 2), 'VALID',
                    name='Branch_0_Conv2d_1a_3x3')(b0)
        b1 = Unit2D(192, name='Branch_1_Conv2d_0a_1x1')(x)
        b1 = Unit2D(192, (1, 7), name='Branch_1_Conv2d_0b_1x7')(b1)
        b1 = Unit2D(192, (7, 1), name='Branch_1_Conv2d_0c_7x1')(b1)
        b1 = Unit2D(192, (3, 3), (2, 2), 'VALID',
                    name='Branch_1_Conv2d_1a_3x3')(b1)
        b2 = nn.max_pool(x, (3, 3), (2, 2), padding='VALID')
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionC(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = Unit2D(320, name='Branch_0_Conv2d_0a_1x1')(x)
        b1 = Unit2D(384, name='Branch_1_Conv2d_0a_1x1')(x)
        b1 = jnp.concatenate([
            Unit2D(384, (1, 3), name='Branch_1_Conv2d_0b_1x3')(b1),
            Unit2D(384, (3, 1), name='Branch_1_Conv2d_0c_3x1')(b1)],
            axis=-1)
        b2 = Unit2D(448, name='Branch_2_Conv2d_0a_1x1')(x)
        b2 = Unit2D(384, (3, 3), name='Branch_2_Conv2d_0b_3x3')(b2)
        b2 = jnp.concatenate([
            Unit2D(384, (1, 3), name='Branch_2_Conv2d_0c_1x3')(b2),
            Unit2D(384, (3, 1), name='Branch_2_Conv2d_0d_3x1')(b2)],
            axis=-1)
        b3 = Unit2D(192, name='Branch_3_Conv2d_0b_1x1')(_avgpool_same(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """[B, 299, 299, 3] in [-1, 1] -> pool_3 embedding [B, 2048]."""

    @nn.compact
    def __call__(self, x):
        x = Unit2D(32, (3, 3), (2, 2), 'VALID', name='Conv2d_1a_3x3')(x)
        x = Unit2D(32, (3, 3), padding='VALID', name='Conv2d_2a_3x3')(x)
        x = Unit2D(64, (3, 3), name='Conv2d_2b_3x3')(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding='VALID')
        x = Unit2D(80, (1, 1), padding='VALID', name='Conv2d_3b_1x1')(x)
        x = Unit2D(192, (3, 3), padding='VALID', name='Conv2d_4a_3x3')(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding='VALID')

        x = InceptionA(32, name='Mixed_5b')(x)
        x = InceptionA(64, name='Mixed_5c')(x)
        x = InceptionA(64, name='Mixed_5d')(x)
        x = ReductionA(name='Mixed_6a')(x)
        x = InceptionB(128, name='Mixed_6b')(x)
        x = InceptionB(160, name='Mixed_6c')(x)
        x = InceptionB(160, name='Mixed_6d')(x)
        x = InceptionB(192, name='Mixed_6e')(x)
        x = ReductionB(name='Mixed_7a')(x)
        x = InceptionC(name='Mixed_7b')(x)
        x = InceptionC(name='Mixed_7c')(x)

        return jnp.mean(x, axis=(1, 2))  # pool_3 [B, 2048]


def inception_preprocess(images01: jax.Array, size: int = 299) -> jax.Array:
    """[B,H,W,3] in [0,1] -> [-1,1] at 299px (slim preprocessing)."""
    b, h, w, c = images01.shape
    x = jax.image.resize(images01, (b, size, size, c), 'bilinear')
    return x * 2.0 - 1.0


def convert_slim_inception(var_dict: Dict[str, np.ndarray]
                           ) -> Dict[str, Any]:
    """TF-slim InceptionV3 variables -> flax {'params','batch_stats'}.

    Names like InceptionV3/Mixed_5b/Branch_0/Conv2d_0a_1x1/weights and
    .../BatchNorm/{beta,moving_mean,moving_variance}.  Conv kernels are
    [kh,kw,in,out] — identical layout to flax."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def assign(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for name, w in var_dict.items():
        parts = name.split('/')
        if parts[0] == 'InceptionV3':
            parts = parts[1:]
        if parts[0] in ('Logits', 'AuxLogits'):
            continue
        if parts[0].startswith('Mixed'):
            mod = [parts[0], f'{parts[1]}_{parts[2]}']
            rest = parts[3:]
        else:
            mod = [parts[0]]
            rest = parts[1:]
        if rest[0] == 'weights':
            assign(params, mod + ['conv', 'kernel'], w)
        elif rest[0] == 'BatchNorm':
            if rest[1] == 'beta':
                assign(params, mod + ['batch_norm', 'bias'],
                       np.asarray(w).reshape(-1))
            elif rest[1] == 'moving_mean':
                assign(stats, mod + ['batch_norm', 'mean'],
                       np.asarray(w).reshape(-1))
            elif rest[1] == 'moving_variance':
                assign(stats, mod + ['batch_norm', 'var'],
                       np.asarray(w).reshape(-1))
    return {'params': params, 'batch_stats': stats}


def load_inception_checkpoint(path: str) -> Dict[str, Any]:
    if path.endswith('.npz'):
        var_dict = dict(np.load(path))
    else:
        import tensorflow.compat.v1 as tf
        reader = tf.train.load_checkpoint(path)
        var_dict = {n: reader.get_tensor(n)
                    for n in reader.get_variable_to_shape_map()}
    return convert_slim_inception(var_dict)
