"""I3D (Inflated 3D Inception-v1, kinetics-400) in Flax — the FVD embedding
network.

Replaces the reference's frozen TF1 graph from
tfhub.dev/deepmind/i3d-kinetics-400/1 (frechet_video_distance.py:64-122).
The FVD endpoint is ``RGB/inception_i3d/Mean:0``: spatially-pooled logits
averaged over time, a 400-d vector per video.

Architecture (DeepMind kinetics-i3d): Unit3D = Conv3D(no bias) +
BatchNorm(center only, eps 1e-3) + ReLU; Inception branches with the
standard GoogLeNet channel plan; SAME-padded max pools.  Input is
[B, T, 224, 224, 3] in [-1, 1] (NDHWC — TF's native layout, which is also
TPU-friendly).

Weights: convert a TF-Hub checkpoint with `convert_tfhub_i3d` when one is
available on disk; the module also runs with random weights for pipeline
tests (FVD numbers then are not comparable to the reference's).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (b0_1x1, b1_1x1, b1_3x3, b2_1x1, b2_3x3, b3_1x1) per Mixed block
_INCEPTION_PLAN = {
    'Mixed_3b': (64, 96, 128, 16, 32, 32),
    'Mixed_3c': (128, 128, 192, 32, 96, 64),
    'Mixed_4b': (192, 96, 208, 16, 48, 64),
    'Mixed_4c': (160, 112, 224, 24, 64, 64),
    'Mixed_4d': (128, 128, 256, 24, 64, 64),
    'Mixed_4e': (112, 144, 288, 32, 64, 64),
    'Mixed_4f': (256, 160, 320, 32, 128, 128),
    'Mixed_5b': (256, 160, 320, 32, 128, 128),
    'Mixed_5c': (384, 192, 384, 48, 128, 128),
}


class Unit3D(nn.Module):
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel, strides=self.strides,
                    padding='SAME', use_bias=self.use_bias,
                    name='conv_3d')(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, use_bias=True,
                             use_scale=False, epsilon=1e-3,
                             name='batch_norm')(x)
        if self.activation:
            x = nn.relu(x)
        return x


def _maxpool(x, window, strides):
    return nn.max_pool(x, window_shape=window, strides=strides,
                       padding='SAME')


class InceptionBlock(nn.Module):
    plan: Tuple[int, int, int, int, int, int]

    @nn.compact
    def __call__(self, x):
        b0, b1a, b1b, b2a, b2b, b3 = self.plan
        br0 = Unit3D(b0, name='Branch_0_Conv3d_0a_1x1')(x)
        br1 = Unit3D(b1a, name='Branch_1_Conv3d_0a_1x1')(x)
        br1 = Unit3D(b1b, (3, 3, 3), name='Branch_1_Conv3d_0b_3x3')(br1)
        br2 = Unit3D(b2a, name='Branch_2_Conv3d_0a_1x1')(x)
        br2 = Unit3D(b2b, (3, 3, 3), name='Branch_2_Conv3d_0b_3x3')(br2)
        br3 = _maxpool(x, (3, 3, 3), (1, 1, 1))
        br3 = Unit3D(b3, name='Branch_3_Conv3d_0b_1x1')(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


class I3D(nn.Module):
    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        """x [B, T, 224, 224, 3] in [-1, 1] -> logits [B, num_classes]."""
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name='Conv3d_1a_7x7')(x)
        x = _maxpool(x, (1, 3, 3), (1, 2, 2))      # MaxPool3d_2a_3x3
        x = Unit3D(64, name='Conv3d_2b_1x1')(x)
        x = Unit3D(192, (3, 3, 3), name='Conv3d_2c_3x3')(x)
        x = _maxpool(x, (1, 3, 3), (1, 2, 2))      # MaxPool3d_3a_3x3
        x = InceptionBlock(_INCEPTION_PLAN['Mixed_3b'], name='Mixed_3b')(x)
        x = InceptionBlock(_INCEPTION_PLAN['Mixed_3c'], name='Mixed_3c')(x)
        x = _maxpool(x, (3, 3, 3), (2, 2, 2))      # MaxPool3d_4a_3x3
        for blk in ('Mixed_4b', 'Mixed_4c', 'Mixed_4d', 'Mixed_4e',
                    'Mixed_4f'):
            x = InceptionBlock(_INCEPTION_PLAN[blk], name=blk)(x)
        x = _maxpool(x, (2, 2, 2), (2, 2, 2))      # MaxPool3d_5a_2x2
        x = InceptionBlock(_INCEPTION_PLAN['Mixed_5b'], name='Mixed_5b')(x)
        x = InceptionBlock(_INCEPTION_PLAN['Mixed_5c'], name='Mixed_5c')(x)

        # Logits endpoint: avg-pool (2,7,7) VALID, 1x1x1 conv with bias,
        # squeeze spatial, mean over time -> the FVD 'Mean:0' tensor.
        x = nn.avg_pool(x, window_shape=(2, 7, 7), strides=(1, 1, 1),
                        padding='VALID')
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   use_bias=True, name='Logits_Conv3d_0c_1x1')(x)
        x = x.squeeze(axis=(2, 3))                 # [B, T', C]
        return jnp.mean(x, axis=1)


def i3d_embed(params, videos, num_classes: int = 400):
    """videos [B,T,224,224,3] in [-1,1] -> [B,400] FVD activations."""
    model = I3D(num_classes=num_classes)
    return model.apply(params, videos)


# ---------------------------------------------------------------------------
# TF-Hub weight conversion
# ---------------------------------------------------------------------------

def convert_tfhub_i3d(var_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """TF-Hub i3d-kinetics-400 variables -> flax {'params','batch_stats'}.

    var_dict maps names like
    ``RGB/inception_i3d/Mixed_3b/Branch_0/Conv3d_0a_1x1/conv_3d/w`` (and
    ``batch_norm/{beta,moving_mean,moving_variance}``) to arrays.  TF conv3d
    kernels are [kd,kh,kw,in,out] — identical to flax; copied verbatim.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def assign(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for name, w in var_dict.items():
        parts = name.split('/')
        if parts[0] == 'RGB':
            parts = parts[1:]
        if parts[0] == 'inception_i3d':
            parts = parts[1:]
        # ['Mixed_3b', 'Branch_0', 'Conv3d_0a_1x1', 'conv_3d', 'w'] or
        # ['Conv3d_1a_7x7', 'conv_3d', 'w'] or ['Logits', 'Conv3d_0c_1x1',..]
        if parts[0].startswith('Mixed'):
            mod = [parts[0], f'{parts[1]}_{parts[2]}']
            rest = parts[3:]
        elif parts[0] == 'Logits':
            mod = [f'Logits_{parts[1]}']
            rest = parts[2:]
        else:
            mod = [parts[0]]
            rest = parts[1:]
        if rest[0] == 'conv_3d':
            leaf = {'w': 'kernel', 'b': 'bias'}[rest[1]]
            assign(params, mod + ['conv_3d', leaf], w)
        elif rest[0] == 'batch_norm':
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


def load_i3d_checkpoint(path: str) -> Dict[str, Any]:
    """Load a saved TF-Hub i3d checkpoint (a TF checkpoint dir/file or an
    .npz of its variables) and convert to flax trees."""
    if path.endswith('.npz'):
        var_dict = dict(np.load(path))
    else:
        import tensorflow.compat.v1 as tf
        reader = tf.train.load_checkpoint(path)
        var_dict = {n: reader.get_tensor(n)
                    for n in reader.get_variable_to_shape_map()}
    return convert_tfhub_i3d(var_dict)
