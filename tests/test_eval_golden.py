"""Synthetic-golden validation of the eval-stack conversion paths.

Real kinetics/torchvision weights are unavailable in this environment, so
each JAX port is checked against an INDEPENDENT torch/numpy re-implementation
of the same architecture on shared random weights — this catches exactly the
class of bugs (TF SAME padding, BN epsilon, resize coordinate mapping,
layer-plan mistakes) that survive shape-only tests.

Oracles:
* I3D — torch Conv3d/BatchNorm with TF SAME padding semantics
  (kinetics-i3d Unit3D: BN center-only, eps 1e-3), vs mmvid_tpu.eval.i3d.
* LPIPS-VGG16 — torch port of taming lpips.py:11-124 (scaling layer,
  channel-normalized diffs, shipped lin weights), vs mmvid_tpu.models.lpips.
* TF1 legacy bilinear resize — numpy loop implementation of the
  align_corners=False, half_pixel_centers=False mapping, vs
  fvd.tf1_resize_bilinear.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# TF SAME helpers (torch side)
# ---------------------------------------------------------------------------

def _same_pads(size, k, s):
    """TF SAME padding (begin, end) for one dim."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def _pad3d(x, kernel, strides, value=0.0):
    import torch.nn.functional as F
    d, h, w = x.shape[2:]
    pd = _same_pads(d, kernel[0], strides[0])
    ph = _same_pads(h, kernel[1], strides[1])
    pw = _same_pads(w, kernel[2], strides[2])
    # F.pad order: (w_lo, w_hi, h_lo, h_hi, d_lo, d_hi)
    return F.pad(x, (pw[0], pw[1], ph[0], ph[1], pd[0], pd[1]), value=value)


def _conv3d_same(x, kernel, bias, strides):
    import torch
    import torch.nn.functional as F
    w = torch.from_numpy(np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2))
                         .copy())
    b = torch.from_numpy(np.asarray(bias).copy()) if bias is not None \
        else None
    x = _pad3d(x, w.shape[2:], strides)
    return F.conv3d(x, w, b, stride=strides)


def _maxpool3d_same(x, kernel, strides):
    import torch.nn.functional as F
    x = _pad3d(x, kernel, strides, value=float('-inf'))
    return F.max_pool3d(x, kernel, stride=strides)


def _torch_unit3d(x, p, stats=None, strides=(1, 1, 1), act=True, eps=1e-3):
    import torch
    conv = p['conv_3d']
    x = _conv3d_same(x, conv['kernel'], conv.get('bias'), strides)
    if stats is not None:
        mean = torch.from_numpy(np.asarray(stats['batch_norm']['mean']))
        var = torch.from_numpy(np.asarray(stats['batch_norm']['var']))
        beta = torch.from_numpy(np.asarray(p['batch_norm']['bias']))
        sh = (1, -1, 1, 1, 1)
        x = (x - mean.view(sh)) / torch.sqrt(var.view(sh) + eps) \
            + beta.view(sh)
    if act:
        x = x.clamp(min=0)
    return x


def _torch_inception(x, p, s, name):
    import torch
    b0 = _torch_unit3d(x, p[f'{name}']['Branch_0_Conv3d_0a_1x1'],
                       s[f'{name}']['Branch_0_Conv3d_0a_1x1'])
    b1 = _torch_unit3d(x, p[name]['Branch_1_Conv3d_0a_1x1'],
                       s[name]['Branch_1_Conv3d_0a_1x1'])
    b1 = _torch_unit3d(b1, p[name]['Branch_1_Conv3d_0b_3x3'],
                       s[name]['Branch_1_Conv3d_0b_3x3'])
    b2 = _torch_unit3d(x, p[name]['Branch_2_Conv3d_0a_1x1'],
                       s[name]['Branch_2_Conv3d_0a_1x1'])
    b2 = _torch_unit3d(b2, p[name]['Branch_2_Conv3d_0b_3x3'],
                       s[name]['Branch_2_Conv3d_0b_3x3'])
    b3 = _maxpool3d_same(x, (3, 3, 3), (1, 1, 1))
    b3 = _torch_unit3d(b3, p[name]['Branch_3_Conv3d_0b_1x1'],
                       s[name]['Branch_3_Conv3d_0b_1x1'])
    return torch.cat([b0, b1, b2, b3], dim=1)


def _torch_i3d(videos, variables):
    """Independent torch forward of the kinetics-i3d architecture.
    videos [B,T,H,W,3] numpy -> [B,400] numpy."""
    import torch
    import torch.nn.functional as F
    p, s = variables['params'], variables['batch_stats']
    x = torch.from_numpy(np.transpose(videos, (0, 4, 1, 2, 3)).copy())
    with torch.no_grad():
        x = _torch_unit3d(x, p['Conv3d_1a_7x7'], s['Conv3d_1a_7x7'],
                          strides=(2, 2, 2))
        x = _maxpool3d_same(x, (1, 3, 3), (1, 2, 2))
        x = _torch_unit3d(x, p['Conv3d_2b_1x1'], s['Conv3d_2b_1x1'])
        x = _torch_unit3d(x, p['Conv3d_2c_3x3'], s['Conv3d_2c_3x3'])
        x = _maxpool3d_same(x, (1, 3, 3), (1, 2, 2))
        x = _torch_inception(x, p, s, 'Mixed_3b')
        x = _torch_inception(x, p, s, 'Mixed_3c')
        x = _maxpool3d_same(x, (3, 3, 3), (2, 2, 2))
        for blk in ('Mixed_4b', 'Mixed_4c', 'Mixed_4d', 'Mixed_4e',
                    'Mixed_4f'):
            x = _torch_inception(x, p, s, blk)
        x = _maxpool3d_same(x, (2, 2, 2), (2, 2, 2))
        x = _torch_inception(x, p, s, 'Mixed_5b')
        x = _torch_inception(x, p, s, 'Mixed_5c')
        x = F.avg_pool3d(x, (2, 7, 7), stride=(1, 1, 1))
        x = _torch_unit3d(x, p['Logits_Conv3d_0c_1x1'], None, act=False)
        x = x.squeeze(4).squeeze(3)            # [B, C, T']
        return x.mean(dim=2).numpy()


@pytest.mark.slow
def test_i3d_matches_independent_torch_oracle():
    """Full-network activation parity on shared random weights: catches TF
    SAME padding, BN-eps, and layer-plan bugs that shape tests miss
    (VERDICT round-1 item 3)."""
    from mmvid_tpu.eval.i3d import I3D

    model = I3D()
    x = np.random.RandomState(0).uniform(
        -1, 1, (1, 9, 224, 224, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    variables = jax.tree_util.tree_map(np.asarray, variables)

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    ref = _torch_i3d(x, variables)
    assert ours.shape == ref.shape == (1, 400)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# LPIPS / VGG16
# ---------------------------------------------------------------------------

def _torch_vgg16_features(x, sd):
    """torchvision-layout VGG16.features forward (torch), returning the 5
    LPIPS slices (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)."""
    import torch
    import torch.nn.functional as F
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    pool_before = {5, 10, 17, 24}   # torchvision pools sit at 4, 9, 16, 23
    slice_after = {2, 7, 14, 21, 28}
    feats = []
    h = x
    for t in tv_idx:
        if t in pool_before:
            h = F.max_pool2d(h, 2, 2)
        w = torch.from_numpy(np.asarray(sd[f'features.{t}.weight']))
        b = torch.from_numpy(np.asarray(sd[f'features.{t}.bias']))
        h = F.conv2d(h, w, b, padding=1)
        h = F.relu(h)
        if t in slice_after:
            feats.append(h)
    return feats


def test_lpips_vgg16_matches_torch_oracle():
    """convert_vgg16 + LPIPS vs a direct torch port of taming
    lpips.py:11-124 on shared random VGG weights and the SHIPPED lin
    calibration weights."""
    import torch
    from mmvid_tpu.models.lpips import (
        _SCALE, _SHIFT, LPIPS, convert_vgg16, load_lpips_lin_weights)

    rng = np.random.RandomState(3)
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    sd = {}
    cin = 3
    for t, co in zip(tv_idx, chans):
        sd[f'features.{t}.weight'] = (
            rng.randn(co, cin, 3, 3) / np.sqrt(cin * 9)).astype(np.float32)
        sd[f'features.{t}.bias'] = (rng.randn(co) * 0.1).astype(np.float32)
        cin = co

    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    lin = load_lpips_lin_weights()

    # torch oracle (taming lpips.py math)
    with torch.no_grad():
        def prep(a):
            a = (a - _SHIFT) / _SCALE
            return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

        fx = _torch_vgg16_features(prep(x), sd)
        fy = _torch_vgg16_features(prep(y), sd)
        total = torch.zeros(2)
        for k in range(5):
            na = fx[k] / fx[k].pow(2).sum(1, keepdim=True).sqrt().clamp(
                min=1e-10)
            nb = fy[k] / fy[k].pow(2).sum(1, keepdim=True).sqrt().clamp(
                min=1e-10)
            d = (na - nb) ** 2
            w = torch.from_numpy(np.asarray(lin[k])).view(1, -1, 1, 1)
            total = total + (d * w).sum(1).mean(dim=(1, 2))
        ref = total.numpy()

    ours = np.asarray(LPIPS(vgg_params=convert_vgg16(sd),
                            lin_weights=lin)(jnp.asarray(x),
                                             jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# TF1 legacy bilinear resize
# ---------------------------------------------------------------------------

def test_tf1_resize_bilinear_matches_legacy_formula():
    """numpy loop oracle of TF1 resize_bilinear (align_corners=False,
    half_pixel_centers=False): src = dst * scale, edge-clamped."""
    from mmvid_tpu.eval.fvd import tf1_resize_bilinear

    rng = np.random.RandomState(5)
    img = rng.uniform(0, 1, (1, 5, 7, 2)).astype(np.float32)
    th, tw = 11, 4
    h, w = img.shape[1:3]
    exp = np.zeros((1, th, tw, 2), np.float32)
    for oy in range(th):
        sy = oy * (h / th)
        y0, wy = int(np.floor(sy)), sy - int(np.floor(sy))
        y1 = min(y0 + 1, h - 1)
        for ox in range(tw):
            sx = ox * (w / tw)
            x0, wx = int(np.floor(sx)), sx - int(np.floor(sx))
            x1 = min(x0 + 1, w - 1)
            top = img[0, y0, x0] * (1 - wx) + img[0, y0, x1] * wx
            bot = img[0, y1, x0] * (1 - wx) + img[0, y1, x1] * wx
            exp[0, oy, ox] = top * (1 - wy) + bot * wy

    got = np.asarray(tf1_resize_bilinear(jnp.asarray(img), th, tw))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)

    # identity when sizes match
    same = np.asarray(tf1_resize_bilinear(jnp.asarray(img), h, w))
    np.testing.assert_allclose(same, img, atol=1e-6)
