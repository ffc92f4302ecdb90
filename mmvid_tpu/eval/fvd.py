"""Fréchet Video Distance: preprocessing + Gaussian Fréchet math.

Parity targets:
* preprocess: bilinear resize to 224x224 + scale [0,1] -> [-1,1]
  (frechet_video_distance/frechet_video_distance.py:34-52)
* ping-pong extension of short clips to 15/16 frames before embedding
  (utils/utils_eval.py:17-28,177-183)
* FVD = |m1-m2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2)), the
  tfgan.eval.frechet_classifier_distance_from_activations math
  (frechet_video_distance.py:125-134)

The I3D embedding network lives in mmvid_tpu.eval.i3d (a JAX port replacing
the reference's frozen TF1 graph).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def tf1_resize_bilinear(images: jax.Array, th: int, tw: int) -> jax.Array:
    """TF1 legacy bilinear resize (align_corners=False,
    half_pixel_centers=False): src = dst * (in/out), edges clamped.

    The reference FVD preprocess uses tf.image.resize_bilinear with TF1
    defaults (frechet_video_distance.py:47-48), which is NOT the half-pixel
    mapping jax.image.resize implements — FVD is sensitive to exactly this
    kind of preprocessing detail (SURVEY.md §7 hard part 4)."""
    b, h, w, c = images.shape
    ys = jnp.arange(th, dtype=jnp.float32) * (h / th)
    xs = jnp.arange(tw, dtype=jnp.float32) * (w / tw)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]

    def ix(rows):
        a = jnp.take(rows, x0, axis=2)
        b_ = jnp.take(rows, x1, axis=2)
        return a * (1.0 - wx) + b_ * wx

    top = ix(jnp.take(images, y0, axis=1))
    bot = ix(jnp.take(images, y1, axis=1))
    return top * (1.0 - wy) + bot * wy


def preprocess_videos(videos: jax.Array,
                      target_resolution=(224, 224)) -> jax.Array:
    """[B,T,H,W,3] in [0,1] -> [B,T,224,224,3] in [-1,1] (TF1-legacy
    bilinear, matching the reference graph exactly)."""
    b, t, h, w, c = videos.shape
    th, tw = target_resolution
    flat = videos.reshape(b * t, h, w, c)
    resized = tf1_resize_bilinear(flat, th, tw)
    return resized.reshape(b, t, th, tw, c) * 2.0 - 1.0


def pingpong_indices(t: int, target_len: int) -> np.ndarray:
    """Frame indices that ping-pong a T-frame clip to target_len
    (utils/utils_eval.py:17-28) — static, so the extension can run as an
    on-device gather (evaluate() embeds generated videos without a host
    round-trip)."""
    if t >= target_len:
        return np.arange(target_len)
    if t == 1:  # ping-pong of a single frame = repeat it
        return np.zeros(target_len, dtype=np.int64)
    idx = []
    direction = 1
    i = 0
    while len(idx) < target_len:
        idx.append(i)
        if i == t - 1 and direction == 1:
            direction = -1
        elif i == 0 and direction == -1:
            direction = 1
        i += direction
    return np.asarray(idx)


def extend_video_pingpong(video: np.ndarray, target_len: int = 15
                          ) -> np.ndarray:
    """Ping-pong a [T,...] clip to target_len frames
    (utils/utils_eval.py:17-28): forward + reversed-interior repeats."""
    return video[pingpong_indices(video.shape[0], target_len)]


def frechet_distance(real_activations: np.ndarray,
                     generated_activations: np.ndarray) -> float:
    """Fréchet distance between Gaussians fit to two activation sets.

    Matches tfgan's frechet_classifier_distance_from_activations:
    tr(sqrt(S1 S2)) is computed from the eigenvalues of the symmetrized
    product S1^{1/2} S2 S1^{1/2} for numerical robustness.
    """
    x = np.asarray(real_activations, np.float64)
    y = np.asarray(generated_activations, np.float64)
    mx, my = x.mean(0), y.mean(0)
    # tfgan uses the unbiased covariance estimator
    sx = np.atleast_2d(np.cov(x, rowvar=False))
    sy = np.atleast_2d(np.cov(y, rowvar=False))

    # sqrt(Sx) via symmetric eigendecomposition
    ex, vx = np.linalg.eigh(sx)
    ex = np.clip(ex, 0, None)
    sqrt_sx = (vx * np.sqrt(ex)[None, :]) @ vx.T
    prod = sqrt_sx @ sy @ sqrt_sx
    eigs = np.linalg.eigvalsh((prod + prod.T) / 2.0)
    trace_sqrt = np.sum(np.sqrt(np.clip(eigs, 0, None)))

    d2 = float(np.sum((mx - my) ** 2) + np.trace(sx) + np.trace(sy)
               - 2.0 * trace_sqrt)
    return d2
