"""Fused to_logits head + Gumbel-multinomial sampling epilogue (Pallas).

Every mask-predict step ends with: LayerNorm -> Dense(768 -> 1024 vocab) ->
gumbel-noise -> categorical sample + chosen-token probability
(dalle_bert.py:527-538 sample_multinomial; repo sampler._sample_multinomial).
Unfused, that round-trips several [B, 512, 1024] fp32 arrays through HBM per
step (~100 MB of traffic at batch 16, x20 steps).  This kernel computes the
whole epilogue per row-block in VMEM: the logits never reach HBM — only the
sampled token ids [M] and their probabilities [M] do.

Math per row (matches sampler._sample_multinomial exactly in distribution):
    h       = LN(x) @ W + b                    (the to_logits head)
    noised  = h + temp * G1                    (G1 ~ Gumbel iid)
    tok     = argmax(noised + G2)              (G2 ~ Gumbel iid: categorical
                                                over softmax(noised))
    Y       = exp(noised[tok] - logsumexp(noised))

Gumbel noise is generated IN-KERNEL from the TPU PRNG (no [M, V] noise
arrays): u = (bits >> 8) * 2^-24 + 2^-25 in (0,1), g = -log(-log(u)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gumbel_from_bits(bits, eps=1e-20):
    # uniform in (0,1): 24 high bits scaled + half-ulp offset (never 0 or 1).
    # uint32->float32 doesn't lower on Mosaic; the 24-bit value fits int32.
    u = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
         * (1.0 / (1 << 24)) + (1.0 / (1 << 25)))
    return -jnp.log(-jnp.log(u + eps) + eps)


def _make_kernel(blk_m: int, vocab: int):
    def kernel(seed_ref, temp_ref, x_ref, lns_ref, lnb_ref, w_ref, b_ref,
               tok_ref, y_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        x = x_ref[:].astype(jnp.float32)                    # [M, D]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        h = h * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(
            jnp.float32)
        logits = jnp.dot(h.astype(w_ref.dtype), w_ref[:],
                         preferred_element_type=jnp.float32)
        logits = logits + b_ref[:].astype(jnp.float32)      # [M, V]

        g1 = _gumbel_from_bits(pltpu.bitcast(
            pltpu.prng_random_bits((blk_m, vocab)), jnp.uint32))
        noised = logits + temp_ref[0] * g1
        g2 = _gumbel_from_bits(pltpu.bitcast(
            pltpu.prng_random_bits((blk_m, vocab)), jnp.uint32))
        tok = jnp.argmax(noised + g2, axis=-1).astype(jnp.int32)  # [M]

        m = jnp.max(noised, axis=-1, keepdims=True)
        lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(noised - m), axis=-1))
        lanes = jax.lax.broadcasted_iota(jnp.int32, (blk_m, vocab), 1)
        chosen = jnp.sum(jnp.where(lanes == tok[:, None], noised, 0.0),
                         axis=-1)
        y = jnp.exp(chosen - lse)                           # [M]

        tok_ref[:] = jnp.broadcast_to(tok[:, None], (blk_m, 128))
        y_ref[:] = jnp.broadcast_to(y[:, None], (blk_m, 128))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=('blk_m', 'interpret'))
def fused_sample_head(x, ln_scale, ln_bias, w, b, temp, seed,
                      blk_m: int = 256, interpret: bool = False):
    """x [M, D] hidden rows; LN params [D]; w [D, V]; b [V]; temp scalar;
    seed uint32 scalar.  Returns (Y [M] fp32, tok [M] int32).

    M must be a multiple of blk_m; V a multiple of 128."""
    m_total, d = x.shape
    vocab = w.shape[1]
    assert m_total % blk_m == 0, (m_total, blk_m)
    assert vocab % 128 == 0, vocab

    grid = (m_total // blk_m,)
    row_spec = pl.BlockSpec((blk_m, d), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((d,), lambda i, *_: (0,), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((d, vocab), lambda i, *_: (0, 0),
                       memory_space=pltpu.VMEM)
    vec_v = pl.BlockSpec((vocab,), lambda i, *_: (0,), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((blk_m, 128), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    tok, y = pl.pallas_call(
        _make_kernel(blk_m, vocab),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[row_spec, vec_d, vec_d, mat, vec_v],
            out_specs=[out_spec, out_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m_total, 128), jnp.int32),
            jax.ShapeDtypeStruct((m_total, 128), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.uint32).reshape(1),
      jnp.asarray(temp, jnp.float32).reshape(1),
      x, ln_scale, ln_bias, w, b)
    return y[:, 0], tok[:, 0]
