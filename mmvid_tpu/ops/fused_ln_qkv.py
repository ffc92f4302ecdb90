"""Fused LayerNorm + QKV projection Pallas kernel.

Profiling the sampler showed the fp32 LayerNorm convert+reduce fusions are
its largest cost (~39% of device time).  This kernel reads the residual
stream once per batch element, computes fp32 LN statistics on-chip, and
feeds the normalized activations straight into the three projection
matmuls — no fp32 LN output ever reaches HBM.  The projection weights use
constant index maps, so Mosaic keeps them VMEM-resident across the batch
grid instead of re-fetching per program.

Enabled with MMVID_FUSED_LNQKV=1 (requires MMVID_PALLAS_ATTN=1's kernel for
the attention itself); numerics: LN statistics fp32 (matching the model's
fp32 LN islands), matmuls in the input dtype with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sc_ref, bi_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, q_ref, k_ref, v_ref):
    x = x_ref[0].astype(jnp.float32)                    # [L, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    h = (h * sc_ref[:] + bi_ref[:]).astype(x_ref.dtype)  # back to compute dt

    def proj(w_ref, b_ref, o_ref):
        o = jax.lax.dot_general(
            h, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (o + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    proj(wq_ref, bq_ref, q_ref)
    proj(wk_ref, bk_ref, k_ref)
    proj(wv_ref, bv_ref, v_ref)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_ln_qkv(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                 interpret: bool = False):
    """x [B,L,D] -> (q, k, v) [B,L,D] with fp32-stat LN fused in.

    D must be a 128 multiple (768 for the flagship); L padded to sublanes.
    """
    b, l, d = x.shape
    assert d % 128 == 0, f'feature dim {d} must be a lane multiple'
    lp = -(-l // 16) * 16
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))

    row = lambda a: a.reshape(1, d)
    full = lambda i: (0, 0)
    wspec = pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[xspec, rspec, rspec, wspec, rspec, wspec, rspec, wspec,
                  rspec],
        out_specs=(xspec, xspec, xspec),
        out_shape=tuple(jax.ShapeDtypeStruct((b, lp, d), x.dtype)
                        for _ in range(3)),
        interpret=interpret,
    )(x, row(ln_scale), row(ln_bias), wq, row(bq), wk, row(bk), wv,
      row(bv))
    q, k, v = out
    return q[:, :l], k[:, :l], v[:, :l]
