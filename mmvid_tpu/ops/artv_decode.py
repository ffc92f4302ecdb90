"""Whole-token-step ART-V decode Pallas kernel: all transformer blocks
of one AR decode step in ONE program.

Why: the AR decode wall is a serial chain of ~150 small XLA ops per token
(ROADMAP round 3) — each weight/cache read is too short to reach HBM
bandwidth (measured: weight stream 2.1x off roofline, cache stream 4.2x
off; the cache's [.., heads=12, hd=64] minor dims also force a padded
(16, 128) tiled layout, ~2.7x physical blowup).  A first attempt with
one kernel PER BLOCK (24 calls/token) measured 6x SLOWER than XLA —
per-call overhead dominates at ~20 us of useful work per call.  So the
structure is inverted: ONE pallas_call per token runs the entire
12-layer stack as a (layer, phase) grid, with every weight streamed as a
pipelined grid block and the K/V caches streamed lane-dense
[n_layers, B, Wpad, D] in flash-decode chunks.

Per layer the phase schedule is

  ph 0,1,2          LN(x) @ Wq / Wk / Wv   (one [D, D] block each)
  ph 3..3+nc-1      flash-decode over cache chunks (online softmax;
                    chunks whose rows are all >= pos are skipped by
                    CLAMPING the chunk index in the index_map — a
                    repeated block index costs no new DMA)
  ph 3+nc           ctx @ Wout, residual, LN2
  ph 3+nc+1..+4     MLP in 4 column/row chunks: x += silu(h2 @ Wfc_c)
                    @ Wproj_c   (Wfc column- and Wproj row-chunks pair
                    per phase, so no single buffer exceeds [D, D])

The residual stream x lives in VMEM scratch across the whole grid; the
only HBM traffic is the weight/cache stream itself — which is exactly
the decode step's roofline.  Every buffer stays under the ~19 MB
scoped-VMEM ceiling measured on v5e.

Attention math on the MXU: per sample b, chunk logits are
``K_chunk [C, D] @ Qexp_b [D, HP]`` where ``Qexp_b`` is the query
expanded block-diagonally per head (Qexp[j, h] = q[j] if j//hd == h else
0, HP = heads padded to 128 lanes) — one real matmul instead of a
batched per-head matvec.  The AV product is the transpose-free
``dot_general(V_chunk [C, D], P [C, HP], contract C) -> [D, HP]``
followed by the same block-diag selection.  Probabilities are cast to
the cache dtype for the AV matmul, exactly like the XLA path
(models/artv.py::block_step) casts ``attn.astype(dt)``.

The CURRENT token's k/v never touch the cache inside the kernel: its
attention contribution seeds the online-softmax state, and the caller
updates the caches afterwards (one stacked dynamic_update_slice for all
layers per token).  Masked cache positions (>= pos) contribute exact
zeros, so windowed-segment growth (models/artv.py) composes unchanged.

Reference semantics: mmvid_pytorch/dalle_artv.py:258-281 (per-token AR
decode; the reference has no KV cache at all — SURVEY §3.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HP = 128  # head lanes (heads padded to one full lane tile)
MLP_CHUNKS = 4


def _ln(x, s, b):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * s + b


def _head_mask(d, hd, dtype):
    """[D, HP] block-diagonal selector: mask[j, h] = (j // hd == h)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, HP), 0) // hd
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, HP), 1)
    return (rows == cols).astype(dtype)


def _head_mask_t(d, hd, dtype):
    """[HP, D] transpose of _head_mask, built directly (no in-kernel
    transpose op)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (HP, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (HP, d), 1) // hd
    return (rows == cols).astype(dtype)


def _make_kernel(b: int, d: int, heads: int, chunk: int, n_chunks: int,
                 n_layers: int, n_ph: int):
    hd = d // heads

    def kernel(s_ref,  # [1] int32 scalar prefetch: (pos,)
               x_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
               wqkv_ref, bqkv_ref, wout_ref, bout_ref,
               wfc_ref, bfc_ref, wproj_ref, bproj_ref,
               kc_ref, vc_ref,
               y_ref, knew_ref, vnew_ref,
               x_s, h_s, q_s, m_s, l_s, acc_s, h2_s):
        layer = pl.program_id(0)
        ph = pl.program_id(1)
        pos = s_ref[0]
        maskf = _head_mask(d, hd, jnp.float32)

        @pl.when((layer == 0) & (ph == 0))
        def _init():
            x_s[:] = x_ref[:].astype(jnp.float32)

        @pl.when(ph == 0)
        def _q_phase():
            h_s[:] = _ln(x_s[:], ln1s_ref[0], ln1b_ref[0])
            q_s[:] = (jnp.dot(h_s[:].astype(wqkv_ref.dtype),
                              wqkv_ref[0, 0],
                              preferred_element_type=jnp.float32)
                      + bqkv_ref[0, 0]) * (hd ** -0.5)

        @pl.when(ph == 1)
        def _k_phase():
            k_new = jnp.dot(h_s[:].astype(wqkv_ref.dtype), wqkv_ref[0, 0],
                            preferred_element_type=jnp.float32
                            ) + bqkv_ref[0, 0]
            knew_ref[0] = k_new.astype(knew_ref.dtype)

        @pl.when(ph == 2)
        def _v_phase():
            v_new = jnp.dot(h_s[:].astype(wqkv_ref.dtype), wqkv_ref[0, 0],
                            preferred_element_type=jnp.float32
                            ) + bqkv_ref[0, 0]
            vnew_ref[0] = v_new.astype(vnew_ref.dtype)
            # current token seeds the online softmax (its p = exp(0) = 1)
            k_new = knew_ref[0].astype(jnp.float32)
            logits_cur = jnp.dot(q_s[:] * k_new, maskf,
                                 preferred_element_type=jnp.float32)
            m_s[:] = logits_cur
            l_s[:] = jnp.ones_like(l_s)
            acc_s[:] = v_new

        in_attn = (ph >= 3) & (ph < 3 + n_chunks)
        # chunks fully beyond the valid range were skipped by index
        # clamping (no DMA); skip their compute too
        live = in_attn & ((ph - 3) * chunk < pos)

        @pl.when(live)
        def _chunk_phase():
            ci = ph - 3
            maskc = _head_mask(d, hd, kc_ref.dtype)

            def body(bb, _):
                kc = kc_ref[0, pl.ds(bb, 1)][0]        # [C, D]
                vc = vc_ref[0, pl.ds(bb, 1)][0]
                qexp = (q_s[pl.ds(bb, 1)][0][:, None] * maskc
                        ).astype(kc.dtype)             # [D, HP]
                logits = jax.lax.dot_general(
                    kc, qexp, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [C, HP]
                gidx = ci * chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, HP), 0)
                logits = jnp.where(gidx < pos, logits, -1e9)
                m_old = m_s[pl.ds(bb, 1)]                    # [1, HP]
                m_new = jnp.maximum(
                    m_old, jnp.max(logits, axis=0, keepdims=True))
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(logits - m_new)                  # [C, HP]
                l_s[pl.ds(bb, 1)] = (l_s[pl.ds(bb, 1)] * corr
                                     + jnp.sum(p, axis=0, keepdims=True))
                m_s[pl.ds(bb, 1)] = m_new
                vp = jax.lax.dot_general(
                    vc, p.astype(vc.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [D, HP]
                contrib = jnp.sum(vp * maskf, axis=1)[None, :]
                corr_exp = jnp.sum(maskf * corr, axis=1)[None, :]
                acc_s[pl.ds(bb, 1)] = (acc_s[pl.ds(bb, 1)] * corr_exp
                                       + contrib)
                return 0

            jax.lax.fori_loop(0, b, body, 0)

        @pl.when(ph == 3 + n_chunks)
        def _out_phase():
            l_exp = jnp.dot(l_s[:], _head_mask_t(d, hd, jnp.float32),
                            preferred_element_type=jnp.float32)
            ctx = acc_s[:] / l_exp
            o = jnp.dot(ctx.astype(wout_ref.dtype), wout_ref[0],
                        preferred_element_type=jnp.float32) + bout_ref[0]
            x1 = x_s[:] + o
            h2_s[:] = _ln(x1, ln2s_ref[0], ln2b_ref[0])
            x_s[:] = x1

        @pl.when(ph > 3 + n_chunks)
        def _mlp_phase():
            f = jnp.dot(h2_s[:].astype(wfc_ref.dtype), wfc_ref[0, 0],
                        preferred_element_type=jnp.float32
                        ) + bfc_ref[0, 0]
            g = f * jax.nn.sigmoid(1.702 * f)
            x_s[:] = x_s[:] + jnp.dot(g.astype(wproj_ref.dtype),
                                      wproj_ref[0, 0],
                                      preferred_element_type=jnp.float32)

        @pl.when(ph == n_ph - 1)
        def _bproj_phase():
            # the 4 partial proj dots share ONE bias — add it once at the
            # layer's last phase (the XLA path adds it in its single dot)
            x_s[:] = x_s[:] + bproj_ref[0]

        @pl.when((layer == n_layers - 1) & (ph == n_ph - 1))
        def _final():
            y_ref[:] = x_s[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=('heads', 'chunk', 'interpret'))
def _call(x, stacked, cache_k, cache_v, scalars, *, heads, chunk,
          interpret):
    n_layers, b, wpad, d = cache_k.shape
    n_chunks = wpad // chunk
    n_ph = 3 + n_chunks + 1 + MLP_CHUNKS
    dt = cache_k.dtype

    def per_layer(shape):
        # one block per layer, constant across phases
        return pl.BlockSpec((1,) + shape, lambda l, ph, s: (l,) + (0,) *
                            len(shape), memory_space=pltpu.VMEM)

    qkv_spec = pl.BlockSpec(
        (1, 1, d, d),
        lambda l, ph, s: (l, jnp.minimum(ph, 2), 0, 0),
        memory_space=pltpu.VMEM)
    bqkv_spec = pl.BlockSpec(
        (1, 1, 1, d),
        lambda l, ph, s: (l, jnp.minimum(ph, 2), 0, 0),
        memory_space=pltpu.VMEM)

    def mlp_idx(l, ph, s):
        c = jnp.clip(ph - (3 + n_chunks + 1), 0, MLP_CHUNKS - 1)
        return (l, c, 0, 0)

    fc_spec = pl.BlockSpec((1, 1, d, d), mlp_idx, memory_space=pltpu.VMEM)
    bfc_spec = pl.BlockSpec((1, 1, 1, d), mlp_idx,
                            memory_space=pltpu.VMEM)
    proj_spec = pl.BlockSpec((1, 1, d, d), mlp_idx,
                             memory_space=pltpu.VMEM)

    def cache_idx(l, ph, s):
        # clamp: before/after the attention phases, and beyond the last
        # LIVE chunk ((pos-1)//chunk), repeat an index — repeated block
        # indices cost no new DMA
        ci = jnp.clip(ph - 3, 0, n_chunks - 1)
        last_live = jnp.maximum(s[0] - 1, 0) // chunk
        return (l, 0, jnp.minimum(ci, last_live), 0)

    cache_spec = pl.BlockSpec((1, b, chunk, d), cache_idx,
                              memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((b, d), lambda l, ph, s: (0, 0),
                          memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec((1, b, d), lambda l, ph, s: (l, 0, 0),
                               memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_layers, n_ph),
        in_specs=[
            x_spec,
            per_layer((1, d)), per_layer((1, d)),   # ln1 scale/bias
            per_layer((1, d)), per_layer((1, d)),   # ln2 scale/bias
            qkv_spec, bqkv_spec,
            per_layer((d, d)), per_layer((1, d)),   # wout, bout
            fc_spec, bfc_spec, proj_spec,
            per_layer((1, d)),                      # bproj (in x via prep)
            cache_spec, cache_spec,
        ],
        out_specs=[x_spec, kv_out_spec, kv_out_spec],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),     # x (residual stream)
            pltpu.VMEM((b, d), jnp.float32),     # h = LN1(x)
            pltpu.VMEM((b, d), jnp.float32),     # scaled query
            pltpu.VMEM((b, HP), jnp.float32),    # running max
            pltpu.VMEM((b, HP), jnp.float32),    # running denom
            pltpu.VMEM((b, d), jnp.float32),     # attention accumulator
            pltpu.VMEM((b, d), jnp.float32),     # h2 = LN2(x1)
        ],
    )
    y, k_new, v_new = pl.pallas_call(
        _make_kernel(b, d, heads, chunk, n_chunks, n_layers, n_ph),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, d), jnp.float32),
                   jax.ShapeDtypeStruct((n_layers, b, d), dt),
                   jax.ShapeDtypeStruct((n_layers, b, d), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scalars, x, *stacked, cache_k, cache_v)
    return y, k_new, v_new


def stack_decode_params(dec_blocks, d: int):
    """Restack per-layer dec-block params (models/artv.py dec_blocks
    layout: fused [D, 3D] qkv) into the grid-blocked arrays the token
    kernel streams — [n_layers, ...] leading axes with the qkv/fc/proj
    kernels pre-split into their per-phase [D, D] blocks.  Computed once
    per trace, outside the decode scan.
    """

    def stk(fn):
        return jnp.stack([fn(p) for p in dec_blocks])

    ln1s = stk(lambda p: p['ln_1']['scale'].astype(jnp.float32
                                                   ).reshape(1, -1))
    ln1b = stk(lambda p: p['ln_1']['bias'].astype(jnp.float32
                                                  ).reshape(1, -1))
    ln2s = stk(lambda p: p['ln_2']['scale'].astype(jnp.float32
                                                   ).reshape(1, -1))
    ln2b = stk(lambda p: p['ln_2']['bias'].astype(jnp.float32
                                                  ).reshape(1, -1))
    wqkv = stk(lambda p: jnp.moveaxis(
        p['attn']['qkv']['kernel'].reshape(d, 3, d), 1, 0))   # [3, D, D]
    bqkv = stk(lambda p: p['attn']['qkv']['bias'].astype(
        jnp.float32).reshape(3, 1, d))
    wout = stk(lambda p: p['attn']['out']['kernel'])
    bout = stk(lambda p: p['attn']['out']['bias'].astype(
        jnp.float32).reshape(1, -1))
    wfc = stk(lambda p: jnp.moveaxis(
        p['mlp']['fc']['kernel'].reshape(d, MLP_CHUNKS, -1), 1, 0))
    bfc = stk(lambda p: p['mlp']['fc']['bias'].astype(
        jnp.float32).reshape(MLP_CHUNKS, 1, -1))
    wproj = stk(lambda p: p['mlp']['proj']['kernel'].reshape(
        MLP_CHUNKS, -1, d))
    bproj = stk(lambda p: p['mlp']['proj']['bias'].astype(
        jnp.float32).reshape(1, -1))
    return (ln1s, ln1b, ln2s, ln2b, wqkv, bqkv, wout, bout, wfc, bfc,
            wproj, bproj)


def decode_token_step(x, stacked, cache_k, cache_v, pos, heads: int,
                      *, chunk: int = 0, interpret: bool = False):
    """One FULL token step (all layers) through the fused kernel.

    x [B, D] fp32 token embedding; stacked: output of
    :func:`stack_decode_params`; cache_k/v FLAT stacked caches
    [n_layers, B, Wpad, D] (Wpad a multiple of the chunk width); pos:
    traced scalar cache position of the current token (cache rows >= pos
    are masked out).  Returns (y [B, D] fp32 final hidden, k_new, v_new
    [n_layers, B, D] cache dtype) — the caller owns the cache update
    (one stacked dynamic_update_slice per token).
    """
    b, d = x.shape
    wpad = cache_k.shape[2]
    if chunk <= 0:
        # largest of {16, 32, 64, 128} with B*chunk <= 1024 rows: the
        # double-buffered K+V chunk pairs stay ~6 MB at any batch size,
        # and every weight block is at most [D, D]
        chunk = 16
        for c in (32, 64, 128):
            if b * c <= 1024:
                chunk = c
    chunk = min(chunk, wpad)
    assert wpad % chunk == 0, (wpad, chunk)
    scalars = jnp.zeros((1,), jnp.int32).at[0].set(pos)
    return _call(x, stacked, cache_k, cache_v, scalars, heads=heads,
                 chunk=chunk, interpret=interpret)
