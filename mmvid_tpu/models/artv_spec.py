"""Exact speculative multi-token decode for ART-V (MMVID_ARTV_SPEC=k).

The measured ART-V decode wall is NOT bandwidth (int8 weights moved
nothing, ROADMAP round 3) but the serial chain of ~150 latency-bound ops
per token: each per-token step costs ~1.5 ms at flagship size however
little data it moves.  The structural fix the ROADMAP calls for is
"fewer/bigger ops per token" — this module implements it as speculative
decoding with a zero-cost draft:

* **Draft**: video tokens are temporally correlated, so position ``p``'s
  draft is the SAME spatial token one frame earlier — ``out[p - seg]``
  (``seg`` = tokens/frame), or the visual-control token for frame 0.
  The draft costs no model evaluation.
* **Verify**: one (k+1)-token chunk forward against the KV caches
  replaces up to k+1 single-token steps.  At decode shapes the chunk
  forward is latency-bound like the single-token step, so the ceiling is
  ~(k+1)x tokens per wall-second at full acceptance.
* **Exactness**: acceptance is standard speculative rejection sampling
  specialised to a deterministic (point-mass) draft: accept draft ``d``
  with probability ``p_model(d)``; on rejection sample from ``p_model``
  with ``d`` masked out (renormalised).  For any draft this reproduces
  the target distribution EXACTLY — P(tok=d) = p(d), P(tok=v!=d) =
  (1-p(d)) * p(v)/(1-p(d)) = p(v) — so output quality is identical to
  ``ar_sample`` by construction, not approximation (tested: greedy
  trajectories match token-for-token, and sampled marginals pass the
  same chi^2/TV bounds as the torch-oracle parity suite).
* **Cache discipline**: the chunk writes K/V for every fed token,
  including later-rejected drafts.  Rejected entries sit BEYOND the
  committed frontier, the attention mask (``l <= base + row``) never
  exposes them to committed rows, and the next chunk starts at the
  frontier so each stale slot is overwritten before it can be read.

Acceptance depends on the weights (static backgrounds accept often;
random test weights accept ~never), so this is an opt-in serving path:
``MMVID_ARTV_SPEC=k`` (k <= tokens/frame).  ``MMVID_ARTV_SPEC_FORCE=1``
is a BENCH-ONLY knob that accepts every draft to measure the ceiling —
its output is garbage by design.

Reference: the baseline AR loop this accelerates is
/root/reference/mmvid_pytorch/dalle_artv.py:236-304 (no cache, no
speculation, full O(L^2) forward per token).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from mmvid_tpu.models.artv import ArtvCore, _block_params, _ln


def ar_sample_spec(core: ArtvCore, params, text, visual_tokens, key,
                   spec_k: int, filter_thres: float = 0.5,
                   temperature: float = 1.0):
    """Speculative KV-cached sampling of all target tokens.

    Returns (tokens [B, target_seq_len] int32, n_steps [B] int32) where
    ``n_steps`` counts chunk iterations per lane (tokens/steps is the
    realised speculation gain; equals target_seq_len-1 at 0 acceptance).
    """
    cfg = core.cfg
    clip_cfg = cfg.clip
    heads, hd = clip_cfg.heads, clip_cfg.width // clip_cfg.heads
    dim = heads * hd
    n_layers = clip_cfg.layers
    b = text.shape[0]
    ctrl_len = cfg.control_seq_len + 1              # +bos
    seg = cfg.image_fmap_size ** 2                  # tokens per frame
    n_gen = cfg.target_seq_len
    dt = core.dtype
    k_spec = int(spec_k)
    assert 0 < k_spec <= seg, (
        f'spec_k={k_spec} must be in (0, tokens/frame={seg}]: drafts may '
        f'only reference already-committed previous-frame tokens')
    force = _os.environ.get('MMVID_ARTV_SPEC_FORCE') == '1'  # bench-only

    # ---- shared with ar_sample: control prefill + tables + head slice ----
    ctrl_emb = core.apply({'params': params}, text, visual_tokens,
                          method=ArtvCore.control_tokens_embedding)
    pos_emb_full = core.apply(
        {'params': params},
        jnp.zeros((b, n_gen, cfg.dim)),
        method=lambda m, x: m.image_pos_emb(x))[0]  # [n_gen, D] (shared)
    image_emb_table = jnp.asarray(params['image_emb']['embedding'])

    def cast_block(p):
        def c(sub):
            return {'kernel': sub['kernel'].astype(dt), 'bias': sub['bias']}
        return {'ln_1': p['ln_1'], 'ln_2': p['ln_2'],
                'attn': {k: c(v) for k, v in p['attn'].items()},
                'mlp': {k: c(v) for k, v in p['mlp'].items()}}

    blocks = [cast_block(_block_params(params, i)) for i in range(n_layers)]

    def fuse_qkv(sub):
        return {'kernel': jnp.concatenate(
                    [sub['query']['kernel'], sub['key']['kernel'],
                     sub['value']['kernel']], axis=1),
                'bias': jnp.concatenate(
                    [sub['query']['bias'], sub['key']['bias'],
                     sub['value']['bias']])}

    dec_blocks = [{'ln_1': p['ln_1'], 'ln_2': p['ln_2'],
                   'attn': {'qkv': fuse_qkv(p['attn']),
                            'out': p['attn']['out']},
                   'mlp': p['mlp']} for p in blocks]

    def dot(x, sub):
        return jnp.dot(x.astype(dt), sub['kernel'],
                       preferred_element_type=jnp.float32) + sub['bias']

    def prefill_block(p, x):
        lp = x.shape[1]
        h = _ln(p['ln_1'], x)
        q = dot(h, p['attn']['query'])
        k = dot(h, p['attn']['key'])
        v = dot(h, p['attn']['value'])
        q = q.reshape(b, lp, heads, hd)
        k = k.reshape(b, lp, heads, hd)
        v = v.reshape(b, lp, heads, hd)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q.astype(dt), k.astype(dt),
                            preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5)
        causal = jnp.tril(jnp.ones((lp, lp), bool))
        logits = jnp.where(causal[None, None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum('bhqk,bkhd->bqhd', attn.astype(dt), v.astype(dt),
                       preferred_element_type=jnp.float32
                       ).reshape(b, lp, -1)
        o = dot(o, p['attn']['out'])
        x = x + o
        h = _ln(p['ln_2'], x)
        h = dot(h, p['mlp']['fc'])
        h = h * jax.nn.sigmoid(1.702 * h)
        h = dot(h, p['mlp']['proj'])
        return x + h, k, v

    x = ctrl_emb
    pre_k, pre_v = [], []
    for i in range(n_layers):
        x, k, v = prefill_block(blocks[i], x)
        pre_k.append(k)
        pre_v.append(v)
    prefix_last = x[:, -1]

    # full-width caches with k_spec headroom: the last chunk's base is
    # ctrl_len + n_gen - 2, so writes reach base + k_spec
    W = ctrl_len + n_gen + k_spec
    cache_k0 = jnp.zeros((n_layers, b, W, heads, hd), dt)
    cache_v0 = jnp.zeros((n_layers, b, W, heads, hd), dt)
    for i in range(n_layers):
        cache_k0 = cache_k0.at[i, :, :ctrl_len].set(pre_k[i].astype(dt))
        cache_v0 = cache_v0.at[i, :, :ctrl_len].set(pre_v[i].astype(dt))

    ln_p = params['to_logits_ln']
    fc_k = params['to_logits_fc']['kernel'][
        :, cfg.num_control_tokens:].astype(dt)
    fc_b = params['to_logits_fc']['bias'][cfg.num_control_tokens:]

    k_img = max(int((1 - filter_thres) * cfg.total_tokens), 1)
    k_img = min(k_img, cfg.num_image_tokens)

    def filtered_logits(hidden):
        """[m, D] -> top-k-filtered image logits [m, V] (dalle_artv.py:
        61-67 semantics over the only-finite image range)."""
        h = _ln(ln_p, hidden)
        logits = (jnp.dot(h.astype(dt), fc_k,
                          preferred_element_type=jnp.float32) + fc_b)
        if k_img < cfg.num_image_tokens:
            thresh = jnp.sort(logits, axis=-1)[:, -k_img][:, None]
            logits = jnp.where(logits < thresh, -jnp.inf, logits)
        return logits

    # draft source for frame 0: the visual-control tokens (cvae codebook —
    # any deterministic draft is valid for exactness; temporal correlation
    # only affects the acceptance RATE).  Clamped into the image vocab.
    if visual_tokens is not None and visual_tokens.shape[-1] >= seg:
        vis_draft = jnp.clip(visual_tokens[:, :seg].astype(jnp.int32), 0,
                             cfg.num_image_tokens - 1)
    else:
        vis_draft = jnp.zeros((b, seg), jnp.int32)

    # ---- per-lane speculative loop (vmapped over the batch) ----
    m = k_spec + 1  # chunk rows: prev committed token + k_spec drafts

    def block_chunk(p, i, x, cache_k, cache_v, base):
        """m-token pass through block i for ONE lane.  x [m, D] fp32;
        cache_* [n_layers, W, heads, hd]; base = cache position of x[0].
        Row j attends cache positions <= base + j (committed prefix +
        intra-chunk causal); rejected-draft slots beyond the frontier are
        invisible to committed rows by this mask."""
        h = _ln(p['ln_1'], x)
        qkv = dot(h, p['attn']['qkv'])
        q, kk, vv = (qkv[:, :dim], qkv[:, dim:2 * dim], qkv[:, 2 * dim:])
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, kk.reshape(1, m, heads, hd).astype(dt),
            (i, base, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, vv.reshape(1, m, heads, hd).astype(dt),
            (i, base, 0, 0))
        q = q.reshape(m, heads, hd)
        logits = jnp.einsum('mhd,lhd->mhl', q.astype(dt), cache_k[i],
                            preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5)
        valid = (jnp.arange(W)[None, None, :]
                 <= base + jnp.arange(m)[:, None, None])
        logits = jnp.where(valid, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum('mhl,lhd->mhd', attn.astype(dt), cache_v[i],
                       preferred_element_type=jnp.float32).reshape(m, -1)
        o = dot(o, p['attn']['out'])
        x = x + o
        h = _ln(p['ln_2'], x)
        h = dot(h, p['mlp']['fc'])
        h = h * jax.nn.sigmoid(1.702 * h)
        h = dot(h, p['mlp']['proj'])
        return x + h, cache_k, cache_v

    def decode_lane(cache_k, cache_v, tok0, vis_draft_lane, key):
        """One lane's speculative rollout.  out is padded by m so the
        fixed-width chunk commit never clamps its write start."""
        out0 = jnp.zeros((n_gen + m,), jnp.int32).at[0].set(tok0)

        def cond(c):
            return c[4] < n_gen

        def body(c):
            cache_k, cache_v, out, prev, pos, key, steps = c
            base = ctrl_len + pos - 1

            # drafts for target positions pos..pos+k_spec-1
            dpos = pos + jnp.arange(k_spec)
            prev_frame = jnp.where(dpos >= seg,
                                   out[jnp.clip(dpos - seg, 0, n_gen - 1)],
                                   vis_draft_lane[jnp.clip(dpos, 0,
                                                           seg - 1)])
            drafts = prev_frame                       # [k_spec]

            toks = jnp.concatenate([prev[None], drafts])     # [m]
            rows = jnp.clip(pos - 1 + jnp.arange(m), 0, n_gen - 1)
            x = (image_emb_table[toks] + pos_emb_full[rows]
                 ).astype(jnp.float32)
            for i in range(n_layers):
                x, cache_k, cache_v = block_chunk(dec_blocks[i], i, x,
                                                  cache_k, cache_v, base)
            logits = filtered_logits(x)               # [m, V]

            # sequential point-mass rejection sampling: accept draft i
            # with prob p_i(d_i); j = first rejection (k_spec if none)
            key, k_acc, k_new = jax.random.split(key, 3)
            logp = jax.nn.log_softmax(logits / temperature, axis=-1)
            p_draft = jnp.exp(logp[jnp.arange(k_spec), drafts])  # [k_spec]
            u = jax.random.uniform(k_acc, (k_spec,))
            acc = (u < p_draft) if not force else jnp.ones(
                (k_spec,), bool)
            rej = jnp.concatenate([~acc, jnp.ones((1,), bool)])
            j = jnp.argmax(rej)                       # in [0, k_spec]

            # replacement token: residual (draft masked) on rejection,
            # bonus row on full acceptance
            res_logits = logits[j].at[drafts[jnp.minimum(
                j, k_spec - 1)]].set(-jnp.inf)
            new_from = jnp.where(j < k_spec, res_logits, logits[k_spec])
            new_tok = jax.random.categorical(
                k_new, new_from / temperature).astype(jnp.int32)

            cand = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
            cand = cand.at[j].set(new_tok)            # [m]: j drafts + new
            ncommit = jnp.minimum(j + 1, n_gen - pos)

            # write the m-window at pos; entries beyond ncommit land past
            # the frontier and are re-committed by later iterations
            window = jax.lax.dynamic_slice(out, (pos,), (m,))
            keep = jnp.arange(m) < ncommit
            out = jax.lax.dynamic_update_slice(
                out, jnp.where(keep, cand, window), (pos,))
            prev = cand[jnp.maximum(ncommit - 1, 0)]
            return (cache_k, cache_v, out, prev, pos + ncommit, key,
                    steps + 1)

        c = (cache_k, cache_v, out0, tok0, jnp.int32(1), key,
             jnp.int32(0))
        c = jax.lax.while_loop(cond, body, c)
        return c[2][:n_gen], c[6]

    key, k0 = jax.random.split(key)
    logits0 = filtered_logits(prefix_last)
    tok0 = jax.random.categorical(k0, logits0 / temperature,
                                  axis=-1).astype(jnp.int32)

    lane_keys = jax.random.split(key, b)
    cache_k_b = jnp.moveaxis(cache_k0, 1, 0)          # [B, n_layers, ...]
    cache_v_b = jnp.moveaxis(cache_v0, 1, 0)

    out, steps = jax.vmap(decode_lane)(cache_k_b, cache_v_b, tok0,
                                       vis_draft, lane_keys)
    return out.astype(jnp.int32), steps
