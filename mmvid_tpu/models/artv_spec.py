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

    # Windowed chunk caches (MMVID_SPEC_WINDOW, trace-time, default on):
    # the chunk attention streams every cache row each chunk, so a
    # full-width [B, ctrl+n_gen+k, D] cache pays for dead rows all run
    # long.  Generation is split into per-frame segments: segment f runs
    # its own while_loop over caches sized ctrl_len + (f+1)*seg + k_spec
    # (grown by jnp.pad between segments), cutting the streamed width to
    # the live window (mean ~0.6x at flagship shapes, same lever as
    # ar_sample's windowed scan, ROADMAP round-3).  Lanes that cross a
    # segment's stop idle (all-false write masks) until the laggards
    # catch up; commits are never discarded, so the chunk/pos trajectory
    # of each lane is unchanged — per-lane step counts and FORCE-mode
    # chunk counts are identical to the unwindowed path, and greedy
    # trajectories match bitwise (sampled runs differ only through the
    # key stream when idle iterations are inserted; b=1 is bitwise too).
    # MMVID_SPEC_WINDOW=0 restores the single full-width loop.  Measured
    # (v5e, k=8, b16/b64): windowed floor 133.8/146.7 vs full-width
    # 119.4/124.2 f/s, ceiling 647.5/749.3 vs 602.4/692.3 — windowing
    # wins both ends (ROADMAP round-5).
    window = _os.environ.get('MMVID_SPEC_WINDOW', '1') == '1'
    if window:
        stops = [min((f + 1) * seg, n_gen)
                 for f in range(-(-n_gen // seg))]
    else:
        stops = [n_gen]

    def cache_width(stop):
        # active lanes have pos <= stop-1 entering a chunk and may have
        # overshot the PREVIOUS stop by up to k_spec; writes reach
        # base + k_spec = ctrl_len + pos - 1 + k_spec
        return ctrl_len + stop + k_spec

    W0 = cache_width(stops[0])
    caches_k0 = tuple(
        jnp.zeros((b, W0, dim), dt).at[:, :ctrl_len].set(
            pre_k[i].reshape(b, ctrl_len, dim).astype(dt))
        for i in range(n_layers))
    caches_v0 = tuple(
        jnp.zeros((b, W0, dim), dt).at[:, :ctrl_len].set(
            pre_v[i].reshape(b, ctrl_len, dim).astype(dt))
        for i in range(n_layers))

    ln_p = params['to_logits_ln']
    fc_k = params['to_logits_fc']['kernel'][
        :, cfg.num_control_tokens:].astype(dt)
    fc_b = params['to_logits_fc']['bias'][cfg.num_control_tokens:]

    k_img = max(int((1 - filter_thres) * cfg.total_tokens), 1)
    k_img = min(k_img, cfg.num_image_tokens)

    def filtered_logits(hidden):
        """[..., D] -> top-k-filtered image logits [..., V]
        (dalle_artv.py:61-67 semantics over the only-finite image range)."""
        h = _ln(ln_p, hidden)
        logits = (jnp.dot(h.astype(dt), fc_k,
                          preferred_element_type=jnp.float32) + fc_b)
        if k_img < cfg.num_image_tokens:
            thresh = jnp.sort(logits, axis=-1)[..., -k_img][..., None]
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

    # ---- manually-batched speculative loop ----
    #
    # NOT vmap(per-lane while_loop): once acceptance makes each lane's
    # position data-dependent, JAX's while_loop batching rule wraps EVERY
    # loop carry — including the ~170 MB of KV caches — in per-lane
    # selects, and the lane-varying write offset turns the cache update
    # into scatter+copy.  Measured on the v5e (round 4, trace_spec.py
    # --floor): 24 cache copies at ~1.04 ms each + a 4.3 ms select fusion
    # = ~29 of the 34.65 ms/chunk, 9x the lockstep chunk cost — which
    # made speculation a loss at EVERY acceptance rate, since real
    # weights always desynchronize lanes.  Here the batch is one
    # while_loop whose carries are batched arrays: cond is any(active),
    # cache writes are masked one-hot matmuls (uniform shape, no scatter,
    # no carry selects), and finished lanes freeze themselves because
    # their write masks are all-false (their chunk forward is recomputed
    # but discarded).
    m = k_spec + 1  # chunk rows: prev committed token + k_spec drafts
    arange_m = jnp.arange(m)
    arange_b = jnp.arange(b)
    # Cache-write strategy (trace-time env knob, keyed into the gen
    # cache by artv.py): default is a row scatter of the m new K/V rows
    # (`.at[lane, base+j].set`, inactive lanes dropped via an OOB row) —
    # XLA keeps it in place on the loop carry, so each chunk writes only
    # B*m rows.  MMVID_SPEC_SCATTER=0 selects the masked one-hot matmul
    # + full-cache select variant instead, which rewrites the whole
    # [B, W, D] cache per layer per chunk.  A/B'd clean on the v5e
    # (k=8, b16, full-width caches): scatter floor 119.4 / ceiling
    # 602.4 f/s vs one-hot 90.6 / 522.3 — scatter wins both ends
    # (+32% / +15%), so it is the default; full matrix in ROADMAP
    # round-5.
    scatter = _os.environ.get('MMVID_SPEC_SCATTER', '1') == '1'

    def make_block_chunk(W, arange_W):
        def block_chunk(p, x, ck, cv, base, active):
            """m-token pass through one block, all lanes.  x [B, m, D]
            fp32; ck/cv [B, W, D]; base [B] = cache position of each
            lane's x[:, 0].  Row j of lane b attends cache positions <=
            base[b] + j (committed prefix + intra-chunk causal);
            rejected-draft slots beyond the frontier are invisible to
            committed rows by this mask."""
            h = _ln(p['ln_1'], x)
            qkv = dot(h, p['attn']['qkv'])              # [B, m, 3D] fp32
            q = qkv[..., :dim]
            kk = qkv[..., dim:2 * dim]
            vv = qkv[..., 2 * dim:]
            if scatter:
                # row scatter: inactive lanes aim at rows >= W, dropped
                # by mode='drop' (W + arange_m keeps the index tuples
                # unique even for dropped lanes — duplicate indices under
                # unique_indices=True are implementation-defined)
                rows_w = jnp.where(active[:, None],
                                   base[:, None] + arange_m[None],
                                   W + arange_m[None])  # [B, m]
                ck = ck.at[arange_b[:, None], rows_w].set(
                    kk.astype(dt), mode='drop', unique_indices=True)
                cv = cv.at[arange_b[:, None], rows_w].set(
                    vv.astype(dt), mode='drop', unique_indices=True)
            else:
                # masked one-hot write: onehot[b, w, j] = (w == base[b]+j)
                # and lane b still active — a [B,W,m]x[B,m,D] matmul plus
                # a where, instead of a lane-varying-offset scatter
                onehot = ((arange_W[None, :, None] - base[:, None, None]
                           == arange_m[None, None, :])
                          & active[:, None, None]).astype(dt)
                in_win = ((arange_W[None] >= base[:, None])
                          & (arange_W[None] < base[:, None] + m)
                          & active[:, None])                # [B, W]
                upd_k = jnp.einsum('bwj,bjd->bwd', onehot, kk.astype(dt))
                upd_v = jnp.einsum('bwj,bjd->bwd', onehot, vv.astype(dt))
                ck = jnp.where(in_win[..., None], upd_k, ck)
                cv = jnp.where(in_win[..., None], upd_v, cv)
            qh = q.reshape(b, m, heads, hd)
            logits = jnp.einsum('bmhd,bwhd->bhmw', qh.astype(dt),
                                ck.reshape(b, W, heads, hd),
                                preferred_element_type=jnp.float32)
            logits = logits * (hd ** -0.5)
            valid = (arange_W[None, None, None, :]
                     <= base[:, None, None, None]
                     + arange_m[None, None, :, None])   # [B, 1, m, W]
            logits = jnp.where(valid, logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum('bhmw,bwhd->bmhd', attn.astype(dt),
                           cv.reshape(b, W, heads, hd),
                           preferred_element_type=jnp.float32
                           ).reshape(b, m, dim)
            o = dot(o, p['attn']['out'])
            x = x + o
            h = _ln(p['ln_2'], x)
            h = dot(h, p['mlp']['fc'])
            h = h * jax.nn.sigmoid(1.702 * h)
            h = dot(h, p['mlp']['proj'])
            return x + h, ck, cv
        return block_chunk

    def make_segment(stop, W):
        """(cond, body) for one segment's while_loop: lanes run while
        pos < stop; lanes at/beyond stop idle (all-false write masks,
        ncommit 0) until the laggards arrive, so commits are never
        discarded at segment boundaries."""
        block_chunk = make_block_chunk(W, jnp.arange(W))

        def cond(c):
            return jnp.any(c[4] < stop)

        def body(c):
            caches_k, caches_v, out, prev, pos, key, steps = c
            active = pos < stop                      # [B]
            base = ctrl_len + pos - 1                # [B]
            return _chunk_step(block_chunk, caches_k, caches_v, out, prev,
                               pos, key, steps, active, base)
        return cond, body

    def _chunk_step(block_chunk, caches_k, caches_v, out, prev, pos, key,
                    steps, active, base):
        # drafts for target positions pos..pos+k_spec-1
        dpos = pos[:, None] + jnp.arange(k_spec)[None]        # [B, k]
        from_prev = jnp.take_along_axis(
            out, jnp.clip(dpos - seg, 0, n_gen - 1), axis=1)
        from_vis = jnp.take_along_axis(
            vis_draft, jnp.clip(dpos, 0, seg - 1), axis=1)
        drafts = jnp.where(dpos >= seg, from_prev, from_vis)  # [B, k]

        toks = jnp.concatenate([prev[:, None], drafts], axis=1)   # [B, m]
        rows = jnp.clip(pos[:, None] - 1 + arange_m[None], 0, n_gen - 1)
        x = (image_emb_table[toks] + pos_emb_full[rows]
             ).astype(jnp.float32)
        new_k, new_v = [], []
        for i in range(n_layers):
            x, ck, cv = block_chunk(dec_blocks[i], x, caches_k[i],
                                    caches_v[i], base, active)
            new_k.append(ck)
            new_v.append(cv)
        logits = filtered_logits(x)                  # [B, m, V]

        # sequential point-mass rejection sampling per lane: accept
        # draft i with prob p_i(d_i); j = first rejection (k_spec if
        # none)
        key, k_acc, k_new = jax.random.split(key, 3)
        logp = jax.nn.log_softmax(logits / temperature, axis=-1)
        p_draft = jnp.take_along_axis(
            jnp.exp(logp[:, :k_spec]), drafts[..., None], axis=-1
        )[..., 0]                                    # [B, k]
        if force:
            acc = jnp.ones((b, k_spec), bool)
        else:
            u = jax.random.uniform(k_acc, (b, k_spec))
            acc = u < p_draft
        rej = jnp.concatenate([~acc, jnp.ones((b, 1), bool)], axis=1)
        j = jnp.argmax(rej, axis=1)                  # [B] in [0, k_spec]

        # replacement token: residual (draft masked) on rejection,
        # bonus row on full acceptance (logits[:, j] is that row either
        # way)
        sel = jnp.take_along_axis(
            logits, j[:, None, None], axis=1)[:, 0]  # [B, V]
        d_at_j = jnp.take_along_axis(
            drafts, jnp.minimum(j, k_spec - 1)[:, None], axis=1)  # [B, 1]
        vocab_ids = jnp.arange(logits.shape[-1])[None]
        res = jnp.where(vocab_ids == d_at_j, -jnp.inf, sel)
        new_from = jnp.where((j < k_spec)[:, None], res, sel)
        new_tok = jax.random.categorical(
            k_new, new_from / temperature, axis=-1).astype(jnp.int32)

        cand = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)       # [B, m]
        cand = jnp.where(arange_m[None] == j[:, None],
                         new_tok[:, None], cand)     # j drafts + new
        ncommit = jnp.where(active,
                            jnp.minimum(j + 1, n_gen - pos), 0)   # [B]

        # masked write of each lane's committed window into out
        rel = jnp.arange(n_gen + m)[None] - pos[:, None]          # [B, NW]
        in_out = (rel >= 0) & (rel < ncommit[:, None])
        gathered = jnp.take_along_axis(cand, jnp.clip(rel, 0, m - 1),
                                       axis=1)
        out = jnp.where(in_out, gathered, out)
        prev_new = jnp.take_along_axis(
            cand, jnp.maximum(ncommit - 1, 0)[:, None], axis=1)[:, 0]
        prev = jnp.where(active, prev_new, prev)
        return (tuple(new_k), tuple(new_v), out, prev, pos + ncommit,
                key, steps + active.astype(jnp.int32))

    key, k0 = jax.random.split(key)
    logits0 = filtered_logits(prefix_last)
    tok0 = jax.random.categorical(k0, logits0 / temperature,
                                  axis=-1).astype(jnp.int32)

    # out is padded by m so the fixed-width chunk commit never clamps
    # its write start
    out0 = jnp.zeros((b, n_gen + m), jnp.int32).at[:, 0].set(tok0)
    c = (caches_k0, caches_v0, out0, tok0,
         jnp.ones((b,), jnp.int32), key, jnp.zeros((b,), jnp.int32))
    for stop in stops:
        W = cache_width(stop)
        grow = W - c[0][0].shape[1]
        if grow > 0:
            # grow the caches to the next segment's live width: a once-
            # per-segment copy, amortized over the segment's chunks
            c = (tuple(jnp.pad(ck, ((0, 0), (0, grow), (0, 0)))
                       for ck in c[0]),
                 tuple(jnp.pad(cv, ((0, 0), (0, grow), (0, 0)))
                       for cv in c[1])) + c[2:]
        cond, body = make_segment(stop, W)
        c = jax.lax.while_loop(cond, body, c)
    return c[2][:, :n_gen].astype(jnp.int32), c[6]
