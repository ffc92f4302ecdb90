"""Mask-predict (PNAG) sampler — batched, jitted, TPU-native.

Parity target: mmvid_pytorch/dalle_bert.py:514-714 (BERT.mask_predict).
The reference samples ONE item at a time (python loop at :618) with T~20
full-sequence transformer forwards per item and B sequential beams.  Here the
whole batch advances together inside a single `lax.while_loop`:

* the 3-phase n(t)/temp(t) schedules are precomputed host-side from
  mp_config (dalle_bert.py:589-614) and passed as arrays;
* ``torch.multinomial(Y, k, replacement=False)`` (confidence-weighted
  re-masking, :647-658) becomes Gumbel top-k (Efraimidis-Spirakis): taking
  the k largest of ``log Y_i + G_i`` draws an exact weighted sample without
  replacement, with preserved positions pinned to +inf so they always stay;
* the per-sample dynamic stop (score not improving for 5 steps, :701-707)
  becomes per-lane bookkeeping (best score / best tokens / last-improvement
  step); the while_loop exits when every lane has terminated;
* beams: the reference samples ALL B re-mask patterns and inputs from the
  PRE-round Y/I_tok (:646-668), so the B transformer forwards are mutually
  independent — they run as ONE batched forward (beams folded into the
  batch axis); only the cheap elementwise Y/I update chain is sequential
  (beam j+1's update composes on beam j's, :675-691), reproduced by a
  `lax.scan` over precomputed per-beam results.

Long-video modes (`long` / `interp*`) enter through a static preserve layout
(dalle_bert.py:543-583): preserved token positions never re-mask and never
update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_schedules(mp_config: Dict, N: int, steps: int = 0
                   ) -> Tuple[np.ndarray, np.ndarray, int]:
    """n(t) re-mask counts and temp(t) schedules (dalle_bert.py:589-614)."""
    Tmax = mp_config['T'] if steps <= 0 else steps
    N3_n = max(1, int(N * mp_config['N3_n']))
    N4_n = max(1, int(N * mp_config['N4_n']))
    n = (list(N * np.linspace(mp_config['N1_n'], mp_config['N2_n'],
                              mp_config['T1_n']))
         + list(N3_n * np.ones(mp_config['T2_n']))
         + list(N4_n * np.ones(mp_config['T3_n'])))
    temp = (list(np.linspace(mp_config['N1_t'], mp_config['N2_t'],
                             mp_config['T1_t']))
            + list(mp_config['N3_t'] * np.ones(mp_config['T2_t']))
            + list(mp_config['N4_t'] * np.ones(mp_config['T3_t'])))
    n = np.asarray(list(map(int, n)), np.int32)
    temp = np.asarray(temp, np.float32)
    # pad so indexing up to Tmax is safe
    if len(n) < Tmax:
        n = np.concatenate([n, np.full(Tmax - len(n), n[-1], np.int32)])
    if len(temp) < Tmax:
        temp = np.concatenate(
            [temp, np.full(Tmax - len(temp), temp[-1], np.float32)])
    return n[:Tmax], temp[:Tmax], Tmax


def preserve_layout(cfg, long_mode: str, t_overlap: int,
                    has_preserve: bool):
    """Static (preserve_mask [N_total] bool, N) (dalle_bert.py:540-583)."""
    n_tok = cfg.image_seq_len
    total = cfg.target_seq_len
    if long_mode == 'long':
        if not has_preserve:
            t_overlap = 0
        N = total - n_tok * t_overlap
        mask = np.zeros(total, bool)
        if has_preserve:
            mask[:n_tok * t_overlap] = True
    elif long_mode in ('interp', 'interp2', 'interp_real'):
        N = total // 2
        mask = np.zeros((cfg.num_targets, n_tok), bool)
        if has_preserve:
            mask[::2, :] = True
        mask = mask.reshape(-1)
    else:
        N = total
        mask = np.zeros(total, bool)
    return mask, N


def arrange_preserve_tokens(cfg, preserve, long_mode: str, t_overlap: int):
    """Place given tokens into the target grid (dalle_bert.py:558-580).

    preserve: [B, target_seq_len] token grid from a previous chunk / source
    video.  Returns [B, target_seq_len] with tokens moved to the preserved
    slots (everything else [MASK]).
    """
    n_tok = cfg.image_seq_len
    b = preserve.shape[0]
    out = jnp.full((b, cfg.target_seq_len), cfg.mask_token, jnp.int32)
    if long_mode == 'long':
        k = n_tok * t_overlap
        out = out.at[:, :k].set(preserve[:, -k:])
    elif long_mode in ('interp', 'interp2', 'interp_real'):
        t = cfg.num_targets
        src = preserve.reshape(b, t, n_tok)[:, :t // 2]
        grid = out.reshape(b, t, n_tok)
        grid = grid.at[:, ::2, :].set(src)
        out = grid.reshape(b, -1)
    return out


def _gumbel(key, shape, eps=1e-20):
    u = jax.random.uniform(key, shape, minval=eps, maxval=1.0)
    return -jnp.log(-jnp.log(u) + eps)


def _sample_argmax(logits):
    """Deterministic stand-in for :func:`_sample_multinomial` (parity
    testing): token = argmax(logits), Y = its softmax probability.  The
    torch oracle is driven to the same rule by patching torch.multinomial
    to argmax and torch.rand_like to a constant (a constant gumbel offset
    leaves softmax and argmax unchanged)."""
    tok = jnp.argmax(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    chosen = jnp.take_along_axis(logits, tok[..., None], axis=-1)[..., 0]
    return jnp.exp(chosen - lse), tok.astype(jnp.int32)


def _sample_multinomial(key, logits, temperature):
    """Gumbel-noised categorical (dalle_bert.py:527-538): returns
    (Y = prob of chosen token under the noised softmax, tokens).

    categorical(softmax(noised)) == argmax(noised + G'), and the chosen
    token's probability is exp(noised_tok - logsumexp(noised)) — avoids
    materializing the [B, N, 1024] softmax array."""
    k1, k2 = jax.random.split(key)
    noised = logits + temperature * _gumbel(k1, logits.shape)
    tok = jnp.argmax(noised + _gumbel(k2, noised.shape), axis=-1)
    lse = jax.scipy.special.logsumexp(noised, axis=-1)
    chosen = jnp.take_along_axis(noised, tok[..., None], axis=-1)[..., 0]
    y = jnp.exp(chosen - lse)
    return y, tok.astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class MaskPredictSpec:
    """Static sampler spec (everything shape-affecting)."""
    n_sched: tuple
    temp_sched: tuple
    Tmax: int
    beams: int
    dynamic: bool
    patience: int = 5  # dynamic stop horizon (dalle_bert.py:706)
    # Testing hook: replace every stochastic choice with its deterministic
    # mode (argmax sampling; keep the highest-confidence tokens instead of
    # a weighted draw) so trajectories can be compared step-for-step
    # against the identically-patched torch oracle.
    deterministic: bool = False


def build_spec(mp_config: Dict, N: int, steps: int = 0,
               dynamic: bool = True) -> MaskPredictSpec:
    n, temp, Tmax = make_schedules(mp_config, N, steps)
    return MaskPredictSpec(tuple(n.tolist()), tuple(temp.tolist()), Tmax,
                           int(mp_config.get('B', 1)), dynamic)


def chain_beam_updates(Y, I_tok, keep_all, Y_new_all, I_new_all, S_all):
    """Sequential beam chaining + best-beam selection
    (dalle_bert.py:675-693): beam j's Y/I update composes on beam j-1's
    chained state; the returned state is the chained value AT the
    highest-scoring beam (not the fully-chained end state).

    Y, I_tok: [b, N] pre-round state.  keep_all/Y_new_all/I_new_all:
    [J, b, N] per-beam keep masks and freshly-sampled values (all drawn
    from the pre-round state).  S_all: [J, b] beam scores.
    Returns (S_best [b], Y_best [b,N], I_best [b,N])."""
    def chain(carry, inp):
        Yc, Ic = carry
        keep_j, Yn, In = inp
        Yc = jnp.where(keep_j, Yc, Yn)
        Ic = jnp.where(keep_j, Ic, In)
        return (Yc, Ic), (Yc, Ic)

    (_, _), (Y_all, I_all) = jax.lax.scan(
        chain, (Y, I_tok), (keep_all, Y_new_all, I_new_all))
    jbest = jnp.argmax(S_all, axis=0)                   # [b]
    bidx = jnp.arange(Y.shape[0])
    return S_all[jbest, bidx], Y_all[jbest, bidx], I_all[jbest, bidx]


def mask_predict(core, params, control_emb, key, spec: MaskPredictSpec,
                 preserve_mask: np.ndarray,
                 preserve_tokens: Optional[jax.Array] = None):
    """Run batched mask-predict.

    core: BertCore (bound config); params: its params pytree.
    control_emb [B, C, D]; preserve_mask [N_total] static bool;
    preserve_tokens [B, N_total] (tokens at preserved slots; ignored where
    preserve_mask is False).  Returns tokens [B, N_total] int32.
    """
    import os

    from mmvid_tpu.models.bert import BertCore

    cfg = core.cfg
    b = control_emb.shape[0]
    n_total = cfg.target_seq_len
    pmask = jnp.asarray(preserve_mask)          # [N]
    has_preserve = bool(preserve_mask.any())
    if preserve_tokens is None:
        preserve_tokens = jnp.full((b, n_total), cfg.mask_token, jnp.int32)

    n_sched = jnp.asarray(spec.n_sched, jnp.int32)
    temp_sched = jnp.asarray(spec.temp_sched, jnp.float32)
    N = int(n_total - preserve_mask.sum())      # static re-maskable count

    # Fused head+sampling epilogue (TPU): the forward returns raw hidden
    # rows and the Pallas kernel applies LN + vocab matmul + Gumbel
    # sampling in VMEM, so no [B, N, vocab] logits reach HBM.
    use_kernel = (os.environ.get('MMVID_PALLAS_SAMPLER') == '1'
                  and cfg.num_image_tokens % 128 == 0
                  and not spec.deterministic)

    def forward(tokens, remask):
        """tokens [B',N] current; remask [B',N] bool True=re-masked to
        [MASK].  B' may be J*b (beams folded J-major into the batch axis);
        the control embedding is tiled to match.  Returns (head_in, rel,
        vid): head_in is MSM logits, or raw hidden when the fused sampling
        kernel is enabled."""
        tok_in = jnp.where(remask, cfg.mask_token, tokens)
        target_emb = core.apply({'params': params}, tok_in,
                                method=BertCore.target_embedding)
        reps = tok_in.shape[0] // control_emb.shape[0]
        ctrl = control_emb if reps == 1 else jnp.tile(control_emb,
                                                      (reps, 1, 1))
        method = (BertCore.forward_hidden if use_kernel
                  else BertCore.forward_full)
        out = core.apply({'params': params}, ctrl, target_emb,
                         method=method)
        return out[0], out[1], out[2]

    def sample(k, head_in, temp):
        """(Y, tokens) from the forward's head_in (see `forward`)."""
        if spec.deterministic:
            return _sample_argmax(head_in)
        if not use_kernel:
            return _sample_multinomial(k, head_in, temp)
        from mmvid_tpu.ops.sample_head import fused_sample_head
        bp, n, d = head_in.shape
        m = bp * n
        blk = next((c for c in (512, 256, 128, 64, 32, 16, 8)
                    if m % c == 0), None)
        if blk is None:
            logits = core.apply({'params': params}, head_in,
                                method=BertCore.to_logits)
            return _sample_multinomial(k, logits, temp)
        ln = params['to_logits_ln']
        fc = params['to_logits_fc']
        y, tok = fused_sample_head(
            head_in.reshape(m, d), ln['scale'], ln['bias'],
            jnp.asarray(fc['kernel']).astype(core.dtype), fc['bias'],
            temp, jax.random.bits(k, dtype=jnp.uint32), blk_m=blk)
        return y.reshape(bp, n), tok.reshape(bp, n)

    # ---- initial step: everything (except preserved) masked ----
    key, k0 = jax.random.split(key)
    init_tokens = jnp.where(pmask[None], preserve_tokens, cfg.mask_token)
    head_in, _, _ = forward(init_tokens, ~pmask[None].repeat(b, 0))
    Y, I_new = sample(k0, head_in, temp_sched[0])
    I_tok = jnp.where(pmask[None], preserve_tokens, I_new)
    # preserved slots never resample: pin their confidence high
    Y = jnp.where(pmask[None], jnp.inf, Y)

    def beams_round(Y, I_tok, t, key_t):
        """One refinement round over all J beams (dalle_bert.py:646-693).
        All J re-mask patterns + forwards come from the PRE-round Y/I_tok,
        so the J transformer calls fold into one batched forward."""
        J = spec.beams
        k1, k2 = jax.random.split(key_t)
        k_keep = N - n_sched[t - 1]             # tokens to KEEP this step
        # J independent Gumbel top-k weighted samples w/o replacement over Y
        scores = jnp.log(jnp.maximum(Y, 1e-30))[None]
        if not spec.deterministic:
            scores = scores + _gumbel(k1, (J,) + Y.shape)
        else:
            scores = jnp.broadcast_to(scores, (J,) + Y.shape)
        scores = jnp.where(pmask[None, None], jnp.inf, scores)
        ranks = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
        keep_all = (ranks < (k_keep + int(preserve_mask.sum()))) \
            | pmask[None, None]                 # [J, b, N]

        head_in, rel, vid = forward(
            jnp.broadcast_to(I_tok[None], (J,) + I_tok.shape
                             ).reshape(J * b, -1),
            (~keep_all).reshape(J * b, -1))
        Y_new, I_new = sample(k2, head_in, temp_sched[t])
        S_all = ((jax.nn.sigmoid(rel) + jax.nn.sigmoid(vid)) * 0.5
                 ).reshape(J, b)
        return chain_beam_updates(Y, I_tok, keep_all,
                                  Y_new.reshape(J, b, -1),
                                  I_new.reshape(J, b, -1), S_all)

    def cond(state):
        t, _, _, _, _, tmax, _ = state
        if not spec.dynamic:
            return t < spec.Tmax
        # Reference dalle_bert.py:701-707 EXECUTES step t and breaks after
        # when t - tmax >= 5, so step t runs iff t - tmax <= patience
        # (one more improvement attempt per stall than a strict <).
        return jnp.logical_and(
            t < spec.Tmax,
            jnp.any(t - tmax <= spec.patience))

    def body(state):
        t, key, Y, I_tok, Smax, tmax, Imax = state
        key, key_t = jax.random.split(key)
        S_best, Y_best, I_best = beams_round(Y, I_tok, t, key_t)

        active = (t - tmax) <= spec.patience if spec.dynamic else \
            jnp.ones((b,), bool)
        # frozen lanes keep their state
        Y = jnp.where(active[:, None], Y_best, Y)
        I_tok = jnp.where(active[:, None], I_best, I_tok)
        improved = (S_best > Smax) & active
        Smax = jnp.where(improved, S_best, Smax)
        tmax = jnp.where(improved, t, tmax)
        Imax = jnp.where(improved[:, None], I_tok, Imax)
        return (t + 1, key, Y, I_tok, Smax, tmax, Imax)

    state = (jnp.int32(1), key, Y, I_tok,
             jnp.zeros((b,), jnp.float32),       # Smax
             jnp.zeros((b,), jnp.int32),         # tmax
             I_tok)                              # Imax
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, I_tok, _, _, Imax = state
    return Imax if spec.dynamic else I_tok


def mask_predict_trace(core, params, control_emb, key,
                       spec: MaskPredictSpec, preserve_mask: np.ndarray,
                       preserve_tokens: Optional[jax.Array] = None):
    """Like mask_predict but returns (tokens_per_step [T, B, N],
    keep_masks_per_step [T, B, N] bool, final_tokens) for the PNAG debug
    visualization (reference debug=True path, dalle_bert.py:635-700
    image_samples; keep==False marks the re-masked positions rendered by
    decode_masks).  Runs a fixed-length scan (no dynamic stop) with the
    same update rule.  Step 0's keep mask is the preserve mask (everything
    else starts [MASK]ed)."""
    from mmvid_tpu.models.bert import BertCore

    cfg = core.cfg
    b = control_emb.shape[0]
    n_total = cfg.target_seq_len
    pmask = jnp.asarray(preserve_mask)
    if preserve_tokens is None:
        preserve_tokens = jnp.full((b, n_total), cfg.mask_token, jnp.int32)
    n_sched = jnp.asarray(spec.n_sched, jnp.int32)
    temp_sched = jnp.asarray(spec.temp_sched, jnp.float32)
    N = int(n_total - preserve_mask.sum())

    def forward(tokens, remask):
        tok_in = jnp.where(remask, cfg.mask_token, tokens)
        target_emb = core.apply({'params': params}, tok_in,
                                method=BertCore.target_embedding)
        logits, rel, vid, _ = core.apply({'params': params}, control_emb,
                                         target_emb,
                                         method=BertCore.forward_full)
        return logits, rel, vid

    def _sample(k, logits, temp):
        return (_sample_argmax(logits) if spec.deterministic
                else _sample_multinomial(k, logits, temp))

    key, k0 = jax.random.split(key)
    init_tokens = jnp.where(pmask[None], preserve_tokens, cfg.mask_token)
    logits, _, _ = forward(init_tokens, ~pmask[None].repeat(b, 0))
    Y, I_new = _sample(k0, logits, temp_sched[0])
    I_tok = jnp.where(pmask[None], preserve_tokens, I_new)
    Y = jnp.where(pmask[None], jnp.inf, Y)

    def step(carry, t):
        Y, I_tok, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        k_keep = N - n_sched[t - 1]
        scores = jnp.log(jnp.maximum(Y, 1e-30))
        if not spec.deterministic:
            scores = scores + _gumbel(k1, Y.shape)
        scores = jnp.where(pmask[None], jnp.inf, scores)
        ranks = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
        keep = (ranks < (k_keep + int(preserve_mask.sum()))) | pmask[None]
        logits, _, _ = forward(I_tok, ~keep)
        Y_new, I_new = _sample(k2, logits, temp_sched[t])
        Y = jnp.where(keep, Y, Y_new)
        I_tok = jnp.where(keep, I_tok, I_new)
        return (Y, I_tok, key), (I_tok, keep)

    (_, final, _), (trace, keeps) = jax.lax.scan(
        step, (Y, I_tok, key), jnp.arange(1, spec.Tmax))
    tokens_per_step = jnp.concatenate([I_tok[None], trace], axis=0)
    keep0 = jnp.broadcast_to(pmask[None, None], (1,) + I_tok.shape)
    keeps_per_step = jnp.concatenate([keep0, keeps], axis=0)
    return tokens_per_step, keeps_per_step, final
