#!/usr/bin/env python3
"""Statistical validation of the fused sampling-head kernel on real TPU.

The TPU PRNG primitives don't lower on CPU, so this check runs on hardware
(the durable CPU suite covers the jnp path; this script is exercised on the
bench chip).  Semantics under test (must match sampler._sample_multinomial):

    noised = logits + temp * G1;  tok = argmax(noised + G2)
    -> tok | G1 ~ categorical(softmax(noised));  Y = softmax(noised)[tok]

so at temp=0 tok is an EXACT categorical draw from softmax(logits) (the
second Gumbel always applies), and temperature only flattens the re-noising.

Checks (tolerances calibrated against a jnp-vs-jnp null — the kernel's
matmul runs at bf16 precision like the unfused bf16 to_logits head):

1. temp=0: empirical token distribution vs the exact softmax(logits).
2. temp=0: Y vs softmax(logits)[tok] (bf16-logits tolerance).
3. temp=1: kernel-vs-jnp marginal TV within 2x the jnp-vs-jnp null TV.

Prints PASS/FAIL lines; exits nonzero on failure.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _tv(p, q):
    return 0.5 * np.abs(p - q).sum()


def main():
    from mmvid_tpu.models.sampler import _sample_multinomial
    from mmvid_tpu.ops.sample_head import fused_sample_head

    assert jax.devices()[0].platform != 'cpu', \
        'run on TPU (kernel PRNG does not lower on CPU)'

    rng = np.random.RandomState(0)
    M, D, V = 512, 256, 1024
    x = rng.randn(M, D).astype(np.float32)
    lns = (rng.rand(D) + 0.5).astype(np.float32)
    lnb = (rng.randn(D) * 0.1).astype(np.float32)
    w = (rng.randn(D, V) / np.sqrt(D) * 3).astype(np.float32)
    b = (rng.randn(V) * 0.1).astype(np.float32)

    # reference logits for row 0 (fp32 numpy)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) / np.sqrt(var + 1e-5) * lns + lnb
    logits = h @ w + b
    row = logits[0]
    sm_row = np.exp(row - row.max())
    sm_row /= sm_row.sum()

    xs = np.tile(x[0], (M, 1))
    n_rep = 40
    ok = True

    def kernel_draws(temp, seed0):
        toks, ys = [], []
        for s in range(n_rep):
            y, t = fused_sample_head(
                jnp.asarray(xs), jnp.asarray(lns), jnp.asarray(lnb),
                jnp.asarray(w), jnp.asarray(b), temp, seed0 + s)
            toks.append(np.asarray(t))
            ys.append(np.asarray(y))
        return np.concatenate(toks), np.concatenate(ys)

    def jnp_draws(temp, seed0):
        lrow = jnp.asarray(np.tile(row, (M, 1))[None])
        toks = []
        for s in range(n_rep):
            _, tj = _sample_multinomial(jax.random.PRNGKey(seed0 + s),
                                        lrow, temp)
            toks.append(np.asarray(tj).reshape(-1))
        return np.concatenate(toks)

    n = n_rep * M

    # --- temp=0: exact categorical from softmax(logits) -------------------
    tok0, y0 = kernel_draws(0.0, 100)
    emp0 = np.bincount(tok0, minlength=V) / n
    null0 = _tv(np.bincount(jnp_draws(0.0, 900), minlength=V) / n, sm_row)
    tv0 = _tv(emp0, sm_row)
    print(f'temp=0 TV(kernel, exact softmax) = {tv0:.4f}  '
          f'(jnp null = {null0:.4f})')
    if tv0 > 2 * null0 + 0.01:
        ok = False
        print('FAIL: temp=0 marginal diverges from softmax(logits)')

    # Y consistency: Y must equal softmax(logits)[tok] up to the kernel's
    # bf16 logits precision
    y_exp = sm_row[tok0]
    err = np.abs(y0 - y_exp).max()
    print(f'temp=0 max |Y - softmax[tok]| = {err:.2e} (bf16 tolerance 3e-2)')
    if err > 3e-2:
        ok = False
        print('FAIL: Y inconsistent with softmax(logits)[tok]')

    # --- temp=1: kernel vs jnp marginals, calibrated null -----------------
    tok1, _ = kernel_draws(1.0, 200)
    emp_k = np.bincount(tok1, minlength=V) / n
    emp_j1 = np.bincount(jnp_draws(1.0, 300), minlength=V) / n
    emp_j2 = np.bincount(jnp_draws(1.0, 700), minlength=V) / n
    null = _tv(emp_j1, emp_j2)
    tv = _tv(emp_k, emp_j1)
    print(f'temp=1 TV(kernel, jnp) = {tv:.4f}  (jnp-vs-jnp null = {null:.4f})')
    if tv > 2 * null + 0.01:
        ok = False
        print('FAIL: temp=1 marginals diverge beyond the sampling-noise null')

    print('PASS' if ok else 'FAIL')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
