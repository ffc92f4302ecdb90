"""Standalone compile/run probe for the whole-token-step decode kernel
(ops/artv_decode.py) — used to iterate on Mosaic compile/runtime issues
without paying the full ar_sample scan compile each cycle.

Usage: probe_artv_kernel.py [b] [wpad] [chunk] [pos]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from mmvid_tpu.ops.artv_decode import (
        decode_token_step,
        stack_decode_params,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    wpad = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    pos = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    d, heads, n_layers = 768, 12, 12
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def blk():
        return {
            'ln_1': {'scale': jnp.ones(d), 'bias': jnp.zeros(d)},
            'ln_2': {'scale': jnp.ones(d), 'bias': jnp.zeros(d)},
            'attn': {
                'qkv': {'kernel': jnp.asarray(rng.randn(d, 3 * d) * .02,
                                              dt),
                        'bias': jnp.zeros(3 * d)},
                'out': {'kernel': jnp.asarray(rng.randn(d, d) * .02, dt),
                        'bias': jnp.zeros(d)}},
            'mlp': {
                'fc': {'kernel': jnp.asarray(rng.randn(d, 4 * d) * .02,
                                             dt),
                       'bias': jnp.zeros(4 * d)},
                'proj': {'kernel': jnp.asarray(rng.randn(4 * d, d) * .02,
                                               dt),
                         'bias': jnp.zeros(d)}}}

    dec_blocks = [blk() for _ in range(n_layers)]
    stacked = stack_decode_params(dec_blocks, d)
    x = jnp.asarray(rng.randn(b, d), jnp.float32)
    ck = jnp.asarray(rng.randn(n_layers, b, wpad, d) * 0.1, dt)
    cv = jnp.asarray(rng.randn(n_layers, b, wpad, d) * 0.1, dt)
    y, kn, vn = decode_token_step(x, stacked, ck, cv, jnp.int32(pos),
                                  heads, chunk=chunk)
    print('OK', float(jnp.sum(y)), y.shape, kn.shape, kn.dtype)

    # reference check vs plain jnp math (same casts as the kernel)
    if os.environ.get('PROBE_CHECK') == '1':
        xs = x
        for i in range(n_layers):
            p = dec_blocks[i]

            def ln(v, q):
                mu = v.mean(-1, keepdims=True)
                var = ((v - mu) ** 2).mean(-1, keepdims=True)
                return ((v - mu) * jax.lax.rsqrt(var + 1e-5)
                        * q['scale'] + q['bias'])

            h = ln(xs, p['ln_1'])
            qkv = (jnp.dot(h.astype(dt), p['attn']['qkv']['kernel'],
                           preferred_element_type=jnp.float32)
                   + p['attn']['qkv']['bias'])
            q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
            hd = d // heads
            kc = ck[i].astype(jnp.float32).reshape(b, wpad, heads, hd)
            vc = cv[i].astype(jnp.float32).reshape(b, wpad, heads, hd)
            kc = kc.at[:, pos].set(k.reshape(b, heads, hd))
            vc = vc.at[:, pos].set(v.reshape(b, heads, hd))
            logits = jnp.einsum(
                'bhd,blhd->bhl',
                q.reshape(b, heads, hd).astype(dt).astype(jnp.float32),
                kc.astype(dt).astype(jnp.float32)) * (hd ** -0.5)
            valid = jnp.arange(wpad)[None, None, :] <= pos
            logits = jnp.where(valid, logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum('bhl,blhd->bhd',
                           attn.astype(dt).astype(jnp.float32),
                           vc.astype(dt).astype(jnp.float32)
                           ).reshape(b, d)
            o = (jnp.dot(o.astype(dt), p['attn']['out']['kernel'],
                         preferred_element_type=jnp.float32)
                 + p['attn']['out']['bias'])
            x1 = xs + o
            h2 = ln(x1, p['ln_2'])
            f = (jnp.dot(h2.astype(dt), p['mlp']['fc']['kernel'],
                         preferred_element_type=jnp.float32)
                 + p['mlp']['fc']['bias'])
            g = f * jax.nn.sigmoid(1.702 * f)
            xs = x1 + (jnp.dot(g.astype(dt), p['mlp']['proj']['kernel'],
                               preferred_element_type=jnp.float32)
                       + p['mlp']['proj']['bias'])
        err = float(jnp.max(jnp.abs(xs - y)))
        rel = err / float(jnp.max(jnp.abs(xs)) + 1e-9)
        print('ref max abs err', err, 'rel', rel)


if __name__ == '__main__':
    main()
