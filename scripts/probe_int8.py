"""Probe: does int8 MXU issue at 2x bf16 rate through XLA on this chip?

Chains 32 MLP-shaped matmul pairs ([B*L,768]x[768,3072] then back) inside
one jit so tunnel dispatch overhead is amortized — the decision gate for
building an int8 serving path (results recorded in ROADMAP.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

STEPS = 32


def timeit(fn, *args, iters=5):
    import jax.numpy as jnp
    r = fn(*args)
    float(jnp.sum(jnp.asarray(r, jnp.float32).reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(jnp.asarray(r, jnp.float32).reshape(-1)[:1]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/mmvid_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    m, k, n = 48 * 576, 768, 3072
    rng = np.random.RandomState(0)
    x_bf = jnp.asarray(rng.randn(m, k) * 0.1, jnp.bfloat16)
    w1_bf = jnp.asarray(rng.randn(k, n) * 0.02, jnp.bfloat16)
    w2_bf = jnp.asarray(rng.randn(n, k) * 0.02, jnp.bfloat16)
    w1_i8 = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
    w2_i8 = jnp.asarray(rng.randint(-127, 127, (n, k)), jnp.int8)

    @jax.jit
    def chain_bf16(x, w1, w2):
        def body(i, y):
            h = jax.lax.dot(y, w1, preferred_element_type=jnp.float32)
            y = jax.lax.dot(h.astype(jnp.bfloat16), w2,
                            preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, STEPS, body, x)

    @jax.jit
    def chain_i8(x, w1, w2):
        # static-range int8 x int8 with per-step requantization (the
        # cheapest-possible quantized inner loop: one rescale per matmul)
        def q(a):
            return jnp.clip(jnp.round(a), -127, 127).astype(jnp.int8)

        def body(i, y):
            h = jax.lax.dot(y, w1, preferred_element_type=jnp.int32)
            h = q(h.astype(jnp.float32) * (1.0 / 512))
            y = jax.lax.dot(h, w2, preferred_element_type=jnp.int32)
            return q(y.astype(jnp.float32) * (1.0 / 512))
        return jax.lax.fori_loop(0, STEPS, body, q(x * 127))

    @jax.jit
    def chain_i8_dynq(x, w1, w2):
        # per-row dynamic activation quant (what a real w8a8 layer does)
        def dynq(a):
            s = jnp.max(jnp.abs(a), axis=1, keepdims=True) + 1e-6
            return (jnp.round(a * (127.0 / s)).astype(jnp.int8), s)

        def body(i, y):
            qy, s = dynq(y.astype(jnp.float32))
            h = jax.lax.dot(qy, w1, preferred_element_type=jnp.int32)
            h = h.astype(jnp.float32) * (s / 127.0 / 64.0)
            qh, s2 = dynq(h)
            y = jax.lax.dot(qh, w2, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (s2 / 127.0 / 64.0)).astype(
                jnp.bfloat16)
        return jax.lax.fori_loop(0, STEPS, body, x)

    @jax.jit
    def chain_i8_scalar(x, w1, w2):
        # per-TENSOR dynamic activation scale: one scalar abs-max reduce
        # (cheap, fuses) instead of the per-row [M,1] that killed dynq
        def dynq(a):
            s = jnp.max(jnp.abs(a)) + 1e-6
            return (jnp.round(a * (127.0 / s)).astype(jnp.int8), s)

        def body(i, y):
            qy, s = dynq(y.astype(jnp.float32))
            h = jax.lax.dot(qy, w1, preferred_element_type=jnp.int32)
            h = h.astype(jnp.float32) * (s / 127.0 / 64.0)
            qh, s2 = dynq(h)
            y = jax.lax.dot(qh, w2, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (s2 / 127.0 / 64.0)).astype(
                jnp.bfloat16)
        return jax.lax.fori_loop(0, STEPS, body, x)

    flops = 2 * m * k * n * 2 * STEPS
    for name, fn, args in (
            ('bf16_chain', chain_bf16, (x_bf, w1_bf, w2_bf)),
            ('int8_chain', chain_i8, (x_bf, w1_i8, w2_i8)),
            ('int8_dynq_chain', chain_i8_dynq, (x_bf, w1_i8, w2_i8)),
            ('int8_scalar_chain', chain_i8_scalar, (x_bf, w1_i8, w2_i8))):
        dt = timeit(fn, *args)
        print(json.dumps({'what': name, 'ms': round(dt * 1e3, 2),
                          'tflops': round(flops / dt / 1e12, 1)}),
              flush=True)


if __name__ == '__main__':
    main()
