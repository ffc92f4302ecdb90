"""Probe: does int8 MXU issue at 2x bf16 rate through XLA on this chip?

Times bare dot_general at the flagship MLP shape ([B*L, 768] x [768, 3072])
in bf16 and int8, plus a dynamically-quantized int8 matmul including the
quantize/dequantize epilogue — the decision gate for building an int8
serving path (results recorded in ROADMAP.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
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
    x_bf = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w_bf = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
    w_i8 = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
    w_scale = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)

    @jax.jit
    def dot_bf16(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    @jax.jit
    def dot_i8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    @jax.jit
    def dot_i8_dynq(a, b, ws):
        # per-row dynamic activation quant + int8 MXU + dequant epilogue
        s = jnp.max(jnp.abs(a), axis=1, keepdims=True).astype(jnp.float32)
        q = jnp.round(a.astype(jnp.float32) * (127.0 / s)).astype(jnp.int8)
        acc = jax.lax.dot(q, b, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s / 127.0) *
                ws[None, :]).astype(jnp.bfloat16)

    flops = 2 * m * k * n
    for name, fn, args in (
            ('bf16', dot_bf16, (x_bf, w_bf)),
            ('int8', dot_i8, (x_i8, w_i8)),
            ('int8_dynq', dot_i8_dynq, (x_bf, w_i8, w_scale))):
        dt = timeit(fn, *args)
        print(json.dumps({'what': name, 'us': round(dt * 1e6, 1),
                          'tflops': round(flops / dt / 1e12, 1)}),
              flush=True)


if __name__ == '__main__':
    main()
