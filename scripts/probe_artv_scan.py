"""In-scan probe for the whole-token decode kernel: minimal lax.scan of
decode_token_step + stacked cache update at flagship shape."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def main():
    from mmvid_tpu.ops.artv_decode import decode_token_step, stack_decode_params
    b, wpad, d, heads, n_layers = 16, 256, 768, 12, 12
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ctrl = 116
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    def blk():
        return {'ln_1': {'scale': jnp.ones(d), 'bias': jnp.zeros(d)},
                'ln_2': {'scale': jnp.ones(d), 'bias': jnp.zeros(d)},
                'attn': {'qkv': {'kernel': jnp.asarray(rng.randn(d, 3*d)*.02, dt), 'bias': jnp.zeros(3*d)},
                         'out': {'kernel': jnp.asarray(rng.randn(d, d)*.02, dt), 'bias': jnp.zeros(d)}},
                'mlp': {'fc': {'kernel': jnp.asarray(rng.randn(d, 4*d)*.02, dt), 'bias': jnp.zeros(4*d)},
                        'proj': {'kernel': jnp.asarray(rng.randn(4*d, d)*.02, dt), 'bias': jnp.zeros(d)}}}
    stacked = stack_decode_params([blk() for _ in range(n_layers)], d)
    ck = jnp.asarray(rng.randn(n_layers, b, wpad, d)*0.1, dt)
    cv = jnp.asarray(rng.randn(n_layers, b, wpad, d)*0.1, dt)
    x0 = jnp.asarray(rng.randn(b, d), jnp.float32)

    @jax.jit
    def run(ck, cv, x0):
        def step(carry, i):
            ck, cv, x = carry
            pos = ctrl + i
            y, kn, vn = decode_token_step(x, stacked, ck, cv, pos, heads)
            ck = jax.lax.dynamic_update_slice(ck, kn[:, :, None, :], (0, 0, pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, vn[:, :, None, :], (0, 0, pos, 0))
            return (ck, cv, y * 0.1), y[0, 0]
        carry, ys = jax.lax.scan(step, (ck, cv, x0), jnp.arange(steps))
        return ys
    import time
    ys = run(ck, cv, x0)
    print('first val', float(ys[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        ys = run(ck, cv, x0)
        float(ys[-1])
    dtm = (time.perf_counter() - t0) / 3
    print('OK scan', steps, 'steps', round(dtm*1000, 1), 'ms ->', round(dtm/steps*1e6, 1), 'us/token')

if __name__ == '__main__':
    main()
