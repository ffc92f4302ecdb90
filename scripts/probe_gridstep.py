"""Measure Mosaic per-grid-step cost: trivial kernel over a (layers, phases)
grid with per-layer-indexed weight blocks — isolates the pipeline overhead
that dominates the whole-token decode kernel (ROADMAP round 3)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def main():
    n_layers, n_ph = 12, 16
    d = 768
    sem = sys.argv[1] if len(sys.argv) > 1 else 'arbitrary'
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(n_layers, 3, d, d)*.02, dt)
    x = jnp.asarray(rng.randn(16, d), jnp.float32)

    def kernel(x_ref, w_ref, y_ref, acc):
        l = pl.program_id(0); ph = pl.program_id(1)
        @pl.when((l == 0) & (ph == 0))
        def _():
            acc[:] = x_ref[:]
        @pl.when(ph == 0)
        def _():
            acc[:] = acc[:] + jnp.dot(acc[:].astype(w_ref.dtype), w_ref[0, 0],
                                      preferred_element_type=jnp.float32) * 1e-3
        @pl.when((l == n_layers-1) & (ph == n_ph-1))
        def _():
            y_ref[:] = acc[:]

    @jax.jit
    def run(x, w):
        def step(carry, i):
            y = pl.pallas_call(
                kernel,
                grid=(n_layers, n_ph),
                in_specs=[pl.BlockSpec((16, d), lambda l, ph: (0, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, 1, d, d), lambda l, ph: (l, jnp.minimum(ph, 2), 0, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((16, d), lambda l, ph: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, d), jnp.float32),
                scratch_shapes=[pltpu.VMEM((16, d), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(sem, sem),
                    vmem_limit_bytes=100*1024*1024),
            )(carry, w)
            return y, y[0, 0]
        carry, ys = jax.lax.scan(step, x, jnp.arange(64))
        return ys
    ys = run(x, w); float(ys[0])
    t0 = time.perf_counter()
    for _ in range(3):
        float(run(x, w)[-1])
    dtm = (time.perf_counter() - t0) / 3
    per_call = dtm / 64
    print(f'sem={sem} 64 calls x {n_layers*n_ph} steps: {dtm*1000:.1f} ms -> {per_call*1e6:.1f} us/call, {per_call/ (n_layers*n_ph) *1e6:.2f} us/grid-step')

if __name__ == '__main__':
    main()
