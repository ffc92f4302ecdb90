"""Flagship TRAINING-step throughput on the current device.

Measures the full 3-forward MSM/REL/VID step (frozen-VQGAN tokenization of
targets + warped VID negatives included) at flagship size — the training
counterpart of bench.py's sampling headline.  Prints one JSON line per
batch size; results recorded in ROADMAP.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('MMVID_PALLAS_ATTN', '1')


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

    from __graft_entry__ import _flagship
    from mmvid_tpu.parallel.mesh import make_mesh
    from mmvid_tpu.training import (
        TrainConfig,
        create_train_state,
        jit_train_step,
    )

    batches = [int(b) for b in sys.argv[1:]] or [8, 16]
    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    # flagship text_to_video recipe: beta 7/0.5/0.5, remat for the
    # 3-forward step's activation memory
    import dataclasses
    model.cfg = dataclasses.replace(
        model.cfg, clip=dataclasses.replace(model.cfg.clip, remat=True))
    model.core = type(model.core)(model.cfg, dtype=jnp.bfloat16)
    tc = TrainConfig(beta_msm=7.0, beta_rel=0.5, beta_vid=0.5,
                     lr_scheduler_warmup=5000, dropout_vc=0.1)
    mesh = make_mesh(f'dp=1', devices=jax.devices()[:1])
    step = jit_train_step(model, tc, mesh=mesh)

    for b in batches:
        state = step.shard_state(create_train_state(model, tc))
        rng = np.random.RandomState(0)
        batch = {
            'text': jnp.asarray(rng.randint(1, 49000, (b, 50)), jnp.int32),
            'target': jnp.asarray(rng.uniform(0, 1, (b, 8, 128, 128, 3)),
                                  jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        state, m = step(state, batch, key)  # compile
        float(m['loss'])
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        loss = float(m['loss'])  # forces the chain
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            'what': 'train_step', 'batch': b,
            'ms': round(dt * 1000, 1),
            'videos_s': round(b / dt, 2),
            'frames_s': round(b * 8 / dt, 1),
            'loss': round(loss, 3)}), flush=True)

        if os.environ.get('MMVID_TRAIN_TRACE') == '1':
            # device trace of ONE step -> top leaf spans (VERDICT r2 #7)
            trace_dir = f'/tmp/mmvid_train_trace_b{b}'
            jax.profiler.start_trace(trace_dir)
            state, m = step(state, batch, jax.random.fold_in(key, 99))
            float(m['loss'])
            jax.profiler.stop_trace()
            from trace_decode import print_top_leaf_spans
            print_top_leaf_spans(trace_dir)


if __name__ == '__main__':
    main()
