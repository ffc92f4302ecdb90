"""FVD evaluation-protocol throughput at flagship size on the current
device: generation (20-step mask-predict) + ping-pong extension + I3D
embedding of real AND fake, i.e. everything inside evaluate()'s loop
(eval/evaluate.py; reference runs this over 2048 samples at batch 16,
utils_eval.py:60-97).  Random I3D weights — timing only, the numbers are
not FVD-comparable.  Prints one JSON line with the measured samples/sec
and the extrapolated wall-clock for the full 2048-sample protocol.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('MMVID_PALLAS_ATTN', '1')
os.environ.setdefault('MMVID_PALLAS_SAMPLER', '1')
os.environ['MMVID_ALLOW_RANDOM_I3D'] = '1'


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
    from mmvid_tpu.eval.evaluate import evaluate
    from mmvid_tpu.models.mmvid import DEFAULT_MP_CONFIG

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    if os.environ.get('MMVID_INT8') == '1':
        from mmvid_tpu.ops.int8 import quantize_for_serving
        model = quantize_for_serving(model)

    rng = np.random.RandomState(0)

    def batches():
        while True:
            yield {'text': rng.randint(1, 49000, (batch, 50)),
                   'target': rng.rand(batch, 8, 128, 128, 3
                                      ).astype(np.float32)}

    args = types.SimpleNamespace(
        seed=0, num_targets=8, eval_num=n, batch_size=batch,
        log_metric_dir='/tmp/mmvid_eval_bench',
        mask_predict_steps=[20], pnag_dynamic=False,
        mp_config=DEFAULT_MP_CONFIG, allow_random_i3d=True)

    # warmup/compile one loop iteration
    args.eval_num = batch
    evaluate(args, model, batches(), metrics=('fvd',))
    args.eval_num = n
    t0 = time.perf_counter()
    evaluate(args, model, batches(), metrics=('fvd', 'prd'))
    dt = time.perf_counter() - t0
    sps = n / dt
    print(json.dumps({
        'what': 'eval_protocol', 'batch': batch, 'samples': n,
        'samples_s': round(sps, 2),
        'protocol_2048_min': round(2048 / sps / 60, 1)}), flush=True)


if __name__ == '__main__':
    main()
