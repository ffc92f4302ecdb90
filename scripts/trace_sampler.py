"""Capture a jax.profiler device trace of the decode-free flagship sampler
and print the top fusions by device time (xplane parsing via
tensorboard_plugin_profile).  Drives the ROADMAP perf table."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('MMVID_PALLAS_ATTN', '1')
os.environ.setdefault('MMVID_PALLAS_SAMPLER', '1')


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/mmvid_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    from __graft_entry__ import _flagship

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/mmvid_trace'
    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    text = jnp.ones((batch, model.cfg.text_seq_len), jnp.int32)
    key = jax.random.PRNGKey(0)

    def sample(k, decode):
        v, s = model.generate_images(k, text, mask_predict_steps=20,
                                     dynamic=False, decode=decode)
        return v if decode else s

    def force(x):
        return float(jnp.sum(x.reshape(-1)[:1]))

    force(sample(key, True))  # compile both
    jax.profiler.start_trace(trace_dir)
    force(sample(jax.random.fold_in(key, 1), True))
    jax.profiler.stop_trace()

    # ---- parse: sum device-op durations from the xplane proto ----
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    files = sorted(glob.glob(
        os.path.join(trace_dir, '**', '*.xplane.pb'), recursive=True))
    if not files:
        print('no xplane found under', trace_dir)
        return
    xspace = files[-1]
    params = {'graph_viewer_options': {}}
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xspace], 'framework_op_stats', params)
        print(data[:4000] if isinstance(data, str) else str(data)[:4000])
    except Exception as e:
        print('op_stats failed:', e)
        # fallback: hlo_op_stats naming varies across versions
        for tool in ('hlo_stats', 'op_profile'):
            try:
                data, _ = raw_to_tool_data.xspace_to_tool_data(
                    [xspace], tool, params)
                print(tool, ':', (data[:4000] if isinstance(data, str)
                                  else str(data)[:4000]))
                break
            except Exception as e2:
                print(tool, 'failed:', e2)


if __name__ == '__main__':
    main()
