"""Host data-loader throughput: native C++ core (libjpeg + threaded batch
decode + Pillow-compatible resize) vs the PIL fallback, on synthetic JPEGs
at dataset-realistic sizes.  Prints one JSON line per variant.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    from mmvid_tpu import native

    n, src, out = 256, 256, 128
    tmp = tempfile.mkdtemp(prefix='mmvid_loader_bench_')
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(tmp, f'{i:04d}.jpg')
        Image.fromarray(rng.randint(0, 255, (src, src, 3), np.uint8)
                        ).save(p, quality=90)
        paths.append(p)

    def pil_batch():
        from mmvid_tpu.data.transforms import (
            open_rgb, resize_exact, to_array)
        return np.stack([to_array(resize_exact(open_rgb(p), (out, out)))
                         for p in paths])

    def run(tag, fn, iters=3):
        fn()  # warm page cache
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({'what': tag, 'images': n,
                          'images_s': round(n / dt, 1),
                          'ms': round(dt * 1e3, 1)}), flush=True)
        return r

    a = run('pil_fallback', pil_batch)
    lib = native.get_lib()
    if lib is not None:
        import ctypes

        def native_batch():
            # call the C entry directly: load_batch() silently falls back
            # to PIL on failure, which would benchmark PIL against itself
            buf = np.empty((n, out, out, 3), np.float32)
            arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
            failed = lib.mmvid_load_batch(
                arr, n, out, out,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 0)
            assert failed == 0, f'{failed} images failed native decode'
            return buf

        b = run('native_batch', native_batch)
        err = float(np.max(np.abs(a - b)))
        print(json.dumps({'what': 'max_pixel_delta', 'value': round(err, 4)}))
    else:
        print(json.dumps({'what': 'native_batch', 'error': 'unavailable'}))


if __name__ == '__main__':
    main()
