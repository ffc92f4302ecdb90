"""Native C++ loader core: build, decode, Pillow-compatible resize."""

import numpy as np
import pytest
from PIL import Image

from mmvid_tpu import native


@pytest.fixture(scope='module')
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip(f'native build unavailable: {native._build_error}')
    return lib


def _save_images(tmp_path, n=4, h=37, w=53):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f'img{i}.png'
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        jp = tmp_path / f'img{i}.jpg'
        Image.fromarray(arr).save(jp, quality=95)
        paths.append(str(jp))
    return paths


def test_decode_matches_pil(lib, tmp_path):
    paths = _save_images(tmp_path)
    for p in paths[:2]:  # png (lossless): decode must match PIL exactly
        if not p.endswith('.png'):
            continue
        import ctypes
        h, w = ctypes.c_int(), ctypes.c_int()
        assert lib.mmvid_image_dims(p.encode(), ctypes.byref(h),
                                    ctypes.byref(w)) == 0
        assert (h.value, w.value) == (37, 53)


def test_resize_matches_pillow(lib):
    rng = np.random.RandomState(1)
    src = rng.randint(0, 255, (64, 48, 3), dtype=np.uint8)
    for size in (24, 32, 96):  # down- and upscaling
        ours = native.resize_normalize(src, size)
        ref = np.asarray(Image.fromarray(src).resize(
            (size, size), Image.BILINEAR), np.float32) / 255.0
        # identical triangle filter; Pillow rounds the horizontal pass to
        # uint8 before the vertical pass, we keep float intermediates, so
        # ties can land one 1/255 step apart
        diff = np.abs(ours - ref).max()
        assert diff <= (1.1 / 255.0), f'size {size}: max diff {diff}'
        frac_exact = (np.abs(ours - ref) < 1e-6).mean()
        assert frac_exact > 0.7, f'size {size}: only {frac_exact} exact'


def test_load_image_and_batch(lib, tmp_path):
    paths = _save_images(tmp_path)
    one = native.load_image(paths[0], 32)
    assert one.shape == (32, 32, 3)
    assert 0.0 <= one.min() and one.max() <= 1.0

    batch = native.load_batch(paths, 32, n_threads=4)
    assert batch.shape == (len(paths), 32, 32, 3)
    np.testing.assert_allclose(batch[0], one)

    # png path must agree with the PIL fallback pipeline
    from mmvid_tpu.data.transforms import open_rgb, resize_exact, to_array
    ref = to_array(resize_exact(open_rgb(paths[0]), (32, 32)))
    assert np.abs(batch[0] - ref).max() <= 1.5 / 255.0


def test_missing_file_fails_gracefully(lib, tmp_path):
    import ctypes
    out = np.empty((8, 8, 3), np.float32)
    rc = lib.mmvid_load_image(str(tmp_path / 'nope.png').encode(), 8, 8,
                              out.ctypes.data_as(
                                  ctypes.POINTER(ctypes.c_float)))
    assert rc != 0


def test_dataset_native_clip_path(lib, tmp_path, monkeypatch):
    """TextVideoDataset with MMVID_NATIVE_LOADER=1 decodes whole clips via
    the C++ batch decoder and agrees with the PIL pipeline."""
    from PIL import Image

    from mmvid_tpu.data.datasets import TextVideoDataset

    root = tmp_path / 'mmvox'
    key = 'id0#a#0'
    d = root / 'video' / key
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for j in range(10):
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
                d / f'{j:04d}.png')
    (root / 'txt').mkdir()
    (root / 'txt' / f'{key}.txt').write_text('hello\n')

    def make(env):
        monkeypatch.setenv('MMVID_NATIVE_LOADER', env)
        ds = TextVideoDataset(str(root), text_len=10, image_size=32,
                              truncate_captions=True, tokenizer=None,
                              frame_num=4, frame_step=1, deterministic=True,
                              cache=str(tmp_path / f'c{env}.pkl'))
        return ds[0]['target']

    native_t = make('1')
    pil_t = make('0')
    assert native_t.shape == pil_t.shape == (4, 32, 32, 3)
    assert np.abs(native_t - pil_t).max() <= 1.5 / 255.0
