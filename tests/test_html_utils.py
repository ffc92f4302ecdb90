"""HTML/GIF reporting + checkpoint discovery edge cases."""

import os

import numpy as np
import pytest

from mmvid_tpu.utils.html import (
    HTML,
    initialize_webpage,
    save_gif,
    save_image_array,
    save_mp4,
    tile_grid,
    tile_video_row,
)

pytestmark = pytest.mark.quick


def test_tile_video_row_and_grid():
    frames = np.random.rand(3, 8, 8, 3).astype(np.float32)
    row = tile_video_row(frames)
    assert row.shape == (8, 24, 3)
    grid = tile_grid([row, np.random.rand(8, 16, 3).astype(np.float32)])
    assert grid.shape[1] == 24  # widest row, narrow one padded
    assert grid.shape[0] == 2 * (8 + 2)  # two rows + padding


def test_media_files(tmp_path):
    img = np.random.rand(8, 8, 3).astype(np.float32)
    vid = np.random.rand(4, 8, 8, 3).astype(np.float32)
    save_image_array(str(tmp_path / 'a.png'), img)
    save_gif(str(tmp_path / 'a.gif'), vid)
    save_mp4(str(tmp_path / 'a.mp4'), vid)
    for n in ('a.png', 'a.gif', 'a.mp4'):
        assert (tmp_path / n).stat().st_size > 0


def test_webpage_resume(tmp_path):
    web = str(tmp_path / 'web')
    page = initialize_webpage(web, 'test page')
    page.add_header('iteration 1')
    name = page.save_media('s0.gif', np.random.rand(2, 8, 8, 3))
    page.add_media_row([(name, 'a caption')])
    page.save()
    html = (tmp_path / 'web' / 'index.html').read_text()
    assert 'test page' in html and 'a caption' in html
    assert 'images/s0.gif' in html

    # resume: a fresh HTML object picks up cached rows (utils_html.py:18-120)
    page2 = HTML(web, 'test page')
    assert len(page2.rows) == 2
    page2.add_header('iteration 2')
    page2.save()
    html2 = (tmp_path / 'web' / 'index.html').read_text()
    assert 'iteration 1' in html2 and 'iteration 2' in html2


def test_latest_checkpoint_fallback(tmp_path):
    from mmvid_tpu.utils.checkpoint import latest_checkpoint
    assert latest_checkpoint(str(tmp_path)) is None
    os.makedirs(tmp_path / 'weights' / 'last')
    assert latest_checkpoint(str(tmp_path)).endswith('last')
    os.makedirs(tmp_path / 'weights' / '100')
    os.makedirs(tmp_path / 'weights' / '99')
    assert latest_checkpoint(str(tmp_path)).endswith('100')  # numeric order


def test_config_custom_transformer_and_mesh_flags():
    from mmvid_tpu.config import process_args
    args = process_args(train=True, argv=[
        '--image_text_folder', 'x',
        '--which_transformer', 'custom:256:4:4', '--dim', '256',
        '--mesh_shape', 'dp=2,tp=4', '--bf16'])
    assert args.which_transformer == 'custom:256:4:4'
    assert args.mesh_shape == 'dp=2,tp=4' and args.bf16
    from mmvid_tpu.factories import build_clip_config
    cfg = build_clip_config(args)
    assert (cfg.width, cfg.layers, cfg.heads) == (256, 4, 4)
