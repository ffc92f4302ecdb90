"""HTML/GIF/MP4 reporting (reference utils/utils_html.py:18-242).

The reference builds pages with the `dominate` DOM library; here plain HTML
strings (no extra dependency).  Same artifact layout: <web_dir>/index.html +
<web_dir>/images/*.{png,gif,mp4}, one row per sample with captions, with a
pickle cache so pages survive resumes (utils_html.py:18-120).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence

import numpy as np


def save_image_array(path: str, img: np.ndarray):
    """HWC float [0,1] -> PNG."""
    from PIL import Image
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def save_gif(path: str, frames: np.ndarray, fps: int = 4):
    """[T,H,W,3] float [0,1] -> animated GIF (utils_html.py:157-190)."""
    import imageio
    imageio.mimsave(path, [(np.clip(f, 0, 1) * 255).astype(np.uint8)
                           for f in frames], duration=1000 / fps, loop=0)


def save_mp4(path: str, frames: np.ndarray, fps: int = 4):
    try:
        import imageio
        writer = imageio.get_writer(path, fps=fps)
        for f in frames:
            writer.append_data((np.clip(f, 0, 1) * 255).astype(np.uint8))
        writer.close()
    except (ImportError, ValueError):
        # no imageio ffmpeg backend: fall back to OpenCV's writer
        import cv2
        h, w = frames.shape[1:3]
        out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                              fps, (w, h))
        for f in frames:
            bgr = cv2.cvtColor((np.clip(f, 0, 1) * 255).astype(np.uint8),
                               cv2.COLOR_RGB2BGR)
            out.write(bgr)
        out.release()


def tile_video_row(frames: np.ndarray) -> np.ndarray:
    """[T,H,W,3] -> [H, T*W, 3] horizontal strip."""
    return np.concatenate(list(frames), axis=1)


def tile_grid(rows: Sequence[np.ndarray], pad: int = 2) -> np.ndarray:
    """List of [H, W_i, 3] rows -> single grid image (white padding)."""
    width = max(r.shape[1] for r in rows)
    out = []
    for r in rows:
        if r.shape[1] < width:
            r = np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0)),
                       constant_values=1.0)
        out.append(np.pad(r, ((0, pad), (0, 0), (0, 0)),
                          constant_values=1.0))
    return np.concatenate(out, axis=0)


class HTML:
    """Accumulating web page: header + (caption, media) rows."""

    def __init__(self, web_dir: str, title: str, reverse: bool = False,
                 refresh: int = 0):
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, 'images')
        self.title = title
        self.reverse = reverse
        self.refresh = refresh
        os.makedirs(self.img_dir, exist_ok=True)
        self.rows: List = []
        self._cache = os.path.join(web_dir, 'page_cache.pkl')
        if os.path.exists(self._cache):
            try:
                with open(self._cache, 'rb') as f:
                    self.rows = pickle.load(f)
            except Exception:
                self.rows = []

    def add_header(self, text: str):
        self.rows.append(('header', text))

    def add_media_row(self, items: Sequence[tuple], height: int = 128):
        """items: (filename-under-images/, caption) pairs."""
        self.rows.append(('media', list(items), height))

    def save_media(self, name: str, array: np.ndarray, fps: int = 4) -> str:
        """Save an image ([H,W,3]) or video ([T,H,W,3]) under images/."""
        path = os.path.join(self.img_dir, name)
        if array.ndim == 4:
            if name.endswith('.gif'):
                save_gif(path, array, fps)
            else:
                save_mp4(path, array, fps)
        else:
            save_image_array(path, array)
        return name

    def save(self):
        rows = list(reversed(self.rows)) if self.reverse else self.rows
        parts = ['<!DOCTYPE html><html><head>',
                 f'<title>{self.title}</title>']
        if self.refresh:
            parts.append(
                f'<meta http-equiv="refresh" content="{self.refresh}">')
        parts.append('<style>td{padding:4px;text-align:center;'
                     'font-family:monospace;font-size:12px}</style>')
        parts.append(f'</head><body><h1>{self.title}</h1>')
        for row in rows:
            if row[0] == 'header':
                parts.append(f'<h3>{row[1]}</h3>')
            else:
                _, items, height = row
                parts.append('<table><tr>')
                for fname, caption in items:
                    if fname.endswith('.mp4'):
                        media = (f'<video height="{height}" controls '
                                 f'autoplay loop muted>'
                                 f'<source src="images/{fname}"></video>')
                    else:
                        media = (f'<img height="{height}" '
                                 f'src="images/{fname}">')
                    parts.append(f'<td>{media}<br>{caption}</td>')
                parts.append('</tr></table>')
        parts.append('</body></html>')
        with open(os.path.join(self.web_dir, 'index.html'), 'w') as f:
            f.write('\n'.join(parts))
        with open(self._cache, 'wb') as f:
            pickle.dump(self.rows, f)


def initialize_webpage(web_dir: str, title: str, reverse: bool = False
                       ) -> HTML:
    return HTML(web_dir, title, reverse=reverse)
