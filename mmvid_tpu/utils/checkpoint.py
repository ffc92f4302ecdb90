"""Checkpoint save/load.

Native format: orbax-checkpoint directories ``<log_dir>/weights/<iter>/``
mirroring the reference's layout (``weights/<iter>/dalle.pt`` + ``weights/
last``, reference utils/utils_train.py:297-305, train.py:341-354).  The
stored tree is ``{step, params, opt_state?, hparams}``; test-time discovery
picks the numerically-latest iter like the reference's natsort
(test.py:51-57).

Torch-format reading lives in mmvid_tpu.utils.torch_compat.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt_dir(log_dir: str, tag) -> str:
    return os.path.join(log_dir, 'weights', str(tag))


def save_checkpoint(log_dir: str, step: int, tree: Dict[str, Any],
                    hparams: Optional[Dict] = None, keep_last: bool = True):
    """Write weights/<step>/ and refresh weights/last/."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(_ckpt_dir(log_dir, step))
    ckptr.save(path, tree, force=True)
    if hparams is not None:
        with open(os.path.join(path, 'hparams.json'), 'w') as f:
            json.dump(_jsonable(hparams), f, indent=2, default=str)
    if keep_last:
        last = os.path.abspath(_ckpt_dir(log_dir, 'last'))
        ckptr.save(last, tree, force=True)
        if hparams is not None:
            with open(os.path.join(last, 'hparams.json'), 'w') as f:
                json.dump(_jsonable(hparams), f, indent=2, default=str)
    return path


def _numeric_iters(root: str):
    """Numeric weights/<iter> dir names — the single definition both
    resume discovery and retention pruning agree on."""
    if not os.path.isdir(root):
        return []
    return sorted((d for d in os.listdir(root)
                   if re.fullmatch(r'\d+', d)), key=int)


def latest_checkpoint(log_dir: str) -> Optional[str]:
    """Numerically-latest weights/<iter>/ (reference natsort, test.py:51-57)."""
    iters = _numeric_iters(os.path.join(log_dir, 'weights'))
    if iters:
        return _ckpt_dir(log_dir, iters[-1])
    if os.path.isdir(_ckpt_dir(log_dir, 'last')):
        return _ckpt_dir(log_dir, 'last')
    return None


def load_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.abspath(path), item=target)
    hfile = os.path.join(path, 'hparams.json')
    hparams = None
    if os.path.exists(hfile):
        with open(hfile) as f:
            hparams = json.load(f)
    return tree, hparams


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


class AsyncCheckpointWriter:
    """Overlap checkpoint writes with training (beyond-parity; the
    reference's torch.save blocks the loop, utils_train.py:297-305).

    The caller still does the device->host transfer (building the tree);
    the orbax/file write runs on one worker thread.  ``submit`` first joins
    any in-flight write, so at most one checkpoint is buffered in host RAM
    and ``weights/last`` is never written concurrently.  Call ``wait()``
    before any synchronous save and at shutdown; a worker exception
    surfaces on the next submit()/wait().
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(1, 'ckpt-writer')
        self._inflight = None

    def submit(self, *args, **kwargs):
        self.wait()
        self._inflight = self._pool.submit(save_checkpoint, *args, **kwargs)

    def wait(self):
        if self._inflight is not None:
            f, self._inflight = self._inflight, None
            f.result()


def prune_checkpoints(log_dir: str, keep_n: int):
    """Delete all but the newest ``keep_n`` NUMERIC weights/<iter> dirs
    (beyond-parity; the reference keeps every periodic save).  'last',
    'preempt_at_*', and 'nan_at_*' are never pruned.  No-op for
    keep_n <= 0 (reference behavior: keep everything)."""
    if keep_n <= 0:
        return
    import shutil
    root = os.path.join(log_dir, 'weights')
    for d in _numeric_iters(root)[:-keep_n]:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
