"""Flat npz (de)serialization for Flax param pytrees.

Orbax (train/trainer.py) is the production checkpoint format; this is the
lightweight single-file form used by tools (capability_run --save,
eval_pruned) where a copyable artifact beats a checkpoint directory.
Keys are '/'-joined pytree paths.
"""

from __future__ import annotations

import numpy as np

import jax


def _seg(k) -> str:
    if hasattr(k, 'key'):
        return str(k.key)
    if hasattr(k, 'idx'):
        return str(k.idx)
    return str(k)


def save_params(path: str, params) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {'/'.join(_seg(k) for k in kp): np.asarray(leaf)
           for kp, leaf in flat}
    np.savez_compressed(path, **out)


def load_params(path: str) -> dict:
    """Returns the nested {'params': ...} dict ready for ``model.apply``."""
    data = np.load(path)
    root: dict = {}
    for key in data.files:
        node = root
        parts = key.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return root
