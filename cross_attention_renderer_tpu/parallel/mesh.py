"""Device-mesh construction and sharding rules.

The scaling design (replacing the reference's single-node NCCL DP,
``training.py:21-28`` + ``train_realestate10k.py:60-135``):

  * axis ``data``  — batch-sharded training (DP). Gradients are reduced by
    XLA-inserted all-reduces over ICI; no hand-written comm.
  * axis ``model`` — tensor parallelism for the ViT/DPT encoder: attention
    QKV/out and MLP kernels sharded over heads / hidden dim (Megatron-style
    column->row split, giving one all-reduce per block pair).
  * axis ``rays``  — sequence-parallel rendering: query rays are independent
    until image assembly, so big eval/trajectory renders shard the ray axis
    (the TPU analog of the reference's Python chunk loops,
    ``eval_realestate10k.py:144-149``).

All sharding goes through ``jax.jit`` + ``NamedSharding`` annotations — the
"pick a mesh, annotate, let XLA insert collectives" recipe.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = Any


def make_mesh(data: int = 0, model: int = 1, rays: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model, rays) mesh; data=0 means 'all remaining'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == 0:
        assert n % (model * rays) == 0, (n, model, rays)
        data = n // (model * rays)
    assert data * model * rays == n, (data, model, rays, n)
    dev_array = np.asarray(devices).reshape(data, model, rays)
    return Mesh(dev_array, ('data', 'model', 'rays'))


# --- parameter partitioning (tensor parallelism) --------------------------

# path-regex -> PartitionSpec for the kernel. Megatron split: QKV + MLP fc1
# column-parallel (shard output dim), attention out + MLP fc2 row-parallel
# (shard input dim).
_TP_RULES: tuple[tuple[str, P], ...] = (
    (r'vit/block\d+/attn/(query|key|value)/kernel', P(None, 'model', None)),
    (r'vit/block\d+/attn/(query|key|value)/bias', P('model', None)),
    (r'vit/block\d+/attn/out/kernel', P('model', None, None)),
    (r'vit/block\d+/mlp_fc1/kernel', P(None, 'model')),
    (r'vit/block\d+/mlp_fc1/bias', P('model')),
    (r'vit/block\d+/mlp_fc2/kernel', P('model', None)),
    # DPT fusion RCUs: conv1 column-parallel (output channels), conv2
    # row-parallel (input channels) — the residual add after conv2's
    # all-reduce stays replicated.
    (r'refinenet\d+/rcu\d+/conv1/kernel', P(None, None, None, 'model')),
    (r'refinenet\d+/rcu\d+/conv1/bias', P('model')),
    (r'refinenet\d+/rcu\d+/conv2/kernel', P(None, None, 'model', None)),
    # Exchange / attention-input projections (where the render-path FLOPs
    # are): Megatron pairs around each relu.
    (r'query_encode_latent/kernel', P(None, 'model')),
    (r'query_encode_latent/bias', P('model')),
    (r'query_encode_latent_2/kernel', P('model', None)),
    (r'key_map/kernel', P(None, 'model')),
    (r'key_map/bias', P('model')),
    (r'key_map_2/kernel', P('model', None)),
    # Light-field decoder residual blocks.
    (r'phi/block\d+/fc_0/kernel', P(None, 'model')),
    (r'phi/block\d+/fc_0/bias', P('model')),
    (r'phi/block\d+/fc_1/kernel', P('model', None)),
)


def param_spec(path: str, value: Array) -> P:
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            if len(spec) == value.ndim:
                return spec
    return P()  # replicated


def param_shardings(params, mesh: Mesh):
    """PyTree of NamedShardings for a parameter tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                        for k in kp)

    specs = {path_str(kp): param_spec(path_str(kp), v) for kp, v in flat}

    def to_sharding(kp, v):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def scene_shardings(scene, mesh: Mesh, batch_axis: str = 'data'):
    """Shard every scene array along its leading (batch) dim."""
    def shard(x):
        spec = [None] * x.ndim
        if x.ndim >= 1 and x.shape[0] % mesh.shape[batch_axis] == 0:
            spec[0] = batch_axis
        return NamedSharding(mesh, P(*spec))
    return jax.tree.map(shard, scene)


def replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
