"""Fused 2-layer per-sample MLP: out = relu(x1·W1a + x2·W1b + b1)·W2 + b2.

The renderer applies this shape of MLP to every epipolar sample (the
exchange fuse encoder, models.py:335-346, and the key/query embeds). As
separate XLA dots the hidden activation (M, 576) is materialized with a
relu + lane-tile pad (~7 ms at flagship sizes) and each dot re-reads its
operand from HBM. This kernel keeps the whole chain in VMEM per 1024-row
block with the weights resident: one read of x, one write of out.

Forward-only on TPU; gradients fall back to the jnp formulation via a
custom VJP (training ray counts are small).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_M = 1024


def _on_tpu() -> bool:
    return jax.default_backend() in ('tpu', 'axon')


def _mlp2_ref(x1, x2, w1a, w1b, b1, w2, b2):
    h = x1 @ w1a + b1
    if x2 is not None:
        h = h + x2 @ w1b
    h = jax.nn.relu(h)
    return h @ w2 + b2


def _kernel(x1_ref, x2_ref, w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref,
            out_ref):
    h = jnp.dot(x1_ref[:], w1a_ref[:],
                preferred_element_type=jnp.float32)
    h = h + jnp.dot(x2_ref[:], w1b_ref[:],
                    preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(w2_ref.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + b2_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_mlp2(x1: Array, x2: Array, w1a: Array, w1b: Array, b1: Array,
               w2: Array, b2: Array) -> Array:
    """relu((x1 ‖ x2) @ [w1a; w1b] + b1) @ w2 + b2 without materializing
    the concat or the hidden activation.

    Args:
      x1: (M, K1); x2: (M, K2) — the pre-split input segments.
      w1a: (K1, H); w1b: (K2, H); b1: (H,); w2: (H, O); b2: (O,).

    Returns (M, O) in x1's dtype.
    """
    return _forward(x1, x2, w1a, w1b, b1, w2, b2)


def _forward(x1, x2, w1a, w1b, b1, w2, b2):
    M, K1 = x1.shape
    H = w1a.shape[1]
    O = w2.shape[1]
    dt = x1.dtype
    if not _on_tpu() or M % BLOCK_M:
        return _mlp2_ref(x1, x2, w1a.astype(dt), w1b.astype(dt),
                         b1.astype(dt), w2.astype(dt),
                         b2.astype(dt)).astype(dt)

    grid = (M // BLOCK_M,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_M, K1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_M, x2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((x2.shape[1], H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_M, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, O), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x1, x2.astype(dt), w1a.astype(dt), w1b.astype(dt),
      b1.reshape(1, H).astype(jnp.float32), w2.astype(dt),
      b2.reshape(1, O).astype(jnp.float32))
    return out


def _fwd(x1, x2, w1a, w1b, b1, w2, b2):
    return _forward(x1, x2, w1a, w1b, b1, w2, b2), (x1, x2, w1a, w1b, b1,
                                                    w2, b2)


def _bwd(res, g):
    x1, x2, w1a, w1b, b1, w2, b2 = res

    def ref(x1_, x2_, w1a_, w1b_, b1_, w2_, b2_):
        dt = x1_.dtype
        return _mlp2_ref(x1_, x2_, w1a_.astype(dt), w1b_.astype(dt),
                         b1_.astype(dt), w2_.astype(dt),
                         b2_.astype(dt)).astype(dt)

    _, vjp = jax.vjp(ref, x1, x2, w1a, w1b, b1, w2, b2)
    return vjp(g)


fused_mlp2.defvjp(_fwd, _bwd)
