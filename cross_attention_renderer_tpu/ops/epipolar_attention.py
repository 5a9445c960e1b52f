"""Fused epipolar cross-attention (Pallas TPU kernel).

The renderer's attention contracts a per-sample query embedding against a
per-sample key embedding, softmaxes over the joint (view, sample) axis, and
takes the attention-weighted sum of per-sample latents
(models.py:532-541,555-565). In XLA this is ~6 separate HBM round-trips over
(B, V, R, P, 128/C) tensors (hundreds of MB at eval ray counts); the Pallas
kernel streams each ray block through VMEM exactly once.

  out, at_wt = epipolar_attention(query, key, value)
    query/key: (B, V, R, P, D) — D = 128 attention width
    value:     (B, V, R, P, C) — C = latent width
    out:       (B, R, C)       — summed over views (models.py:537-541)
    at_wt:     (B, V, R, P)    — joint softmax weights

Gradients fall back to the algebraically identical jnp reference
(``epipolar_attention_reference``) via ``jax.custom_vjp`` — training uses the
fused forward and a standard XLA backward.

Tile constraint: R is padded to a multiple of the ray block internally, so
any ray count works. P*V and C should be multiples of 8 for good layouts
(they are: 64*2=128, C=288 pads to 2 tiles of 128 + 32... acceptable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ATTN_SCALE = 1.0 / 16.0   # models.py:532,555
# Rb sizing: the value block (V, Rb, P, C) dominates VMEM; at the flagship
# config (V=2, P=64, C=288, f32) Rb=64 keeps the pipeline under ~40 MB of
# the 128 MB v5e VMEM including double buffering.
_RAY_BLOCK = 64


def epipolar_attention_reference(query: Array, key: Array, value: Array
                                 ) -> tuple[Array, Array]:
    """Pure-jnp reference (and backward path).

    Logits and softmax run in f32 regardless of the compute dtype (the
    standard mixed-precision policy): in bf16 the 128-wide q.k dot and the
    joint softmax lose enough mantissa that, once training sharpens the
    attention, the gradient noise destabilizes the run — the round-2
    "bf16 explodes late in training" failure reproduced at step ~3.6k of
    the capability config and bisected to exactly this stage."""
    B, V, R, P, _ = query.shape
    # Mixed-precision split, validated by the round-3 bf16 bisect: the
    # LOGITS (128-wide q.k accumulation) and the softmax run in f32 — in
    # bf16 their quantization noise destabilizes training once attention
    # sharpens (capability config explodes at ~step 3.6k; f32 here trains
    # 6k steps clean). The value reduction is a convex combination with
    # weights <= 1 and stays in the compute dtype: forcing IT to f32 makes
    # XLA materialize f32 copies of the (M, 288) latents (~8 ms/block)
    # for no observed stability benefit.
    dots = jnp.einsum('bvrpd,bvrpd->bvrp', query.astype(jnp.float32),
                      key.astype(jnp.float32)) * ATTN_SCALE
    flat = dots.transpose(0, 2, 1, 3).reshape(B, R, V * P)
    wt = jax.nn.softmax(flat, axis=-1)
    at_wt = wt.reshape(B, R, V, P).transpose(0, 2, 1, 3).astype(value.dtype)
    z = jnp.einsum('bvrp,bvrpc->brc', at_wt, value)
    return z, at_wt


def _attention_kernel(q_ref, k_ref, v_ref, out_ref, wt_ref):
    """One ray block. Block shapes (leading singleton batch dim):
    q/k (1, V, Rb, P, D), v (1, V, Rb, P, C), out (1, Rb, C),
    wt (1, V, Rb, P). V and P are static and small, so the joint softmax is
    a VMEM-resident max/exp/normalize without materializing the transpose.
    """
    q = q_ref[0]
    k = k_ref[0]
    V, Rb, P, D = q.shape
    # bf16 products, f32-accumulated dot + f32 softmax (the mixed-precision
    # policy of the jnp reference).
    prod = (q * k).astype(jnp.float32)
    dots = jnp.sum(prod, axis=-1) * ATTN_SCALE               # (V, Rb, P)
    # joint softmax over (V, P) without reshuffling the layout: reduce over
    # both the view axis (leading) and the sample axis (trailing).
    m = jnp.max(jnp.max(dots, axis=2, keepdims=True), axis=0, keepdims=True)
    e = jnp.exp(dots - m)                                    # (V, Rb, P)
    denom = jnp.sum(jnp.sum(e, axis=2, keepdims=True), axis=0,
                    keepdims=True)
    wt = e / denom                                           # (V, Rb, P)
    v = v_ref[0]                                             # (V, Rb, P, C)
    wt_ref[0] = wt.astype(wt_ref.dtype)
    acc = jnp.sum(wt.astype(v.dtype)[..., None].astype(jnp.float32)
                  * v.astype(jnp.float32), axis=(0, 2))
    out_ref[0] = acc.astype(out_ref.dtype)                   # (Rb, C)


def _forward_pallas(query: Array, key: Array, value: Array
                    ) -> tuple[Array, Array]:
    B, V, R, P, D = query.shape
    C = value.shape[-1]
    Rb = min(_RAY_BLOCK, R)
    pad = (-R) % Rb
    if pad:
        padder = lambda x: jnp.pad(
            x, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        query, key, value = padder(query), padder(key), padder(value)
    Rp = R + pad
    grid = (B, Rp // Rb)

    spec_qk = pl.BlockSpec((1, V, Rb, P, D),
                           lambda b, r: (b, 0, r, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, V, Rb, P, C),
                          lambda b, r: (b, 0, r, 0, 0),
                          memory_space=pltpu.VMEM)

    out, wt = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[spec_qk, spec_qk, spec_v],
        out_specs=(
            pl.BlockSpec((1, Rb, C), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, Rb, P), lambda b, r: (b, 0, r, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Rp, C), value.dtype),
            jax.ShapeDtypeStruct((B, V, Rp, P), query.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(query, key, value)
    return out[:, :R], wt[:, :, :R]


@jax.custom_vjp
def epipolar_attention(query: Array, key: Array, value: Array
                       ) -> tuple[Array, Array]:
    """Fused joint-softmax attention; see module docstring."""
    return _forward_pallas(query, key, value)


def _fwd(query, key, value):
    out = _forward_pallas(query, key, value)
    return out, (query, key, value)


def _bwd(residuals, grads):
    query, key, value = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: epipolar_attention_reference(q, k, v),
        query, key, value)
    return vjp(grads)


epipolar_attention.defvjp(_fwd, _bwd)
