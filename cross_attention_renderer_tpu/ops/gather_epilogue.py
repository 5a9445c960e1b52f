"""Fused V=2 exchange epilogue (Pallas TPU) — the render hot path.

Everything between the epipolar row-takes and the attention stage of the
flagship V=2 renderer, in ONE kernel:

    bilinear combine (3 pyramid levels x 4 slots)          [VPU]
    fuse MLP  relu([feat ‖ tanh(pt/5)] @ W1 + b1) @ W2+b2  [MXU]  x2 streams
    per-view channel order  (v=0: [self,cross], v=1: [cross,self])
    latent_value / key_map / key_map_2 projections          [MXU]

As separate XLA ops this chain materializes, per 1M-sample block, the two
(M, 576) combine outputs, two (M, 576) relu hiddens (with lane-tile pad),
two (M, 288) fuse latents and an (M, 128) key hidden — ~6 HBM round-trips
that the round-2 trace billed at ~48 ms of the 99 ms block (19 ms combine
+ 22 ms matmuls + 7 ms relu pad, BENCH_NOTES.md). Here each take row is
read once and only the final (M, 288) joint latent + (M, 128) key value
are written. Replaces the XLA path of reference models.py:278-346,491,529.

Forward-only on TPU; gradients fall back to the jnp formulation via a
custom VJP (identical math, so training uses the fast forward too).

Layout contract (matches the renderer's (B, V, R, P) flattening):
  * sample m belongs to view v = (m // (R*P)) % 2 — blocks never straddle
    a view boundary because R*P % BLOCK_M == 0 is required;
  * aux rows pack [12 slot weights (4 per level), tanh(pt_self/5) (3),
    pad] — one (M, 16) float array per stream (model dtype in production).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

import os

BLOCK_M = int(os.environ.get('CAR_EPILOGUE_BLOCK', '512'))


def _on_tpu() -> bool:
    return jax.default_backend() in ('tpu', 'axon')


# ---------------------------------------------------------------------------
# jnp reference (the exact math; used on CPU, for gradients, and in tests)
# ---------------------------------------------------------------------------

def _combine(vals: Sequence[Array], aux: Array) -> Array:
    """Bilinear combine of per-level packed rows with aux slot weights.

    int8 rows (quantized tables) combine in the aux dtype; float rows keep
    their own dtype (the round-2 measured behavior)."""
    parts = []
    for l, v in enumerate(vals):
        cdt = (v.dtype if jnp.issubdtype(v.dtype, jnp.floating)
               else aux.dtype)
        C = v.shape[-1] // 4
        acc = None
        for k in range(4):
            term = (jax.lax.slice_in_dim(v, k * C, (k + 1) * C,
                                         axis=1).astype(cdt)
                    * aux[:, l * 4 + k:l * 4 + k + 1].astype(cdt))
            acc = term if acc is None else acc + term
        parts.append(acc)
    return jnp.concatenate(parts, axis=-1)


def _compute_dtype(vals_both, aux):
    dt = vals_both[0].dtype
    if not jnp.issubdtype(dt, jnp.floating):
        dt = aux.dtype                         # int8 tables: model dtype
    return dt


def _reference(vals_both, aux_self, aux_cross, params, rp):
    (w1, b1, w2, b2, lv, lv_bias, km, km_bias, k2, k2_bias) = params
    dt = _compute_dtype(vals_both, aux_self)
    M = vals_both[0].shape[0] // 2
    vals_self = [jax.lax.slice_in_dim(v, 0, M, axis=0) for v in vals_both]
    vals_cross = [jax.lax.slice_in_dim(v, M, 2 * M, axis=0)
                  for v in vals_both]
    F = w1.shape[0] - 3                    # feature width (576)
    O = w2.shape[1]                        # fuse output (288)

    def fuse(vals, aux):
        feat = _combine(vals, aux)
        x = jnp.concatenate([feat, aux[:, 12:15].astype(dt)], axis=-1)
        h = jax.nn.relu(x @ w1.astype(dt) + b1.astype(dt))
        return h @ w2.astype(dt) + b2.astype(dt)

    fs = fuse(vals_self, aux_self)
    fc = fuse(vals_cross, aux_cross)

    # view id per sample: (m // rp) % 2
    vid = (jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // rp) % 2
    a = jnp.where(vid == 0, fs, fc)
    b = jnp.where(vid == 0, fc, fs)
    jl = (a @ lv[:O].astype(dt) + b @ lv[O:].astype(dt)
          + lv_bias.astype(dt))
    kh = jax.nn.relu(a @ km[:O].astype(dt) + b @ km[O:].astype(dt)
                     + km_bias.astype(dt))
    kv = kh @ k2.astype(dt) + k2_bias.astype(dt)
    return jl, kv


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _make_kernel(channels: tuple[int, ...], rp: int, block_m: int):
    n_lvl = len(channels)
    offs = [sum(channels[:i]) for i in range(n_lvl + 1)]
    F = offs[-1]

    def kernel(*refs):
        vs = refs[:n_lvl]
        vc = refs[n_lvl:2 * n_lvl]
        (aux_s, aux_c, w1_ref, b1_ref, w2_ref, b2_ref, lv_ref, lvb_ref,
         km_ref, kmb_ref, k2_ref, k2b_ref, jl_ref, kv_ref) = refs[2 * n_lvl:]
        dt = vs[0].dtype
        if not jnp.issubdtype(dt, jnp.floating):
            dt = w2_ref.dtype                  # int8 tables: weights dtype
        O = w2_ref.shape[1]

        def fuse(v_refs, aux_ref):
            h = None
            # (BM, 16); any float dtype — combine casts to the model dtype
            # (matching the jnp reference), tanh rows accumulate in f32.
            aux = aux_ref[:]
            for l in range(n_lvl):
                v = v_refs[l][:]                               # (BM, 4C)
                if v.dtype != dt:
                    v = v.astype(dt)           # int8 tables: dequant-free
                C = channels[l]
                comb = None
                for k in range(4):
                    w = aux[:, l * 4 + k:l * 4 + k + 1].astype(dt)
                    t = v[:, k * C:(k + 1) * C] * w
                    comb = t if comb is None else comb + t
                t = jnp.dot(comb, w1_ref[offs[l]:offs[l + 1], :],
                            preferred_element_type=jnp.float32)
                h = t if h is None else h + t
            # tanh-pt rows of W1: 3 outer products on the VPU (a K=3 matmul
            # wastes the MXU).
            for j in range(3):
                h = h + (aux[:, 12 + j:13 + j].astype(jnp.float32)
                         * w1_ref[F + j:F + j + 1, :].astype(jnp.float32))
            h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
            out = jnp.dot(h.astype(dt), w2_ref[:],
                          preferred_element_type=jnp.float32)
            return out + b2_ref[:].astype(jnp.float32)         # (BM, O) f32

        fs = fuse(vs, aux_s)
        fc = fuse(vc, aux_c)

        i = pl.program_id(0)
        is_v0 = ((i * block_m) // rp) % 2 == 0
        a = jnp.where(is_v0, fs, fc).astype(dt)
        b = jnp.where(is_v0, fc, fs).astype(dt)

        jl = (jnp.dot(a, lv_ref[:O, :], preferred_element_type=jnp.float32)
              + jnp.dot(b, lv_ref[O:, :],
                        preferred_element_type=jnp.float32)
              + lvb_ref[:].astype(jnp.float32))
        kh = (jnp.dot(a, km_ref[:O, :], preferred_element_type=jnp.float32)
              + jnp.dot(b, km_ref[O:, :],
                        preferred_element_type=jnp.float32)
              + kmb_ref[:].astype(jnp.float32))
        kh = jnp.maximum(kh, 0.0).astype(dt)
        kv = (jnp.dot(kh, k2_ref[:], preferred_element_type=jnp.float32)
              + k2b_ref[:].astype(jnp.float32))
        jl_ref[:] = jl.astype(dt)
        kv_ref[:] = kv.astype(dt)

    return kernel


def _pallas_forward(vals_both, aux_self, aux_cross, params, rp,
                    interpret=False):
    (w1, b1, w2, b2, lv, lv_bias, km, km_bias, k2, k2_bias) = params
    channels = tuple(v.shape[-1] // 4 for v in vals_both)
    M = vals_both[0].shape[0] // 2
    dt = _compute_dtype(vals_both, aux_self)
    F = sum(channels)
    H_ = w1.shape[1]
    O = w2.shape[1]
    K = k2.shape[1]
    bm = BLOCK_M
    grid = (M // bm,)
    n_blocks = M // bm

    def row_spec(width, off=0):
        # off shifts the block index — the same (2M, ·) stacked-take buffer
        # serves the self stream (rows [0, M)) and the cross stream (rows
        # [M, 2M)) without ever being split (a split costs a 4 GB copy).
        return pl.BlockSpec((bm, width), lambda i, off=off: (i + off, 0),
                            memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    w_args = [w1.astype(dt), b1.reshape(1, H_).astype(jnp.float32),
              w2.astype(dt), b2.reshape(1, O).astype(jnp.float32),
              lv.astype(dt), lv_bias.reshape(1, O).astype(jnp.float32),
              km.astype(dt), km_bias.reshape(1, K).astype(jnp.float32),
              k2.astype(dt), k2_bias.reshape(1, K).astype(jnp.float32)]

    in_specs = ([row_spec(4 * c) for c in channels]
                + [row_spec(4 * c, n_blocks) for c in channels]
                + [row_spec(16), row_spec(16)]
                + [whole(a) for a in w_args])

    jl, kv = pl.pallas_call(
        _make_kernel(channels, rp, bm),
        grid=grid,
        in_specs=in_specs,
        out_specs=(row_spec(O), row_spec(K)),
        out_shape=(jax.ShapeDtypeStruct((M, O), dt),
                   jax.ShapeDtypeStruct((M, K), dt)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ('arbitrary',)
                if os.environ.get('CAR_EPILOGUE_ARB') else ('parallel',)),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*vals_both, *vals_both, aux_self, aux_cross, *w_args)
    return jl, kv


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _forward(vals_both, aux_self, aux_cross, params, rp):
    M = vals_both[0].shape[0] // 2
    ok = (_on_tpu() and M % BLOCK_M == 0 and rp % BLOCK_M == 0)
    if not ok:
        return _reference(vals_both, aux_self, aux_cross, params, rp)
    return _pallas_forward(vals_both, aux_self, aux_cross, params, rp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_exchange_epilogue(vals_both, aux_self, aux_cross, params,
                            rp: int):
    """(joint_latent (M, ld), key_val (M, hidden)) from raw take rows.

    Args:
      vals_both: per-level packed-cell take outputs, each (2M, 4*C_l) in
        model dtype — the SELF stream's M rows stacked over the CROSS
        stream's M rows (one take per level keeps the packed table a
        single-use gather operand, which XLA's memory-space assignment
        will VMEM-prefetch even inside a while loop; the kernel reads the
        two halves via block-index offsets so the stack is never split).
        M flattens (B, V, R, P).
      aux_self / aux_cross: (M, 16), any float dtype (the combine casts to
        the vals dtype; tanh rows accumulate in f32) — 12 slot weights
        (4 per level, level-major) then tanh(pt/5) (3) then pad. Gradient
        stops on the self points are the CALLER's job (apply before tanh).
      params: (w1 (F+3, H1), b1, w2 (H1, ld), b2, lv (2ld, ld), lv_bias,
        km (2ld, hid), km_bias, k2 (hid, hid), k2_bias) — the SplitDense
        kernels of query_encode_latent{,_2}, latent_value, key_map{,_2}.
      rp: R * P (static) — the per-(batch, view) sample count, for the
        in-kernel view-id computation.
    """
    return _forward(vals_both, aux_self, aux_cross, params, rp)


def _fwd(vals_both, aux_self, aux_cross, params, rp):
    out = _forward(vals_both, aux_self, aux_cross, params, rp)
    return out, (vals_both, aux_self, aux_cross, params)


def _bwd(rp, res, g):
    vals_both, aux_self, aux_cross, params = res
    _, vjp = jax.vjp(
        lambda vb, as_, ac, p: _reference(vb, as_, ac, p, rp),
        vals_both, aux_self, aux_cross, params)
    return vjp(g)


fused_exchange_epilogue.defvjp(_fwd, _bwd)
