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


# ---------------------------------------------------------------------------
# Multi-stream variant (V >= 3): fixed [self, cross_0, cross_1, ...] channel
# order per view — no per-view swap. The V=3 operating point (npoints 48,
# reference models.py:47-54; 3-view exchange models.py:345-475) previously
# ran the unfused jnp path only (49.3k rays/s, BENCH_NOTES round 4).
# ---------------------------------------------------------------------------

def _reference_multi(vals_stacked, aux_list, params):
    """jnp reference for the S-stream epilogue.

    vals_stacked: per-level (S*M, 4C) — stream-major stacking
    [self | cross_0 | cross_1 | ...]. aux_list: S arrays (M, 16).
    Channel assembly is the fixed ascending order (the renderer builds
    cross stream j as each view's j-th other view in ascending frame
    index, so [self, cross_0, ...] == the reference's
    [self] + ascending-k cross parts, models.py:446,459,473)."""
    (w1, b1, w2, b2, lv, lv_bias, km, km_bias, k2, k2_bias) = params
    S = len(aux_list)
    dt = _compute_dtype(vals_stacked, aux_list[0])
    M = vals_stacked[0].shape[0] // S
    O = w2.shape[1]

    def fuse(vals, aux):
        feat = _combine(vals, aux)
        x = jnp.concatenate([feat, aux[:, 12:15].astype(dt)], axis=-1)
        h = jax.nn.relu(x @ w1.astype(dt) + b1.astype(dt))
        return h @ w2.astype(dt) + b2.astype(dt)

    jl = lv_bias.astype(dt)
    kh = km_bias.astype(dt)
    for s in range(S):
        vals_s = [jax.lax.slice_in_dim(v, s * M, (s + 1) * M, axis=0)
                  for v in vals_stacked]
        f = fuse(vals_s, aux_list[s])
        jl = jl + f @ lv[s * O:(s + 1) * O].astype(dt)
        kh = kh + f @ km[s * O:(s + 1) * O].astype(dt)
    kv = jax.nn.relu(kh) @ k2.astype(dt) + k2_bias.astype(dt)
    return jl, kv


def _make_kernel_multi(channels: tuple[int, ...], n_streams: int):
    n_lvl = len(channels)
    offs = [sum(channels[:i]) for i in range(n_lvl + 1)]
    F = offs[-1]
    S = n_streams

    def kernel(*refs):
        v_by_stream = [refs[s * n_lvl:(s + 1) * n_lvl] for s in range(S)]
        rest = refs[S * n_lvl:]
        aux_refs = rest[:S]
        (w1_ref, b1_ref, w2_ref, b2_ref, lv_ref, lvb_ref,
         km_ref, kmb_ref, k2_ref, k2b_ref, jl_ref, kv_ref) = rest[S:]
        dt = v_by_stream[0][0].dtype
        if not jnp.issubdtype(dt, jnp.floating):
            dt = w2_ref.dtype
        O = w2_ref.shape[1]

        def fuse(v_refs, aux_ref):
            h = None
            aux = aux_ref[:]
            for l in range(n_lvl):
                v = v_refs[l][:]
                if v.dtype != dt:
                    v = v.astype(dt)
                C = channels[l]
                comb = None
                for k in range(4):
                    w = aux[:, l * 4 + k:l * 4 + k + 1].astype(dt)
                    t = v[:, k * C:(k + 1) * C] * w
                    comb = t if comb is None else comb + t
                t = jnp.dot(comb, w1_ref[offs[l]:offs[l + 1], :],
                            preferred_element_type=jnp.float32)
                h = t if h is None else h + t
            for j in range(3):
                h = h + (aux[:, 12 + j:13 + j].astype(jnp.float32)
                         * w1_ref[F + j:F + j + 1, :].astype(jnp.float32))
            h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
            out = jnp.dot(h.astype(dt), w2_ref[:],
                          preferred_element_type=jnp.float32)
            return out + b2_ref[:].astype(jnp.float32)

        jl = lvb_ref[:].astype(jnp.float32)
        kh = kmb_ref[:].astype(jnp.float32)
        for s in range(S):
            f = fuse(v_by_stream[s], aux_refs[s]).astype(dt)
            jl = jl + jnp.dot(f, lv_ref[s * O:(s + 1) * O, :],
                              preferred_element_type=jnp.float32)
            kh = kh + jnp.dot(f, km_ref[s * O:(s + 1) * O, :],
                              preferred_element_type=jnp.float32)
        kh = jnp.maximum(kh, 0.0).astype(dt)
        kv = (jnp.dot(kh, k2_ref[:], preferred_element_type=jnp.float32)
              + k2b_ref[:].astype(jnp.float32))
        jl_ref[:] = jl.astype(dt)
        kv_ref[:] = kv.astype(dt)

    return kernel


def _pallas_forward_multi(vals_stacked, aux_list, params, interpret=False):
    (w1, b1, w2, b2, lv, lv_bias, km, km_bias, k2, k2_bias) = params
    S = len(aux_list)
    channels = tuple(v.shape[-1] // 4 for v in vals_stacked)
    M = vals_stacked[0].shape[0] // S
    dt = _compute_dtype(vals_stacked, aux_list[0])
    H_ = w1.shape[1]
    O = w2.shape[1]
    K = k2.shape[1]
    bm = BLOCK_M
    grid = (M // bm,)
    n_blocks = M // bm

    def row_spec(width, off=0):
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

    in_specs = ([row_spec(4 * c, s * n_blocks)
                 for s in range(S) for c in channels]
                + [row_spec(16)] * S
                + [whole(a) for a in w_args])

    jl, kv = pl.pallas_call(
        _make_kernel_multi(channels, S),
        grid=grid,
        in_specs=in_specs,
        out_specs=(row_spec(O), row_spec(K)),
        out_shape=(jax.ShapeDtypeStruct((M, O), dt),
                   jax.ShapeDtypeStruct((M, K), dt)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*(list(vals_stacked) * S), *aux_list, *w_args)
    return jl, kv


def _forward_multi(vals_stacked, aux_list, params):
    M = vals_stacked[0].shape[0] // len(aux_list)
    if not (_on_tpu() and M % BLOCK_M == 0):
        return _reference_multi(vals_stacked, aux_list, params)
    return _pallas_forward_multi(vals_stacked, aux_list, params)


@jax.custom_vjp
def fused_exchange_epilogue_multi(vals_stacked, aux_list, params):
    """S-stream exchange epilogue: (joint_latent (M, ld), key_val (M, hid)).

    Args:
      vals_stacked: per-level packed-cell take outputs, each (S*M, 4*C_l) —
        the S streams' rows stacked stream-major ([self | cross_0 | ...]);
        one take per level keeps each packed table a single-use gather
        operand (VMEM-prefetch, see fused_exchange_epilogue).
      aux_list: tuple of S (M, 16) float arrays — 12 slot weights then
        tanh(pt/5) (3) then pad, per stream. Gradient stops on points are
        the caller's job (V>=3 detaches the CROSS points,
        reference models.py:431-433).
      params: same tuple as fused_exchange_epilogue with
        lv (S*ld, ld), km (S*ld, hid).
    """
    return _forward_multi(vals_stacked, aux_list, params)


def _fwd_multi(vals_stacked, aux_list, params):
    out = _forward_multi(vals_stacked, aux_list, params)
    return out, (vals_stacked, aux_list, params)


def _bwd_multi(res, g):
    vals_stacked, aux_list, params = res
    _, vjp = jax.vjp(_reference_multi, vals_stacked, aux_list, params)
    return vjp(g)


fused_exchange_epilogue_multi.defvjp(_fwd_multi, _bwd_multi)
