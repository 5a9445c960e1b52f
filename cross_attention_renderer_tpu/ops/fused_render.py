"""Fully-fused V=2 render core (Pallas TPU) — takes to attention output.

One ray-blocked kernel runs EVERYTHING between the epipolar row-takes and
the light-field decode of the flagship V=2 renderer:

    bilinear combine (3 pyramid levels x 4 slots)            [VPU]
    fuse MLP x2 streams  (579 -> 576 -> 288)                 [MXU]
    per-view channel order + latent_value / key_map{,_2}     [MXU]
    query embed MLP (16 -> 128 -> 128)                       [MXU]
    round-1 joint (view, sample) softmax attention (f32)     [VPU]
    encode_latent + repeat-query MLP + round-2 attention     [MXU/VPU]

Compared to the round-3 exchange epilogue (ops/gather_epilogue.py) + XLA
attention, every (M, 288)/(M, 128) intermediate — joint latent, key
values, query embeds, round-2 embeds — lives only in VMEM: the kernel
reads the raw stacked take rows once (~9.4 GB per 1M-sample block, the
algorithmic floor) and writes just the per-ray attention output (R, 288)
and the round-1 weights (R, V*P). Replaces reference models.py:278-565.

Layout contract: take rows flatten (B, V, R, P) self-stream first, then
cross (the stacked single-take layout of renderer._fused_exchange_v2).
A grid step covers ``RAY_BLOCK`` rays of ONE batch row with BOTH views:
each operand is passed four times (self/cross x view0/view1) with
block-index offsets, so nothing is ever split or re-materialized in HBM.

Forward-only on TPU; gradients fall back to the jnp mirror via custom
VJP (identical math — f32 logits/softmax per the round-3 bf16 policy).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

RAY_BLOCK = int(os.environ.get('CAR_FUSED_RENDER_RAYS', '8'))
ATTN_SCALE = 1.0 / 16.0


def _on_tpu() -> bool:
    return jax.default_backend() in ('tpu', 'axon')


# ---------------------------------------------------------------------------
# jnp mirror (CPU path, gradients, tests)
# ---------------------------------------------------------------------------

def _combine(v, aux, lo, C):
    # int8 tables (quantized fast-eval mode) combine in the aux dtype;
    # float tables keep their own dtype (round-3 measured behavior).
    cdt = (v.dtype if jnp.issubdtype(v.dtype, jnp.floating) else aux.dtype)
    acc = None
    for k in range(4):
        t = (jax.lax.slice_in_dim(v, k * C, (k + 1) * C, axis=-1).astype(cdt)
             * aux[..., lo + k:lo + k + 1].astype(cdt))
        acc = t if acc is None else acc + t
    return acc


def _float_dtype(vals0, aux):
    dt = vals0.dtype
    if not jnp.issubdtype(dt, jnp.floating):
        dt = aux.dtype                         # int8 tables: model dtype
    return dt


def _fuse_stream(vals, aux, w1, b1, w2, b2, channels):
    dt = _float_dtype(vals[0], aux)
    offs = [sum(channels[:i]) for i in range(len(channels) + 1)]
    F = offs[-1]
    h = None
    for l, v in enumerate(vals):
        comb = _combine(v, aux, 4 * l, channels[l])
        t = jnp.dot(comb, w1[offs[l]:offs[l + 1]].astype(dt),
                    preferred_element_type=jnp.float32)
        h = t if h is None else h + t
    for j in range(3):
        h = h + (aux[..., 12 + j:13 + j].astype(jnp.float32)
                 * w1[F + j:F + j + 1].astype(jnp.float32))
    h = jnp.maximum(h + b1.astype(jnp.float32), 0.0)
    out = jnp.dot(h.astype(dt), w2.astype(dt),
                  preferred_element_type=jnp.float32)
    return out + b2.astype(jnp.float32)      # f32


def _reference(vals_both, aux_self, aux_cross, local_coords, params,
               channels, B, R, P, repeat):
    """jnp mirror. vals_both: per-level (2M, 4C); aux/local: (M, 16)."""
    (w1, b1, w2, b2, lv, lvb, km, kmb, k2, k2b,
     qe1, qe1b, qe2, qe2b, el, elb, qr1, qr1b, qr2, qr2b) = params
    dt = _float_dtype(vals_both[0], aux_self)
    M = B * 2 * R * P
    O = w2.shape[1]

    def part(a, sc):        # (M or 2M rows) -> (B, 2, R*P, ch)
        a = jax.lax.slice_in_dim(a, sc * M, (sc + 1) * M, axis=0) \
            if a.shape[0] == 2 * M else a
        return a.reshape(B, 2, R * P, a.shape[-1])

    fs = _fuse_stream([part(v, 0) for v in vals_both], part(aux_self, 0),
                      w1, b1, w2, b2, channels)       # (B,2,RP,O) f32
    fc = _fuse_stream([part(v, 1) for v in vals_both], part(aux_cross, 0),
                      w1, b1, w2, b2, channels)

    a0 = jnp.stack([fs[:, 0], fc[:, 1]], 1).astype(dt)   # own-view stream
    b0 = jnp.stack([fc[:, 0], fs[:, 1]], 1).astype(dt)   # other-view stream
    jl = (jnp.dot(a0, lv[:O].astype(dt))
          + jnp.dot(b0, lv[O:].astype(dt)) + lvb.astype(dt))
    kh = jnp.maximum(jnp.dot(a0, km[:O].astype(dt))
                     + jnp.dot(b0, km[O:].astype(dt)) + kmb.astype(dt), 0)
    kv = jnp.dot(kh, k2.astype(dt)) + k2b.astype(dt)     # (B,2,RP,128)

    lc = part(local_coords, 0).astype(dt)
    ce = jnp.maximum(jnp.dot(lc, qe1.astype(dt)) + qe1b.astype(dt), 0)
    ce = jnp.dot(ce, qe2.astype(dt)) + qe2b.astype(dt)   # (B,2,RP,128)

    def attend(q, k, v):
        dots = jnp.einsum('bvsd,bvsd->bvs', q.astype(jnp.float32),
                          k.astype(jnp.float32)) * ATTN_SCALE
        dots = dots.reshape(B, 2, R, P)
        m = jnp.max(dots, axis=(1, 3), keepdims=True)
        e = jnp.exp(dots - m)
        den = jnp.sum(e, axis=(1, 3), keepdims=True)
        wt = (e / den)
        z = jnp.einsum('bvrp,bvrpc->brc', wt.astype(v.dtype),
                       v.reshape(B, 2, R, P, -1))
        return z, wt

    z1, at_wt = attend(ce, kv, jl)                       # (B,R,O)
    if not repeat:
        return z1, at_wt
    ze = jnp.dot(z1.astype(dt), el.astype(dt)) + elb.astype(dt)
    ze = jnp.broadcast_to(ze[:, None, :, None, :],
                          (B, 2, R, P, ze.shape[-1]))
    ze = ze.reshape(B, 2, R * P, -1)
    q2 = jnp.maximum(jnp.dot(ze, qr1[:ze.shape[-1]].astype(dt))
                     + jnp.dot(lc, qr1[ze.shape[-1]:].astype(dt))
                     + qr1b.astype(dt), 0)
    q2 = jnp.dot(q2, qr2.astype(dt)) + qr2b.astype(dt)
    z2, _ = attend(q2, ce, jl)
    return z2 + 2.0 * z1, at_wt


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _make_kernel(channels, P, rb, repeat):
    n_lvl = len(channels)
    offs = [sum(channels[:i]) for i in range(n_lvl + 1)]
    F = offs[-1]

    def kernel(*refs):
        i = 0
        def take(n):
            nonlocal i
            out = refs[i:i + n]
            i += n
            return out
        vs = [take(n_lvl) for _ in range(2)]     # self: v0, v1 (per level)
        vc = [take(n_lvl) for _ in range(2)]     # cross: v0, v1
        aux_s = take(2)
        aux_c = take(2)
        lc_r = take(2)
        (w1_r, b1_r, w2_r, b2_r, lv_r, lvb_r, km_r, kmb_r, k2_r, k2b_r,
         qe1_r, qe1b_r, qe2_r, qe2b_r, el_r, elb_r, qr1_r, qr1b_r,
         qr2_r, qr2b_r) = take(20)
        z_out, wt_out = take(2)
        dt = vs[0][0].dtype
        if not jnp.issubdtype(dt, jnp.floating):
            dt = w2_r.dtype                    # int8 tables: weights dtype
        O = w2_r.shape[1]
        S = rb * P

        def fuse(v_refs, aux_ref):
            aux = aux_ref[:]
            h = None
            for l in range(n_lvl):
                v = v_refs[l][:]
                if v.dtype != dt:
                    v = v.astype(dt)           # int8 tables
                C = channels[l]
                comb = None
                for k in range(4):
                    w = aux[:, 4 * l + k:4 * l + k + 1].astype(dt)
                    t = v[:, k * C:(k + 1) * C] * w
                    comb = t if comb is None else comb + t
                t = jnp.dot(comb, w1_r[offs[l]:offs[l + 1], :],
                            preferred_element_type=jnp.float32)
                h = t if h is None else h + t
            for j in range(3):
                h = h + (aux[:, 12 + j:13 + j].astype(jnp.float32)
                         * w1_r[F + j:F + j + 1, :].astype(jnp.float32))
            h = jnp.maximum(h + b1_r[:].astype(jnp.float32), 0.0)
            out = jnp.dot(h.astype(dt), w2_r[:],
                          preferred_element_type=jnp.float32)
            return out + b2_r[:].astype(jnp.float32)     # (S, O) f32

        jls, kvs, ces = [], [], []
        for v in range(2):
            f_own = fuse(vs[v], aux_s[v])
            f_oth = fuse(vc[v], aux_c[v])
            # reference channel order (models.py:335,342): view 0 takes
            # (self, cross), view 1 takes (cross, self).
            a, b = (f_own.astype(dt), f_oth.astype(dt)) if v == 0 else \
                   (f_oth.astype(dt), f_own.astype(dt))
            jl = (jnp.dot(a, lv_r[:O, :],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(b, lv_r[O:, :],
                            preferred_element_type=jnp.float32)
                  + lvb_r[:].astype(jnp.float32)).astype(dt)
            kh = (jnp.dot(a, km_r[:O, :],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(b, km_r[O:, :],
                            preferred_element_type=jnp.float32)
                  + kmb_r[:].astype(jnp.float32))
            kh = jnp.maximum(kh, 0.0).astype(dt)
            kv = (jnp.dot(kh, k2_r[:],
                          preferred_element_type=jnp.float32)
                  + k2b_r[:].astype(jnp.float32)).astype(dt)
            lc = lc_r[v][:]
            ce = jnp.maximum(
                jnp.dot(lc, qe1_r[:], preferred_element_type=jnp.float32)
                + qe1b_r[:].astype(jnp.float32), 0.0).astype(dt)
            ce = (jnp.dot(ce, qe2_r[:],
                          preferred_element_type=jnp.float32)
                  + qe2b_r[:].astype(jnp.float32)).astype(dt)
            jls.append(jl)
            kvs.append(kv)
            ces.append(ce)

        def attend(qs, ks):
            # per view: (S, 128) q/k -> (rb, P) logits; joint softmax.
            dots = []
            for v in range(2):
                d = jnp.sum((qs[v] * ks[v]).astype(jnp.float32), axis=-1)
                dots.append(d.reshape(rb, P) * ATTN_SCALE)
            m = jnp.maximum(jnp.max(dots[0], 1, keepdims=True),
                            jnp.max(dots[1], 1, keepdims=True))
            e = [jnp.exp(d - m) for d in dots]
            den = (jnp.sum(e[0], 1, keepdims=True)
                   + jnp.sum(e[1], 1, keepdims=True))
            wts = [x / den for x in e]                     # (rb, P) f32
            z = None
            for v in range(2):
                w = wts[v].reshape(S, 1).astype(dt)
                part = (jls[v] * w).reshape(rb, P, O)
                t = jnp.sum(part.astype(jnp.float32), axis=1)
                z = t if z is None else z + t
            return z, wts                                  # z (rb, O) f32

        z1, wts1 = attend(ces, kvs)
        wt_cat = jnp.concatenate(wts1, axis=-1)            # (rb, 2P)
        wt_out[:] = wt_cat.astype(wt_out.dtype)

        if not repeat:
            z_out[:] = z1.astype(z_out.dtype)
            return

        ze_row = (jnp.dot(z1.astype(dt), el_r[:],
                          preferred_element_type=jnp.float32)
                  + elb_r[:].astype(jnp.float32)).astype(dt)  # (rb, 128)
        E = ze_row.shape[-1]
        ze = jnp.broadcast_to(ze_row[:, None, :], (rb, P, E)).reshape(S, E)
        q2s = []
        for v in range(2):
            q2 = jnp.maximum(
                jnp.dot(ze, qr1_r[:E, :],
                        preferred_element_type=jnp.float32)
                + jnp.dot(lc_r[v][:], qr1_r[E:, :],
                          preferred_element_type=jnp.float32)
                + qr1b_r[:].astype(jnp.float32), 0.0).astype(dt)
            q2 = (jnp.dot(q2, qr2_r[:],
                          preferred_element_type=jnp.float32)
                  + qr2b_r[:].astype(jnp.float32)).astype(dt)
            q2s.append(q2)
        z2, _ = attend(q2s, ces)
        z_out[:] = (z2 + 2.0 * z1).astype(z_out.dtype)

    return kernel


def _pallas_forward(vals_both, aux_self, aux_cross, local_coords, params,
                    channels, B, R, P, repeat, interpret=False):
    dt = _float_dtype(vals_both[0], aux_self)
    rb = RAY_BLOCK
    M = B * 2 * R * P
    S = rb * P
    nrb = R // rb                 # ray blocks per (b, v)
    grid = (B * nrb,)

    def region(width, v, cross):
        # block index of (b, v, ray-block r) in the stacked (2M/S) space
        def idx(i, v=v, cross=cross):
            b = i // nrb
            r = i % nrb
            return (cross * (2 * B * nrb) + b * (2 * nrb) + v * nrb + r, 0)
        return pl.BlockSpec((S, width), idx, memory_space=pltpu.VMEM)

    def half(width, v):
        # for (M, width) arrays (aux / local coords)
        def idx(i, v=v):
            b = i // nrb
            r = i % nrb
            return (b * (2 * nrb) + v * nrb + r, 0)
        return pl.BlockSpec((S, width), idx, memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def ray_out(width):
        return pl.BlockSpec((rb, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    (w1, b1, w2, b2, lv, lvb, km, kmb, k2, k2b,
     qe1, qe1b, qe2, qe2b, el, elb, qr1, qr1b, qr2, qr2b) = params
    O = w2.shape[1]

    def row2(a):
        return a.reshape(1, -1).astype(jnp.float32)

    w_args = [w1.astype(dt), row2(b1), w2.astype(dt), row2(b2),
              lv.astype(dt), row2(lvb), km.astype(dt), row2(kmb),
              k2.astype(dt), row2(k2b), qe1.astype(dt), row2(qe1b),
              qe2.astype(dt), row2(qe2b), el.astype(dt), row2(elb),
              qr1.astype(dt), row2(qr1b), qr2.astype(dt), row2(qr2b)]

    in_specs = (
        [region(4 * c, v, 0) for v in (0, 1) for c in channels]
        + [region(4 * c, v, 1) for v in (0, 1) for c in channels]
        + [half(16, 0), half(16, 1)]      # aux_self v0, v1
        + [half(16, 0), half(16, 1)]      # aux_cross v0, v1
        + [half(16, 0), half(16, 1)]      # local_coords v0, v1
        + [whole(a) for a in w_args])
    operands = ([v for _ in (0, 1) for v in vals_both]
                + [v for _ in (0, 1) for v in vals_both]
                + [aux_self, aux_self, aux_cross, aux_cross,
                   local_coords, local_coords]
                + w_args)

    z, wt = pl.pallas_call(
        _make_kernel(tuple(channels), P, rb, repeat),
        grid=grid,
        in_specs=in_specs,
        out_specs=(ray_out(O), ray_out(2 * P)),
        out_shape=(jax.ShapeDtypeStruct((B * R, O), dt),
                   jax.ShapeDtypeStruct((B * R, 2 * P), dt)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    # wt layout (B*R, [v0 P | v1 P]) -> (B, 2, R, P)
    at_wt = wt.reshape(B, R, 2, P).transpose(0, 2, 1, 3)
    return z.reshape(B, R, O), at_wt


def _forward(vals_both, aux_self, aux_cross, local_coords, params,
             channels, B, R, P, repeat):
    ok = (_on_tpu() and R % RAY_BLOCK == 0)
    if not ok:
        z, wt = _reference(vals_both, aux_self, aux_cross, local_coords,
                           params, channels, B, R, P, repeat)
        return z.astype(vals_both[0].dtype), wt.astype(vals_both[0].dtype)
    return _pallas_forward(vals_both, aux_self, aux_cross, local_coords,
                           params, channels, B, R, P, repeat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_render_core(vals_both, aux_self, aux_cross, local_coords,
                      params, channels: tuple, B: int, R: int, P: int,
                      repeat: bool):
    """(z_final (B, R, ld), at_wt (B, V, R, P)) from raw stacked take rows.

    z_final = round2 + V*round1 attention output when ``repeat`` (the
    reference's repeat_attention wiring, models.py:547-565), else the
    round-1 output. See module docstring for the layout contract; params
    is the 20-tuple documented in renderer._fused_render_v2.
    """
    return _forward(vals_both, aux_self, aux_cross, local_coords, params,
                    channels, B, R, P, repeat)


def _fwd(vals_both, aux_self, aux_cross, local_coords, params,
         channels, B, R, P, repeat):
    out = _forward(vals_both, aux_self, aux_cross, local_coords, params,
                   channels, B, R, P, repeat)
    return out, (vals_both, aux_self, aux_cross, local_coords, params)


def _bwd(channels, B, R, P, repeat, res, g):
    vals_both, aux_self, aux_cross, local_coords, params = res
    dt = vals_both[0].dtype

    def f(vb, as_, ac, lc, p):
        z, wt = _reference(vb, as_, ac, lc, p, channels, B, R, P, repeat)
        return z.astype(dt), wt.astype(dt)

    _, vjp = jax.vjp(f, vals_both, aux_self, aux_cross, local_coords,
                     params)
    return vjp(g)


fused_render_core.defvjp(_fwd, _bwd)
