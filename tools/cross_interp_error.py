"""Error analysis: cross-view gather vs 1-D reinterpolation along the
other view's epipolar segment (CPU, real make_scene geometry).

For V=2, element (v, r, p) of the exchange gathers frame k=1-v's pyramid
at the projection of view-v's sample point into frame k. That projection
lies ON frame k's epipolar segment of the same ray r (same 3D line). So
the cross gather can be approximated by sampling frame k's segment densely
(2P-1 uniform points; the P self samples are the even ones) and linearly
interpolating along the segment parameter — IF the projection's parameter
t' is recovered and the segment actually covers it.

Reports, per pyramid level: the fraction of cross points whose t' falls
inside [0, 1], and feature-error quantiles of interp vs exact gather.
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', 'cpu')

from cross_attention_renderer_tpu import geometry as G
from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.ops import grid_sample

H = W = 256
R = 2048
P = 64
B, V = 1, 2


def main():
    scene = make_scene(0, batch=B, n_view=V, H=H, W=W, n_rays=H * W,
                       full_image=True)
    scene = jax.tree.map(jnp.asarray, scene)
    scene['query']['uv'] = scene['query']['uv'][:, :, :R]
    ctx, qry = scene['context'], scene['query']
    ctx_c2w = ctx['cam2world']
    inv_ctx = jnp.linalg.inv(ctx_c2w)
    q_c2w = jnp.einsum('bvij,bqjk->bvik', inv_ctx, qry['cam2world'])
    uv = jnp.broadcast_to(qry['uv'][:, 0][:, None], (B, V, R, 2))
    q_intr = jnp.broadcast_to(qry['intrinsics'], (B, V, 4, 4))
    lf = G.plucker_embedding(q_c2w.reshape(B * V, 4, 4),
                             uv.reshape(B * V, R, 2),
                             q_intr.reshape(B * V, 4, 4))
    ctx_intr = ctx['intrinsics'].reshape(B * V, 4, 4)
    origins = jnp.broadcast_to(
        G.ray_origin(q_c2w).reshape(B * V, 1, 3), (B * V, R, 3))
    intr_norm = ctx_intr.at[:, :2, :].set(ctx_intr[:, :2, :] / H)
    start, end, valid = G.epipolar_segments_ndc(origins, lf[..., :3],
                                                intr_norm)
    interval = jnp.linspace(0.0, 1.0, P, dtype=start.dtype)
    pixel_val = (start[..., None, :]
                 + (end - start)[..., None, :] * interval[:, None])
    eye = jnp.broadcast_to(jnp.eye(4, dtype=lf.dtype), (B * V, 4, 4))
    pt, _, _ = G.epipolar_point_3d(lf, pixel_val, eye, H, W, ctx_intr)
    pt_views = pt.reshape(B, V, R, P, 3)

    inv = jnp.linalg.inv(ctx_c2w)
    rel = jnp.einsum('bkij,bvjl->bkvil', inv, ctx_c2w)
    pt_in = G.transform_points(pt_views[:, None],
                               rel[:, :, :, None, None])
    pt_in = jnp.where(jnp.isfinite(pt_in), pt_in, 0.0)
    # cross coords for (v, r, p): projection into frame k=1-v
    pt_cross = jnp.stack([pt_in[:, 1 - v, v] for v in range(V)], axis=1)
    intr_sw = ctx['intrinsics'][:, ::-1]
    proj = G.project_pinhole(pt_cross.reshape(B, V, R * P, 3), intr_sw)
    pix = G.pixel_to_ndc(proj[..., :2], H, W).reshape(B, V, R, P, 2)

    # segment parameter of the cross point on frame k's segment of ray r:
    # t' = argmin_t |start_k + t (end_k - start_k) - pix|, per coordinate
    st = start.reshape(B, V, R, 2)
    en = end.reshape(B, V, R, 2)
    # frame k's segment, aligned with element (v, ...): k = 1-v
    st_k = st[:, ::-1][..., None, :]                       # (B,V,R,1,2)
    en_k = en[:, ::-1][..., None, :]
    d = en_k - st_k
    tp = (jnp.sum((pix - st_k) * d, -1)
          / jnp.maximum(jnp.sum(d * d, -1), 1e-12))        # (B,V,R,P)
    # perpendicular distance off the line (should be ~0)
    foot = st_k + tp[..., None] * d
    off = jnp.linalg.norm(pix - foot, axis=-1)
    inside = (tp >= 0.0) & (tp <= 1.0)
    vmask = valid.reshape(B, V, R)[:, ::-1][..., None]
    print(f'cross t\' inside [0,1]: {np.asarray(inside.mean()):.4f}  '
          f'(valid-seg only: '
          f'{np.asarray((inside & (vmask > 0)).sum() / (vmask > 0).sum() / P * 1):.4f})')
    print(f'off-line distance (ndc): p50={np.percentile(np.asarray(off), 50):.2e} '
          f'p99={np.percentile(np.asarray(off), 99):.2e}')

    # dense segment sampling of frame k: 2P-1 uniform points
    D = 2 * P - 1
    dense_t = jnp.linspace(0.0, 1.0, D)
    dense_pix = (st[..., None, :] + (en - st)[..., None, :]
                 * dense_t[:, None]).reshape(B * V, R * D, 2)

    rng = np.random.default_rng(0)
    for (h, w_, C) in ((64, 64, 64), (128, 128, 64), (256, 256, 64)):
        fm = jnp.asarray(rng.normal(0, 1, (B * V, h, w_, C))
                         .astype(np.float32))
        # smooth the map a little (conv features are smoother than noise)
        fm = (fm + jnp.roll(fm, 1, 1) + jnp.roll(fm, 1, 2)
              + jnp.roll(fm, -1, 1) + jnp.roll(fm, -1, 2)) / 5.0
        exact = grid_sample(fm, pix.reshape(B * V, R * P, 2), 'zeros')
        dense = grid_sample(fm, dense_pix, 'zeros').reshape(B, V, R, D, C)
        dense_k = dense[:, ::-1]                           # frame k view
        # linear interp at t' on the dense grid
        tq = jnp.clip(tp, 0.0, 1.0) * (D - 1)
        i0 = jnp.clip(jnp.floor(tq), 0, D - 2).astype(jnp.int32)
        frac = (tq - i0)[..., None]
        g0 = jnp.take_along_axis(dense_k, i0[..., None, None]
                                 .repeat(C, -1), axis=3).squeeze(3)
        g1 = jnp.take_along_axis(dense_k, (i0 + 1)[..., None, None]
                                 .repeat(C, -1), axis=3).squeeze(3)
        interp = g0 * (1 - frac) + g1 * frac
        # zero outside segment (exact path gathers off-segment correctly;
        # interp cannot)
        e = np.asarray(exact).reshape(B, V, R, P, C)
        i_ = np.asarray(interp)
        m = np.asarray(inside & (off < 1e-3))[..., None]
        scale = np.abs(e).mean()
        err = np.abs(i_ - e) * m
        print(f'{h}x{w_}: covered={m.mean():.3f} '
              f'err p50={np.percentile(err[m.repeat(C, -1) > 0], 50):.2e} '
              f'p99={np.percentile(err[m.repeat(C, -1) > 0], 99):.2e} '
              f'max={err.max():.2e} (feat scale {scale:.2f})')


if __name__ == '__main__':
    main()
