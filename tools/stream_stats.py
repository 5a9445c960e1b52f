"""Window-coverage stats for the renderer's REAL epipolar streams (CPU).

Replicates the coordinate math of CrossAttentionRenderer.__call__ +
_sorted_exchange_v2 on a make_scene fixture and reports, per pyramid level
and (sample_block, window) combo, the fraction of bilinear corners falling
outside their block's window — for BOTH the self stream (sorted by its own
rows) and the cross stream (riding the self stream's order).
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', 'cpu')

from cross_attention_renderer_tpu import geometry as G
from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.ops.sorted_gather import (
    _corners_flat, sort_stream)

H = W = 256
R = 8192
P = 64
B, V = 1, 2


def outside_frac(idx, S, Wn):
    M = idx.shape[0]
    pad = (-M) % S
    idxp = np.pad(idx, ((0, pad), (0, 0)), mode='edge')
    blk = idxp.reshape(-1, S * 4)
    lo = (blk.min(1) // 256) * 256
    out = (idxp < lo.repeat(S)[:, None]) | (
        idxp >= (lo + Wn).repeat(S)[:, None])
    return out[:M].mean(), np.percentile(
        blk.max(1) - blk.min(1), [50, 90, 99])


def main():
    scene = make_scene(0, batch=B, n_view=V, H=H, W=W, n_rays=R,
                       full_image=True)
    scene = jax.tree.map(jnp.asarray, scene)
    scene['query']['uv'] = scene['query']['uv'][:, :, :R]  # first bench block
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
    pt_cross = jnp.stack([pt_in[:, 1 - v, v] for v in range(V)], axis=1)
    intr_sw = ctx['intrinsics'][:, ::-1]
    proj = G.project_pinhole(pt_cross.reshape(B, V, R * P, 3), intr_sw)
    pix = G.pixel_to_ndc(proj[..., :2], H, W)

    stream = sort_stream(pixel_val.reshape(B * V, R * P, 2), (H, W))
    M = B * V * R * P
    pix_s = jnp.take(pix.reshape(M, 2), stream.perm, axis=0)
    cross_id = stream.image_id ^ 1

    for (h, w_) in ((64, 64), (128, 128), (256, 256)):
        for name, coords, ids in (
                ('self ', stream.coords, stream.image_id),
                ('cross', pix_s, cross_id)):
            idx, _ = _corners_flat(h, w_, jnp.float32, coords, ids,
                                   'border')
            idx_np = np.asarray(idx)
            for S, Wn in ((2048, 512), (2048, 1024), (1024, 1024)):
                frac, spans = outside_frac(idx_np, S, Wn)
                print(f'{h}x{w_} {name} S={S:5d} W={Wn:5d} '
                      f'out={frac:.5f} span p50/90/99='
                      f'{spans[0]:.0f}/{spans[1]:.0f}/{spans[2]:.0f}')


if __name__ == '__main__':
    main()
