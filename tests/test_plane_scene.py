"""Geometric consistency of the synthetic plane world: the same 3D point
must have the same color in every view (multi-view consistency is what makes
the capability-training run meaningful)."""

import numpy as np
import jax.numpy as jnp

from cross_attention_renderer_tpu.data.synthetic import (
    _plane_color, _render_plane, make_plane_scene)
from cross_attention_renderer_tpu import geometry as G


def test_views_consistent_via_reprojection():
    scene = make_plane_scene(3, n_view=2, H=64, W=64)
    ctx = scene['context']
    c2w = np.asarray(ctx['cam2world'][0])
    K = np.asarray(ctx['intrinsics'][0, 0])
    img0 = np.asarray(ctx['rgb'][0, 0])

    # unproject view-0 pixels to the z=0 plane, check the texture directly
    H = W = 64
    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing='xy')
    x = (i - K[0, 2]) / K[0, 0]
    y = (j - K[1, 2]) / K[1, 1]
    dirs = np.stack([x, y, np.ones_like(x)], -1) @ c2w[0, :3, :3].T
    o = c2w[0, :3, 3]
    t = -o[2] / dirs[..., 2]
    pts = o + t[..., None] * dirs
    want = _plane_color(pts[..., 0], pts[..., 1])
    hit = t > 0
    np.testing.assert_allclose(img0[hit], want[hit], atol=1e-5)

    # project those plane points into view 1; sampled colors must agree
    w2c1 = np.linalg.inv(c2w[1])
    cam1 = pts @ w2c1[:3, :3].T + w2c1[:3, 3]
    u1 = K[0, 0] * cam1[..., 0] / cam1[..., 2] + K[0, 2]
    v1 = K[1, 1] * cam1[..., 1] / cam1[..., 2] + K[1, 2]
    inb = (hit & (cam1[..., 2] > 0) & (u1 >= 0) & (u1 <= W - 1)
           & (v1 >= 0) & (v1 <= H - 1))
    img1 = np.asarray(ctx['rgb'][0, 1])
    ui = np.clip(np.round(u1).astype(int), 0, W - 1)
    vi = np.clip(np.round(v1).astype(int), 0, H - 1)
    sampled = img1[vi, ui]
    # nearest-pixel sampling of a smooth texture: loose tolerance
    err = np.abs(sampled[inb] - want[inb])
    assert np.median(err) < 0.08, np.median(err)


def test_scene_dict_layout():
    scene = make_plane_scene(0, n_view=2, H=64, W=64, n_rays=128)
    assert scene['query']['uv'].shape == (1, 1, 128, 2)
    assert scene['context']['rgb'].shape == (1, 2, 64, 64, 3)
    assert bool(jnp.isfinite(scene['query']['rgb']).all())
