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


def test_boxes_world_has_occlusion_and_is_consistent():
    from cross_attention_renderer_tpu.data.synthetic import (
        _render_boxes, _render_plane, _world_rects, make_boxes_scene,
        make_intrinsics)

    H = W = 64
    K = make_intrinsics(H, W)
    scene = make_boxes_scene(5, n_view=2, H=H, W=W)
    c2w = np.asarray(scene['context']['cam2world'][0])
    rects = _world_rects(5, 4)

    # determinism + multi-view consistency: regenerating a view from the
    # world definition reproduces the scene's image exactly
    img0 = _render_boxes(c2w[0], K, H, W, rects)
    # atol: the scene generator and this re-render may run on hosts whose
    # libm/f32 contraction differ by an ulp or two in the texture trig
    # (a fresh runner measured 1.1e-6 on 1 of 12,288 elements) — this is a
    # determinism check, not a numerics bound, so give it headroom.
    np.testing.assert_allclose(np.asarray(scene['context']['rgb'][0, 0]),
                               img0, atol=1e-5)

    # the occluders actually occlude: the boxes render must differ from
    # the plane-only render on a nontrivial pixel fraction
    base = _render_plane(c2w[0], K, H, W)
    frac = np.mean(np.any(np.abs(img0 - base) > 1e-3, axis=-1))
    assert 0.02 < frac < 0.98, frac

    # same world from the second view: project a point on a rect into
    # both views and require the same color (pick rect centers facing
    # both cameras)
    z, x0, x1, y0, y1, shift = rects[0]
    center = np.array([(x0 + x1) / 2, (y0 + y1) / 2, z])
    cols = []
    for v in range(2):
        w2c = np.linalg.inv(c2w[v])
        cam = center @ w2c[:3, :3].T + w2c[:3, 3]
        u = K[0, 0] * cam[0] / cam[2] + K[0, 2]
        vv = K[1, 1] * cam[1] / cam[2] + K[1, 2]
        if 0 <= u <= W - 1 and 0 <= vv <= H - 1:
            img = np.asarray(scene['context']['rgb'][0, v])
            cols.append(img[int(round(vv)), int(round(u))])
    if len(cols) == 2:
        # nearest-pixel sampling of a smooth texture: loose tolerance
        assert np.abs(cols[0] - cols[1]).max() < 0.25, cols
