"""Classical weights-free matching frontend (pose/classical.py).

End goal it is tested against: the unposed demo pipeline
(render_unposed_traj.py role) must recover a REAL relative camera pose
from two rendered views of a known non-planar world using no learned
weights at all — detection, NCC matching, RANSAC, trajectory assembly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cross_attention_renderer_tpu.pose.classical as cl
import cross_attention_renderer_tpu.pose.unposed as up
from cross_attention_renderer_tpu.data.synthetic import look_at_cam2world


def _value_noise(u, v, tex, cells_per_unit):
    n = tex.shape[0]
    fu = (u * cells_per_unit) % n
    fv = (v * cells_per_unit) % n
    i0 = np.floor(fu).astype(int) % n
    j0 = np.floor(fv).astype(int) % n
    i1, j1 = (i0 + 1) % n, (j0 + 1) % n
    a, b = fu - np.floor(fu), fv - np.floor(fv)
    return (tex[j0, i0] * (1 - a) * (1 - b) + tex[j0, i1] * a * (1 - b)
            + tex[j1, i0] * (1 - a) * b + tex[j1, i1] * a * b)


def _render_sharp_world(c2w, K, H, W, tex):
    """Grayscale render of a non-planar world (base plane z=0 + floating
    square patches) with two-octave value-noise texture. Non-planarity
    matters: an essential matrix from coplanar points is degenerate."""
    rects = [(0.0, 0.0, 0.9, 0.45), (-0.6, 0.5, 0.6, 0.3),
             (0.55, -0.45, 0.75, 0.35)]
    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing='xy')
    x = (i - K[0, 2]) / K[0, 0]
    y = (j - K[1, 2]) / K[1, 1]
    dirs = np.stack([x, y, np.ones_like(x)], -1) @ c2w[:3, :3].T
    o = c2w[:3, 3]

    def shade(p, shift):
        return (0.6 * _value_noise(p[..., 0] + shift, p[..., 1], tex, 16)
                + 0.4 * _value_noise(p[..., 0] - 3.3 * shift,
                                     p[..., 1] + 9.9 * shift, tex, 64))

    tb = -o[2] / dirs[..., 2]
    g = shade(o[None, None] + tb[..., None] * dirs, 0.0)
    tbest = np.where(tb > 0, tb, np.inf)
    for idx, (cx, cy, zr, s) in enumerate(rects):
        tr = (zr - o[2]) / dirs[..., 2]
        p = o[None, None] + tr[..., None] * dirs
        hit = ((tr > 0) & (np.abs(p[..., 0] - cx) < s)
               & (np.abs(p[..., 1] - cy) < s) & (tr < tbest))
        g = np.where(hit, shade(p, 7.3 * (idx + 1)), g)
        tbest = np.where(hit, tr, tbest)
    return g.astype(np.float32)


def _sharp_pair():
    H = W = 256
    # the unposed demo assumes DEMO_INTRINSICS (load_video_superglue.py:465)
    # so render the pair with exactly those — the pose solve is biased
    # whenever the assumed K differs from the true one
    K = up.DEMO_INTRINSICS[:3, :3]
    c2w0 = look_at_cam2world(np.array([0.1, -0.1, 2.0]), np.zeros(3))
    c2w1 = look_at_cam2world(np.array([0.45, 0.05, 1.9]), np.zeros(3))
    tex = np.random.default_rng(3).uniform(0, 1, (512, 512))
    g0 = _render_sharp_world(c2w0, K, H, W, tex)
    g1 = _render_sharp_world(c2w1, K, H, W, tex)
    return g0, g1, c2w0, c2w1, K


def test_detect_finds_blob_corners_subpixel():
    """Isolated Gaussian blobs: every blob center must be detected within
    1 px (subpixel refinement on the response parabola)."""
    H = W = 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    centers = [(32.0, 40.0), (90.4, 26.7), (64.0, 96.5)]
    g = np.zeros((H, W))
    for cy, cx in centers:
        g += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 6.0)
    kpts, scores, valid = cl.detect(jnp.asarray(g, jnp.float32),
                                    max_keypoints=16)
    k = np.asarray(kpts)[np.asarray(valid)]
    for cy, cx in centers:
        d = np.linalg.norm(k - np.array([cx, cy]), axis=-1).min()
        assert d < 1.0, (cx, cy, d)


def test_match_recovers_integer_shift():
    """A translated crop must match with the exact shift everywhere."""
    rng = np.random.default_rng(0)
    big = rng.uniform(0, 1, (160, 160)).astype(np.float32)
    # mild blur so corners have parabolic peaks, not single-pixel noise
    k = np.array([0.25, 0.5, 0.25])
    big = np.apply_along_axis(lambda r: np.convolve(r, k, 'same'), 1, big)
    big = np.apply_along_axis(lambda c: np.convolve(c, k, 'same'), 0, big)
    dy, dx = 4, 9
    g0 = big[10:138, 10:138]
    g1 = big[10 + dy:138 + dy, 10 + dx:138 + dx]
    m = cl.match_pair_classical(g0, g1, max_keypoints=256)
    assert len(m['mkpts0']) > 50
    deltas = m['mkpts1'] - m['mkpts0']
    med = np.median(deltas, axis=0)
    np.testing.assert_allclose(med, [-dx, -dy], atol=0.3)
    # the overwhelming majority agree with the shift
    ok = (np.abs(deltas - np.array([-dx, -dy])) < 1.0).all(-1)
    assert ok.mean() > 0.8


def test_classical_pose_recovery_on_nonplanar_world():
    """Full frontend -> RANSAC: recovered relative pose within 2 deg of
    rotation and 10 deg of translation direction on a known world."""
    pytest.importorskip('cv2')
    g0, g1, c2w0, c2w1, K = _sharp_pair()
    m = cl.match_pair_classical(g0, g1)
    assert len(m['mkpts0']) > 60
    ret = up.estimate_pose(m['mkpts0'].astype(np.float64),
                           m['mkpts1'].astype(np.float64),
                           K[:3, :3], K[:3, :3])
    assert ret is not None
    R, t, inliers = ret
    rel = np.linalg.inv(c2w1) @ c2w0          # x_cam1 = rel @ x_cam0
    R_gt, t_gt = rel[:3, :3], rel[:3, 3]
    ang = np.degrees(np.arccos(
        np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang
    tdir = float((t / np.linalg.norm(t)) @ (t_gt / np.linalg.norm(t_gt)))
    assert tdir > 0.98, tdir
    assert inliers.sum() > 50


def test_unposed_scene_classical_frontend():
    """unposed_scene with sp_params=sg_params=None builds the full demo
    scene (context poses + 76-pose trajectory) from images alone."""
    pytest.importorskip('cv2')
    g0, g1, c2w0, c2w1, _K = _sharp_pair()
    im0 = np.repeat(g0[..., None], 3, -1)
    im1 = np.repeat(g1[..., None], 3, -1)
    scene = up.unposed_scene(None, None, im0, im1)
    assert scene['query']['cam2world'].shape == (1, 76, 4, 4)
    c2w = scene['context']['cam2world'][0]
    np.testing.assert_array_equal(c2w[0], np.eye(4))
    # recovered relative rotation ~ GT (translation scale is fixed by sf)
    rel_gt = np.linalg.inv(c2w0) @ c2w1
    R_rec = c2w[1, :3, :3]
    ang = np.degrees(np.arccos(
        np.clip((np.trace(R_rec.T @ rel_gt[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 3.0, ang
