"""Parity tests: JAX geometry vs golden outputs of the PyTorch reference.

Fixtures are produced by ``tests/make_geometry_fixtures.py`` (float64 oracle)
and committed at ``tests/fixtures/geometry_golden.npz``.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from cross_attention_renderer_tpu import geometry as G

FIX = pathlib.Path(__file__).parent / 'fixtures' / 'geometry_golden.npz'


@pytest.fixture(scope='module')
def gold():
    return dict(np.load(FIX, allow_pickle=False))


def f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def test_plucker_embedding(gold):
    got = G.plucker_embedding(f32(gold['c2w']), f32(gold['uv_pix']),
                              f32(gold['intr']))
    np.testing.assert_allclose(got, gold['plucker'], atol=2e-5, rtol=1e-4)


def test_ray_directions(gold):
    got = G.ray_directions(f32(gold['uv_pix']), f32(gold['c2w']),
                           f32(gold['intr']))
    np.testing.assert_allclose(got, gold['ray_dirs'], atol=2e-5)


def test_ray_directions_cam(gold):
    B, R, P, _ = gold['uv_ndc'].shape
    got = G.ray_directions_cam(f32(gold['uv_ndc'].reshape(B, R * P, 2)),
                               f32(gold['intr']),
                               int(gold['H']), int(gold['W']))
    np.testing.assert_allclose(got, gold['ray_dirs_cam'], atol=2e-5)


def test_project_pinhole(gold):
    got = G.project_pinhole(f32(gold['pts_cam']), f32(gold['intr']))
    np.testing.assert_allclose(got, gold['projected'], atol=1e-2, rtol=1e-5)


def test_lift(gold):
    z = jnp.full(gold['uv_pix'].shape[:-1], 1.5, dtype=jnp.float32)
    got = G.lift(f32(gold['uv_pix'][..., 0]), f32(gold['uv_pix'][..., 1]),
                 z, f32(gold['intr']))
    np.testing.assert_allclose(got, gold['lifted'], atol=1e-5)


def test_plucker_intersection_well_conditioned(gold):
    """f32 formulation matches the f64 oracle where the problem is
    well-conditioned; ill-conditioned points diverge in BOTH formulations and
    are clamped downstream (models.py:514-515,577)."""
    q = jnp.broadcast_to(f32(gold['plucker'])[:, :, None, :],
                         gold['isect_p1'].shape[:-1] + (6,))
    H, W = int(gold['H']), int(gold['W'])
    pix = G.ndc_to_pixel(f32(gold['uv_ndc']), H, W)
    B, R, P, _ = pix.shape
    ctx = G.plucker_embedding(f32(gold['c2w2']), pix.reshape(B, R * P, 2),
                              f32(gold['intr2'])).reshape(B, R, P, 6)
    p1, p2 = G.plucker_intersection(q, ctx)

    # Condition number proxy: |l1 x l2|. Keep points the renderer would keep
    # (|pt| <= 100 after clamping, models.py:577) and that are numerically
    # meaningful in f32.
    n = np.linalg.norm(np.cross(np.asarray(q)[..., :3], np.asarray(ctx)[..., :3]),
                       axis=-1)
    ref1, ref2 = gold['isect_p1'], gold['isect_p2']
    ok = (n > 1e-3) & (np.linalg.norm(ref1, axis=-1) < 100)
    assert ok.mean() > 0.8, 'fixture regime degenerate'
    scale = np.maximum(np.linalg.norm(ref1, axis=-1, keepdims=True), 1.0)
    np.testing.assert_allclose((np.asarray(p1) / scale)[ok],
                               (ref1 / scale)[ok], atol=2e-3)
    scale2 = np.maximum(np.linalg.norm(ref2, axis=-1, keepdims=True), 1.0)
    np.testing.assert_allclose((np.asarray(p2) / scale2)[ok],
                               (ref2 / scale2)[ok], atol=2e-3)


def test_epipolar_point_3d(gold):
    B = gold['c2w'].shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    pt, dist, parallel = G.epipolar_point_3d(
        f32(gold['plucker']), f32(gold['uv_ndc']), eye,
        int(gold['H']), int(gold['W']), f32(gold['intr']))
    ref_pt = gold['epi_pt']
    ok = np.linalg.norm(ref_pt, axis=-1) < 100
    scale = np.maximum(np.linalg.norm(ref_pt, axis=-1, keepdims=True), 1.0)
    np.testing.assert_allclose((np.asarray(pt) / scale)[ok],
                               (ref_pt / scale)[ok], atol=5e-3)
    ref_d = gold['epi_dist'][..., 0]
    okd = ok & (ref_d < 100)
    np.testing.assert_allclose(
        np.asarray(dist[..., 0])[okd] / np.maximum(ref_d[okd], 1.0),
        ref_d[okd] / np.maximum(ref_d[okd], 1.0), atol=5e-3)


def test_project_rays_identity_extrinsics(gold):
    res = G.project_rays(f32(gold['pr_origins']), f32(gold['pr_dirs']),
                         jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                          gold['c2w'].shape),
                         f32(gold['pr_intr_norm']))
    np.testing.assert_array_equal(np.asarray(res.overlaps_image),
                                  gold['pr_overlap'])
    ov = gold['pr_overlap']
    np.testing.assert_allclose(np.asarray(res.xy_min)[ov],
                               gold['pr_xymin'][ov], atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.xy_max)[ov],
                               gold['pr_xymax'][ov], atol=2e-4)


def test_project_rays_general_extrinsics(gold):
    res = G.project_rays(f32(gold['pr_origins']), f32(gold['pr_dirs']),
                         f32(gold['c2w2']), f32(gold['pr_intr_norm']))
    agree = np.asarray(res.overlaps_image) == gold['pr2_overlap']
    # General extrinsics path goes through a matrix inverse in f32; allow a
    # tiny fraction of boundary-case flips.
    assert agree.mean() > 0.99
    ov = gold['pr2_overlap'] & agree
    np.testing.assert_allclose(np.asarray(res.xy_min)[ov],
                               gold['pr2_xymin'][ov], atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.xy_max)[ov],
                               gold['pr2_xymax'][ov], atol=1e-3)


def test_volumetric_epipolar_lines(gold):
    B = gold['c2w'].shape[0]
    R = gold['uv_pix'].shape[1]
    pl4 = f32(gold['plucker']).reshape(B // 2, 2, R, 6)
    c2w4 = f32(gold['c2w']).reshape(B // 2, 2, 4, 4)
    intr4 = f32(gold['intr']).reshape(B // 2, 2, 4, 4)
    start, end, valid, pix = G.volumetric_epipolar_lines(
        pl4, c2w4, intr4, int(gold['H']), int(gold['W']), 12)
    np.testing.assert_allclose(start, gold['vol_start'], atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(end, gold['vol_end'], atol=1e-3, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid).astype(bool),
                                  gold['vol_valid'])
    np.testing.assert_allclose(pix, gold['vol_points'], atol=1e-3, rtol=1e-4)


def test_transform_points_roundtrip(gold):
    pts = f32(gold['pts_cam'])
    c2w = f32(gold['c2w'])
    world = G.transform_points(pts, c2w[:, None, :, :])
    back = G.points_to_cam(world, c2w[:, None, :, :])
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_essential_fundamental_matrices(gold):
    """vs reference oracle recordings (fixtures/ef_golden.npz)."""
    ef = np.load(FIX.parent / 'ef_golden.npz')
    E = G.essential_matrix(f32(gold['c2w']), f32(gold['c2w2']))
    F = G.fundamental_matrix(f32(gold['c2w']), f32(gold['c2w2']),
                             f32(gold['intr']), f32(gold['intr2']))
    np.testing.assert_allclose(np.asarray(E), ef['E'], atol=1e-5)
    np.testing.assert_allclose(np.asarray(F), ef['F'], atol=1e-5)
