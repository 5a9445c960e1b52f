"""Unposed two-image pipeline: SuperPoint+SuperGlue matching (TPU) ->
OpenCV RANSAC essential-matrix pose (host) -> interpolated camera path.

Behavioral reference: ``dataset/load_video_superglue.py:40-138,419-506`` and
``estimate_pose/glue_match.py``. The learned matching runs in JAX; the RANSAC
solve stays host-side on OpenCV exactly like the reference (a 5-point solver
inside RANSAC is host logic, not a TPU workload).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from cross_attention_renderer_tpu.pose import superglue as sg
from cross_attention_renderer_tpu.pose import superpoint as sp

# Hard-coded unposed-demo intrinsics (load_video_superglue.py:465).
DEMO_INTRINSICS = np.array([[225.0, 0, 128.0, 0], [0, 225.0, 128.0, 0],
                            [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)


def match_pair(sp_params: dict, sg_params: dict, image0: np.ndarray,
               image1: np.ndarray, max_keypoints: int = 1024,
               sinkhorn_iterations: int = 20,
               match_threshold: float = 0.2) -> dict:
    """SuperPoint -> SuperGlue on a grayscale pair.

    Ref: ``Matching`` (glue_match.py:49-84) with the unposed-demo config
    (load_video_superglue.py:421-433). images: (H, W) float in [0, 1].
    Returns matched keypoint arrays (host numpy).
    """
    import jax.numpy as jnp
    imgs = jnp.asarray(np.stack([image0, image1])[..., None])
    feats = sp.superpoint(sp_params, imgs, max_keypoints=max_keypoints)
    data = {
        'keypoints0': feats['keypoints'][:1],
        'keypoints1': feats['keypoints'][1:],
        'scores0': feats['scores'][:1],
        'scores1': feats['scores'][1:],
        'descriptors0': feats['descriptors'][:1],
        'descriptors1': feats['descriptors'][1:],
        'valid0': feats['valid'][:1],
        'valid1': feats['valid'][1:],
        'image_shape': image0.shape[:2],
    }
    out = sg.superglue(sg_params, data,
                       sinkhorn_iterations=sinkhorn_iterations,
                       match_threshold=match_threshold)
    k0 = np.asarray(data['keypoints0'][0])
    k1 = np.asarray(data['keypoints1'][0])
    matches = np.asarray(out['matches0'][0])
    conf = np.asarray(out['matching_scores0'][0])
    valid = matches > -1
    return {'mkpts0': k0[valid], 'mkpts1': k1[matches[valid]],
            'mconf': conf[valid], 'keypoints0': k0, 'keypoints1': k1,
            'matches': matches}


def estimate_pose(kpts0: np.ndarray, kpts1: np.ndarray, K0: np.ndarray,
                  K1: np.ndarray, thresh: float = 1.0,
                  conf: float = 0.99999) -> Optional[tuple]:
    """RANSAC essential matrix + cheirality. Ref: load_video_superglue.py:114-138."""
    import cv2
    if len(kpts0) < 5:
        return None
    f_mean = np.mean([K0[0, 0], K1[1, 1], K0[0, 0], K1[1, 1]])
    norm_thresh = thresh / f_mean
    k0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    k1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    E, mask = cv2.findEssentialMat(k0, k1, np.eye(3), threshold=norm_thresh,
                                   prob=conf, method=cv2.RANSAC)
    if E is None:
        return None
    best = None
    best_n = 0
    for e in np.split(E, len(E) // 3):
        n, R, t, _ = cv2.recoverPose(e, k0, k1, np.eye(3), 1e9, mask=mask)
        if n > best_n:
            best_n = n
            best = (R, t[:, 0], mask.ravel() > 0)
    return best


def _rotmat_slerp(r0: np.ndarray, r1: np.ndarray, ts: np.ndarray
                  ) -> np.ndarray:
    """SLERP between two rotation matrices (replaces roma.rotmat_slerp)."""
    from scipy.spatial.transform import Rotation, Slerp
    key = Rotation.from_matrix(np.stack([r0, r1]))
    return Slerp([0.0, 1.0], key)(ts).as_matrix()


def make_circle(direction: np.ndarray, n: int, radius: float = 0.03
                ) -> np.ndarray:
    """Spiral translation path around the baseline. Ref:
    load_video_superglue.py:56-80."""
    angles = np.linspace(0, 4 * np.pi, n)
    coord = np.stack([np.cos(angles) * radius, np.sin(angles) * radius,
                      np.linspace(0, 1, n)], axis=-1)
    # Seed axis: whichever of x-hat / y-hat is less parallel to `direction`
    # (the reference NaNs when the baseline is parallel to [1,0,0],
    # load_video_superglue.py:61-63; we keep the same result otherwise).
    candidates = np.eye(3)[:2]
    seed = candidates[np.argmin(np.abs(candidates @ direction))]
    axis_1 = seed - (direction * seed).sum() * direction
    axis_1 = axis_1 / np.linalg.norm(axis_1)
    axis_2 = np.cross(axis_1, direction)
    rot = np.stack([axis_1, axis_2, direction], axis=1)
    return (rot @ coord[:, :, None])[:, :, 0]


def rotate_interpolate(poses: np.ndarray, n: int) -> np.ndarray:
    """Slerp rotations + circular-offset translations between two poses.

    Ref: load_video_superglue.py:83-111 (drops 2 poses at each end)."""
    start, end = poses[0], poses[1]
    direction = end[:3, -1] - start[:3, -1]
    norm = np.linalg.norm(direction)
    trans = make_circle(direction / norm, n, radius=0.05) * norm
    rots = _rotmat_slerp(start[:3, :3], end[:3, :3], np.linspace(0, 1, n))
    out = np.tile(np.eye(4)[None], (n, 1, 1))
    out[:, :3, :3] = rots
    out[:, :3, -1] = trans
    return out[2:-2]


def scene_from_matches(mkpts0: np.ndarray, mkpts1: np.ndarray,
                       im0: np.ndarray, im1: np.ndarray,
                       n_poses: int = 80, sf: float = 1.2) -> dict:
    """Matched keypoints + prepared 256² RGB pair -> scene dict.

    The downstream half of ``get_camera_pose``
    (load_video_superglue.py:453-506): RANSAC essential pose, context
    cam2worlds (view 0 = identity, view 1 = inv([R|t]) with translation
    scaled by 1/sf, :481-483), and the slerp+circle interpolated query
    trajectory. Split from :func:`unposed_scene` so synthetic
    known-pose correspondences can drive everything after the learned
    matcher (tests/test_pose.py)."""
    H, W = im0.shape[:2]
    K = DEMO_INTRINSICS[:3, :3]
    ret = estimate_pose(mkpts0, mkpts1, K, K)
    if ret is None:
        raise RuntimeError('pose estimation failed (too few matches)')
    R, t, _ = ret
    pose1 = np.eye(4)
    pose2 = np.eye(4)
    pose2[:3, :3] = R
    pose2[:3, -1] = t
    pose2 = np.linalg.inv(pose2)
    pose2[:3, -1] /= sf                      # load_video_superglue.py:481-483

    ctx_c2w = np.stack([pose1, pose2])
    render_poses = rotate_interpolate(ctx_c2w, n_poses)

    ctx_rgb = np.stack([(im0 - 0.5) * 2, (im1 - 0.5) * 2]).astype(np.float32)
    n = render_poses.shape[0]
    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing='xy')
    uv = np.stack([i, j], -1).reshape(-1, 2).astype(np.float32)
    intr = DEMO_INTRINSICS
    return {
        'context': {'rgb': ctx_rgb[None],
                    'cam2world': ctx_c2w[None].astype(np.float32),
                    'intrinsics': np.tile(intr[None, None], (1, 2, 1, 1))},
        'query': {'rgb': np.tile(ctx_rgb[None, :1], (1, n, 1, 1, 1)),
                  'cam2world': render_poses[None].astype(np.float32),
                  'intrinsics': np.tile(intr[None, None], (1, n, 1, 1)),
                  'uv': np.broadcast_to(uv, (1, n) + uv.shape)},
    }


def unposed_scene(sp_params: Optional[dict], sg_params: Optional[dict],
                  im0: np.ndarray, im1: np.ndarray, n_poses: int = 80,
                  sf: float = 1.2) -> dict:
    """Two RGB images in [0,1] -> scene dict with an interpolated 76-pose
    query trajectory. Ref: ``get_camera_pose``
    (load_video_superglue.py:419-506).

    With ``sp_params``/``sg_params`` None, the weights-free classical
    frontend (``pose.classical``: Harris corners + NCC patches) replaces
    SuperPoint+SuperGlue — the learned blobs are LFS-missing in the
    reference repo itself, so this is the out-of-the-box path."""
    H = W = 256

    def prep(im):
        h, w = im.shape[:2]
        if w > h:
            off = (w - h) // 2
            im = im[:, off:off + h]
        from cross_attention_renderer_tpu.data.realestate import _resize
        return _resize(im, (H, W))

    im0, im1 = prep(im0), prep(im1)
    gray0 = im0 @ np.array([0.2125, 0.7154, 0.0721])
    gray1 = im1 @ np.array([0.2125, 0.7154, 0.0721])

    if sp_params is None or sg_params is None:
        from cross_attention_renderer_tpu.pose.classical import (
            match_pair_classical)
        m = match_pair_classical(gray0.astype(np.float32),
                                 gray1.astype(np.float32))
    else:
        m = match_pair(sp_params, sg_params, gray0.astype(np.float32),
                       gray1.astype(np.float32))
    return scene_from_matches(m['mkpts0'], m['mkpts1'], im0, im1,
                              n_poses=n_poses, sf=sf)
