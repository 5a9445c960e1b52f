"""Generate golden parity fixtures from the reference implementation.

Runs the PyTorch reference (mounted read-only at /root/reference) on CPU for
randomized-but-seeded camera/ray configurations and records per-function
outputs into ``tests/fixtures/geometry_golden.npz``. The JAX geometry tests
assert against these recordings (SURVEY.md §4 "golden-value parity tests").

Run once: ``python tests/make_geometry_fixtures.py``. The generated npz is
committed so CI/tests never need torch or the reference checkout.
"""

import os
import sys
import pathlib

import numpy as np

REFERENCE = '/root/reference'
OUT = pathlib.Path(__file__).parent / 'fixtures' / 'geometry_golden.npz'


def random_cameras(rng, n, spread=2.0):
    """Random-ish realistic cam2world matrices (look-at style) + intrinsics."""
    mats, intr = [], []
    for _ in range(n):
        eye = rng.normal(0, spread, 3)
        at = rng.normal(0, 0.3, 3)
        z = at - eye
        z = z / np.linalg.norm(z)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, eye
        mats.append(m)
        f = rng.uniform(180, 320)
        k = np.eye(4)
        k[0, 0], k[1, 1] = f, f * rng.uniform(0.9, 1.1)
        k[0, 2], k[1, 2] = 128 + rng.uniform(-5, 5), 128 + rng.uniform(-5, 5)
        intr.append(k)
    return np.stack(mats).astype(np.float64), np.stack(intr).astype(np.float64)


def main():
    sys.path.insert(0, REFERENCE)
    import torch
    # The reference hard-codes .cuda() in a few geometry helpers
    # (geometry.py:320,398,439); neutralize for CPU oracle runs.
    torch.Tensor.cuda = lambda self, *a, **k: self

    import geometry as ref_geom      # noqa: E402  (reference modules)
    import epipolar as ref_epi       # noqa: E402

    rng = np.random.default_rng(0)
    B, R, P = 6, 32, 16
    H = W = 256

    c2w, intr = random_cameras(rng, B)
    uv_pix = rng.uniform(0, 255, (B, R, 2))
    uv_ndc = rng.uniform(-1, 1, (B, R, P, 2))

    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float64)

    out = {
        'c2w': c2w, 'intr': intr, 'uv_pix': uv_pix, 'uv_ndc': uv_ndc,
        'H': np.array(H), 'W': np.array(W),
    }

    # --- plucker_embedding / ray dirs -------------------------------------
    plucker = ref_geom.plucker_embedding(t(c2w), t(uv_pix), t(intr))
    out['plucker'] = plucker.numpy()
    out['ray_dirs'] = ref_geom.get_ray_directions(
        t(uv_pix), t(c2w), t(intr)).numpy()

    # --- ray_directions_cam (ndc input) -----------------------------------
    out['ray_dirs_cam'] = ref_geom.get_ray_directions_cam(
        t(uv_ndc.reshape(B, R * P, 2)), t(intr), H, W).numpy()

    # --- project / lift ----------------------------------------------------
    pts_cam = rng.normal(0, 2, (B, R, 3))
    pts_cam[..., 2] = np.abs(pts_cam[..., 2]) + 0.2
    out['pts_cam'] = pts_cam
    proj = ref_geom.project(t(pts_cam[..., 0]), t(pts_cam[..., 1]),
                            t(pts_cam[..., 2]), t(intr))
    out['projected'] = proj.numpy()
    lifted = ref_geom.lift(t(uv_pix[..., 0]), t(uv_pix[..., 1]),
                           t(np.abs(rng.normal(2, 1, (B, R)))) * 0 + 1.5,
                           t(intr))
    out['lifted'] = lifted.numpy()

    # --- get_intersection (f64 oracle) -------------------------------------
    # Query rays in one frame vs context pixel rays; exercise the well- and
    # ill-conditioned regimes.
    q_plucker = plucker[:, :, None, :].broadcast_to(B, R, P, 6).contiguous()
    c2w2, intr2 = random_cameras(rng, B)
    ctx_pix = (t(uv_ndc)[..., :] + 1) / 2 * (H - 1)
    ctx_plucker = ref_geom.plucker_embedding(
        t(c2w2), ctx_pix.reshape(B, R * P, 2), t(intr2)).reshape(B, R, P, 6)
    p1, p2 = ref_geom.get_intersection(q_plucker, ctx_plucker)
    out['c2w2'], out['intr2'] = c2w2, intr2
    out['isect_p1'] = p1.numpy()
    out['isect_p2'] = p2.numpy()

    # --- get_3d_point_epipolar (identity context frame, as the model calls it)
    eye = np.broadcast_to(np.eye(4), (B, 4, 4)).copy()
    pt, dist, parallel, _ = ref_geom.get_3d_point_epipolar(
        t(plucker), t(uv_ndc), t(eye), H, W, t(intr))
    out['epi_pt'] = pt.numpy()
    out['epi_dist'] = dist.numpy()
    out['epi_parallel'] = parallel.numpy()

    # --- project_rays (epipolar.py) -----------------------------------------
    # As the model calls it (models.py:226-247): identity extrinsics, rays
    # given in the context camera frame, intrinsics normalized by H.
    torch32 = lambda x: torch.tensor(np.asarray(x), dtype=torch.float32)
    origins = rng.normal(0, 1.5, (B, R, 3))
    dirs = rng.normal(0, 1, (B, R, 3))
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    # include edge cases: origin at camera, origin on zero-depth plane
    origins[0, 0] = 0.0
    origins[0, 1] = [0.5, 0.3, 0.0]
    intr_norm = intr.copy()
    intr_norm[:, :2, :] /= H
    eye4 = np.broadcast_to(np.eye(4), (B, 4, 4)).copy()
    res = ref_epi.project_rays(torch32(origins), torch32(dirs),
                               torch32(eye4), torch32(intr_norm))
    out['pr_origins'] = origins
    out['pr_dirs'] = dirs
    out['pr_intr_norm'] = intr_norm
    out['pr_tmin'] = res['t_min'].numpy()
    out['pr_tmax'] = res['t_max'].numpy()
    out['pr_xymin'] = res['xy_min'].numpy()
    out['pr_xymax'] = res['xy_max'].numpy()
    out['pr_overlap'] = res['overlaps_image'].numpy()

    # --- project_rays with general extrinsics --------------------------------
    res2 = ref_epi.project_rays(torch32(origins), torch32(dirs),
                                torch32(c2w2), torch32(intr_norm))
    out['pr2_xymin'] = res2['xy_min'].numpy()
    out['pr2_xymax'] = res2['xy_max'].numpy()
    out['pr2_overlap'] = res2['overlaps_image'].numpy()

    # --- volumetric epipolar lines (no_sample ablation) ----------------------
    # The reference expects (b, n_ctxt, ...) shapes here (models.py:222).
    pl4 = t(plucker).reshape(B // 2, 2, R, 6)
    c2w4 = t(c2w).reshape(B // 2, 2, 4, 4)
    intr4 = t(intr).reshape(B // 2, 2, 4, 4)
    start, end, diff, no_int, points = ref_geom.get_epipolar_lines_volumetric(
        pl4, c2w4, intr4, H, W, 12)
    out['vol_start'] = start.numpy()
    out['vol_end'] = end.numpy()
    out['vol_valid'] = no_int.numpy()
    out['vol_points'] = points.numpy()

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f'wrote {OUT} ({OUT.stat().st_size/1024:.1f} KiB)')


if __name__ == '__main__':
    main()
