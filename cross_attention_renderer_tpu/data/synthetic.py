"""Synthetic posed-scene generator for tests and benchmarks.

Produces scene dicts with the exact layout the renderer consumes (and the
real data loaders emit): inward-looking cameras on a sphere around the
origin, RealEstate10K-like intrinsics, random or full-grid query rays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def look_at_cam2world(eye: np.ndarray, at: np.ndarray,
                      up=(0.0, 1.0, 0.0)) -> np.ndarray:
    z = at - eye
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, eye
    return m


def make_intrinsics(H: int, W: int, focal_scale: float = 1.0) -> np.ndarray:
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 0.98 * H * focal_scale
    k[0, 2], k[1, 2] = W / 2.0, H / 2.0
    return k


def _plane_color(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Deterministic multi-octave texture on the z=0 plane, range [-1, 1].

    Base octave is smooth; the two fine octaves put real high-frequency
    content in the images (periods ~40 px and ~12 px at the 256² operating
    distance) — real video frames are sharp, classical corner detection
    (pose/classical.py) needs gradients to grip, and without fine texture
    low epipolar sample counts trivially saturate quality tables."""
    r = np.sin(2.1 * x) * np.cos(1.3 * y)
    g = np.sin(1.7 * x + 0.5) * np.sin(2.9 * y)
    b = np.cos(1.1 * x * y + 1.0)
    fine = (0.6 * np.sin(16.3 * x + 0.7) * np.cos(14.9 * y)
            + 0.4 * np.sin(61.0 * x + 2.0 * y + 0.3)
            * np.cos(57.0 * y - 3.0 * x))
    fine2 = (0.6 * np.cos(15.1 * y - 1.1) * np.sin(17.7 * x)
             + 0.4 * np.cos(63.0 * y + 1.7 * x) * np.sin(55.0 * x + 0.9))
    base = np.stack([r, g, b], -1)
    detail = np.stack([fine, fine2, 0.5 * (fine - fine2)], -1)
    return 0.7 * base + 0.3 * detail


def _render_plane(c2w: np.ndarray, K: np.ndarray, H: int, W: int
                  ) -> np.ndarray:
    """Analytically render the textured z=0 plane from a camera."""
    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing='xy')
    x = (i - K[0, 2]) / K[0, 0]
    y = (j - K[1, 2]) / K[1, 1]
    dirs_cam = np.stack([x, y, np.ones_like(x)], -1)
    dirs = dirs_cam @ c2w[:3, :3].T
    origin = c2w[:3, 3]
    t = -origin[2] / np.where(np.abs(dirs[..., 2]) < 1e-6, 1e-6,
                              dirs[..., 2])
    pts = origin[None, None] + t[..., None] * dirs
    rgb = _plane_color(pts[..., 0], pts[..., 1])
    return np.where((t > 0)[..., None], rgb, -1.0)


def _analytic_scene(render, seed: int, n_view: int, H: int, W: int,
                    n_rays: int, dtype) -> dict:
    """Scene-dict assembly shared by the analytic world generators.

    ``render(c2w) -> (H, W, 3)`` must be multi-view consistent (a function
    of the world only)."""
    rng = np.random.default_rng(seed)
    K = make_intrinsics(H, W)

    def cam(eye_seed):
        r = np.random.default_rng(eye_seed)
        eye = np.array([r.uniform(-0.6, 0.6), r.uniform(-0.6, 0.6),
                        -2.0 + r.uniform(-0.3, 0.3)])
        return look_at_cam2world(eye, np.array([0.0, 0.0, 0.0]),
                                 up=(0.0, 1.0, 0.0))

    ctx_c2w = np.stack([cam(1000 * seed + v) for v in range(n_view)])
    qry_c2w = cam(1000 * seed + 777)[None]

    ctx_rgb = np.stack([render(c) for c in ctx_c2w])
    qry_img = render(qry_c2w[0])

    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing='xy')
    uv_full = np.stack([i, j], -1).reshape(-1, 2).astype(np.float64)
    rgb_full = qry_img.reshape(-1, 3)
    if n_rays:
        sel = rng.permutation(H * W)[:n_rays]
        uv, gt = uv_full[sel], rgb_full[sel]
    else:
        uv, gt = uv_full, rgb_full

    f = lambda x: jnp.asarray(x, dtype)
    return {
        'context': {'rgb': f(ctx_rgb[None]),
                    'cam2world': f(ctx_c2w[None]),
                    'intrinsics': f(np.broadcast_to(K, (1, n_view, 4, 4)))},
        'query': {'cam2world': f(qry_c2w[None]),
                  'intrinsics': f(K[None, None]),
                  'uv': f(uv[None, None]), 'rgb': f(gt[None, None]),
                  'mask': jnp.zeros((1,), dtype)},
    }


def make_plane_scene(seed: int, n_view: int = 2, H: int = 64, W: int = 64,
                     n_rays: int = 0, dtype=jnp.float32) -> dict:
    """Geometrically CONSISTENT synthetic scene: all views are analytic
    renders of one textured plane, so a correct epipolar renderer can learn
    to synthesize held-out query views (unlike the random-noise scenes from
    :func:`make_scene`, which only test plumbing)."""
    K = make_intrinsics(H, W)
    return _analytic_scene(lambda c: _render_plane(c, K, H, W),
                           seed, n_view, H, W, n_rays, dtype)


def _world_rects(seed: int, n_rects: int) -> list:
    """Deterministic floating rectangles for one boxes world:
    (z, x0, x1, y0, y1, texture shift). z in (-1.1, -0.25) — between the
    cameras (z ~ -2) and the base plane (z = 0)."""
    r = np.random.default_rng(31 * seed + 7)
    rects = []
    for k in range(n_rects):
        z = float(r.uniform(-1.1, -0.25))
        cx, cy = r.uniform(-0.9, 0.9, 2)
        hw, hh = r.uniform(0.15, 0.55, 2)
        shift = float(r.uniform(0.0, 20.0))
        rects.append((z, cx - hw, cx + hw, cy - hh, cy + hh, shift))
    # nearest-first not required — the renderer tracks best-t
    return rects


def _render_boxes(c2w: np.ndarray, K: np.ndarray, H: int, W: int,
                  rects: list) -> np.ndarray:
    """Textured z=0 base plane plus floating textured rectangles at
    different depths: real occlusion and depth discontinuities (the plane
    world saturates low sample counts; this one makes epipolar sampling
    strategy matter)."""
    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing='xy')
    x = (i - K[0, 2]) / K[0, 0]
    y = (j - K[1, 2]) / K[1, 1]
    dirs = np.stack([x, y, np.ones_like(x)], -1) @ c2w[:3, :3].T
    origin = c2w[:3, 3]
    dz = np.where(np.abs(dirs[..., 2]) < 1e-6, 1e-6, dirs[..., 2])

    t_base = -origin[2] / dz
    base_hit = t_base > 0
    pts = origin[None, None] + t_base[..., None] * dirs
    rgb = np.where(base_hit[..., None],
                   _plane_color(pts[..., 0], pts[..., 1]), -1.0)
    best_t = np.where(base_hit, t_base, np.inf)

    for (z, x0, x1, y0, y1, shift) in rects:
        t_k = (z - origin[2]) / dz
        p = origin[None, None] + t_k[..., None] * dirs
        hit = ((t_k > 1e-6) & (t_k < best_t)
               & (p[..., 0] >= x0) & (p[..., 0] <= x1)
               & (p[..., 1] >= y0) & (p[..., 1] <= y1))
        rgb = np.where(hit[..., None],
                       _plane_color(p[..., 0] + shift, p[..., 1] - shift),
                       rgb)
        best_t = np.where(hit, t_k, best_t)
    return rgb


def make_boxes_scene(seed: int, n_view: int = 2, H: int = 64, W: int = 64,
                     n_rays: int = 0, n_rects: int = 4,
                     dtype=jnp.float32) -> dict:
    """Multi-view-consistent world with occlusion: floating textured
    rectangles over the textured base plane. Use instead of
    :func:`make_plane_scene` when the measurement needs depth structure
    (e.g. discriminating epipolar sampling strategies — a single plane
    saturates at very low sample counts, BENCH_NOTES.md fast-eval table)."""
    K = make_intrinsics(H, W)
    rects = _world_rects(seed, n_rects)
    return _analytic_scene(lambda c: _render_boxes(c, K, H, W, rects),
                           seed, n_view, H, W, n_rays, dtype)


def make_scene(seed: int, batch: int = 1, n_view: int = 2, H: int = 64,
               W: int = 64, n_rays: int = 128, full_image: bool = False,
               dtype=jnp.float32) -> dict:
    """Build a synthetic scene dict.

    Cameras sit on a radius-2 shell looking at the origin; the query camera
    is between the context cameras (wide-baseline stereo geometry, like the
    RealEstate10K sampling rules in realestate10k_dataio.py:305-344).
    """
    rng = np.random.default_rng(seed)

    ctx_c2w = np.zeros((batch, n_view, 4, 4))
    qry_c2w = np.zeros((batch, 1, 4, 4))
    for b in range(batch):
        base = rng.normal(0, 1, 3)
        base = 2.0 * base / np.linalg.norm(base)
        for v in range(n_view):
            eye = base + rng.normal(0, 0.35, 3)
            ctx_c2w[b, v] = look_at_cam2world(eye, rng.normal(0, 0.05, 3))
        qry_eye = base + rng.normal(0, 0.2, 3)
        qry_c2w[b, 0] = look_at_cam2world(qry_eye, rng.normal(0, 0.05, 3))

    intr = np.broadcast_to(make_intrinsics(H, W),
                           (batch, n_view, 4, 4)).copy()
    q_intr = np.broadcast_to(make_intrinsics(H, W), (batch, 1, 4, 4)).copy()

    rgb = rng.uniform(-1, 1, (batch, n_view, H, W, 3))

    if full_image:
        i, j = np.meshgrid(np.arange(W), np.arange(H), indexing='xy')
        uv = np.stack([i, j], -1).reshape(1, 1, -1, 2).astype(np.float64)
        uv = np.broadcast_to(uv, (batch, 1, H * W, 2))
        gt = rng.uniform(-1, 1, (batch, 1, H * W, 3))
    else:
        uv = rng.uniform(0, min(H, W) - 1, (batch, 1, n_rays, 2))
        gt = rng.uniform(-1, 1, (batch, 1, n_rays, 3))

    f = lambda x: jnp.asarray(x, dtype)
    return {
        'context': {'rgb': f(rgb), 'cam2world': f(ctx_c2w),
                    'intrinsics': f(intr)},
        'query': {'cam2world': f(qry_c2w), 'intrinsics': f(q_intr),
                  'uv': f(uv), 'rgb': f(gt),
                  'mask': jnp.zeros((batch,), dtype)},
    }
