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
