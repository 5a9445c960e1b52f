"""Classical weights-free matching frontend: Harris corners + NCC patches.

Drop-in fallback for the SuperPoint+SuperGlue frontend of the unposed
pipeline when the learned blobs are unavailable — they are git-LFS-missing
in the reference repo itself (DEVIATIONS.md), so out of the box the
reference's ``render_unposed_traj.py`` demo cannot run at all; this module
makes ours run with meaningful poses on nothing but the code.

Detection, description, and matching are jittable JAX: Sobel/box filters
(``lax.reduce_window``), iterated-maxpool NMS (reused from
``pose.superpoint.simple_nms``), static-shape ``lax.top_k`` keypoint
selection, patch descriptors via a vmapped ``dynamic_slice``, and ONE
(K, K) similarity matmul — MXU work. Only the RANSAC essential-matrix
solve stays host-side, exactly like the learned path (``pose.unposed``).

Single-scale NCC patches are not rotation/scale invariant: intended for
the demo's moderate-baseline video-frame pairs (the same operating point
as the reference demo, load_video_superglue.py:419-453), not wide-baseline
re-localization. Algorithmic content is textbook Harris/NCC, nothing is
derived from the reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu.pose.superpoint import simple_nms

Array = jax.Array


def _box_filter(x: Array, radius: int) -> Array:
    """(H, W) box-sum filter with a (2r+1)² window, SAME edges.

    Unnormalized: Harris uses ratios of structure-tensor sums, so a common
    scale cancels; border slots (where the window is clipped) are masked by
    the detector anyway. (A ones-image reduce_window normalizer triggers
    minutes of XLA constant folding — measured, avoid.)"""
    k = 2 * radius + 1
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (k, k), (1, 1), 'SAME')


def harris_response(gray: Array, window_radius: int = 3) -> Array:
    """Shi–Tomasi corner response: min eigenvalue of the structure tensor.

    gray: (H, W) float in [0, 1]. Preferred over det−k·tr² because it is
    scale-monotone and non-negative wherever there is 2-D structure — a
    RELATIVE threshold then works across arbitrary texture contrast
    (synthetic worlds here have very low gradient magnitudes)."""
    # central-difference gradients (the box window supplies the smoothing)
    ix = jnp.gradient(gray, axis=1)
    iy = jnp.gradient(gray, axis=0)
    sxx = _box_filter(ix * ix, window_radius)
    syy = _box_filter(iy * iy, window_radius)
    sxy = _box_filter(ix * iy, window_radius)
    half_tr = 0.5 * (sxx + syy)
    disc = jnp.sqrt(jnp.maximum(
        0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    return half_tr - disc


def detect(gray: Array, max_keypoints: int = 512, nms_radius: int = 4,
           border: int = 12) -> tuple:
    """Static-shape Harris keypoints.

    Returns (kpts_xy (K, 2) float32, scores (K,), valid (K,) bool); invalid
    slots are top_k padding below the response floor."""
    H, W = gray.shape
    r = harris_response(gray)
    r = simple_nms(r[None], nms_radius)[0]
    yy, xx = jnp.mgrid[0:H, 0:W]
    inside = ((xx >= border) & (xx < W - border)
              & (yy >= border) & (yy < H - border))
    r = jnp.where(inside, r, -jnp.inf)
    scores, idx = jax.lax.top_k(r.reshape(-1), max_keypoints)
    iy = idx // W
    ix = idx % W
    # subpixel: 1-D quadratic fit along each axis on the raw response
    # (argmax of a parabola through the 3 samples), clipped to +-0.5
    def parab(rm, r0, rp):
        denom = rm - 2.0 * r0 + rp
        off = 0.5 * (rm - rp) / jnp.where(jnp.abs(denom) < 1e-20, 1.0,
                                          denom)
        return jnp.where(jnp.abs(denom) < 1e-20, 0.0,
                         jnp.clip(off, -0.5, 0.5))

    raw = harris_response(gray)
    g = raw[jnp.clip(iy[:, None] + jnp.array([-1, 0, 1]), 0, H - 1),
            ix[:, None]]
    dy = parab(g[:, 0], g[:, 1], g[:, 2])
    g = raw[iy[:, None],
            jnp.clip(ix[:, None] + jnp.array([-1, 0, 1]), 0, W - 1)]
    dx = parab(g[:, 0], g[:, 1], g[:, 2])
    # relative floor: keep corners within 3 decades of the strongest one
    # (absolute thresholds fail across texture-contrast regimes)
    valid = scores > jnp.maximum(scores[0] * 1e-3, 1e-12)
    kxy = jnp.stack([ix.astype(jnp.float32) + dx,
                     iy.astype(jnp.float32) + dy], -1)
    return kxy, scores, valid


def describe(gray: Array, kpts_xy: Array, patch_radius: int = 7) -> Array:
    """Zero-mean unit-norm patch descriptors at integer keypoints.

    (K, (2r+1)²) float32 — NCC between two descriptors is their dot
    product."""
    p = 2 * patch_radius + 1

    def one(kp):
        y = jnp.round(kp[1]).astype(jnp.int32) - patch_radius
        x = jnp.round(kp[0]).astype(jnp.int32) - patch_radius
        patch = jax.lax.dynamic_slice(gray, (y, x), (p, p))
        v = patch.reshape(-1)
        v = v - v.mean()
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-6)

    return jax.vmap(one)(kpts_xy)


def match_descriptors(d0: Array, d1: Array, valid0: Array, valid1: Array,
                      min_score: float = 0.6, margin: float = 0.05) -> tuple:
    """Mutual-nearest NCC matching with an absolute floor and a
    second-best margin (the similarity-space analog of Lowe's ratio).

    Returns (matches0 (K,) int32 — index into d1 or -1, scores0 (K,))."""
    sim = d0 @ d1.T                                     # (K0, K1) NCC
    sim = jnp.where(valid0[:, None] & valid1[None, :], sim, -2.0)
    best1 = jnp.argmax(sim, axis=1)
    s_best = jnp.max(sim, axis=1)
    # second-best along axis 1 for the margin test
    masked = jnp.where(jax.nn.one_hot(best1, sim.shape[1], dtype=bool),
                       -2.0, sim)
    s_second = jnp.max(masked, axis=1)
    best0 = jnp.argmax(sim, axis=0)                     # reverse direction
    mutual = best0[best1] == jnp.arange(sim.shape[0])
    ok = mutual & (s_best > min_score) & (s_best - s_second > margin)
    return jnp.where(ok, best1, -1).astype(jnp.int32), s_best


@functools.partial(jax.jit, static_argnums=(2, 3))
def _match_pair_jit(g0, g1, max_keypoints: int, min_score: float):
    # Module-level jit (static over the config) so per-pair callers — e.g.
    # a video-frame loop — reuse one compiled executable instead of
    # retracing through a fresh closure every call.
    k0, s0, v0 = detect(g0, max_keypoints)
    k1, s1, v1 = detect(g1, max_keypoints)
    d0 = describe(g0, k0)
    d1 = describe(g1, k1)
    m, conf = match_descriptors(d0, d1, v0, v1, min_score=min_score)
    return k0, k1, m, conf


def match_pair_classical(image0: np.ndarray, image1: np.ndarray,
                         max_keypoints: int = 512,
                         min_score: float = 0.6) -> dict:
    """Grayscale pair in [0, 1] -> the same matched-keypoint dict as
    ``unposed.match_pair`` (drop-in for the learned frontend)."""
    g0 = jnp.asarray(image0, jnp.float32)
    g1 = jnp.asarray(image1, jnp.float32)
    k0, k1, m, conf = (np.asarray(a) for a in _match_pair_jit(
        g0, g1, max_keypoints, float(min_score)))
    valid = m > -1
    return {'mkpts0': k0[valid], 'mkpts1': k1[m[valid]],
            'mconf': conf[valid], 'keypoints0': k0, 'keypoints1': k1,
            'matches': m}
