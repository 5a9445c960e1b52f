"""Epipolar line-segment projection.

Projects world-space query rays into a context camera and clips the ray
segment [t=0, t=inf) against the image frame, returning normalized (0..1)
segment endpoints plus an ``overlaps_image`` validity flag.

Behavioral reference: ``epipolar.py:175-253`` in
yilundu/cross_attention_renderer. The reference resolves the four
(zero-projection valid x infinity-projection valid) cases with boolean mask
assignment in a Python loop (`epipolar.py:241-251`); here the whole case
matrix collapses to two ``jnp.where`` selects, which is both branchless
(jit-safe, no host sync) and exactly equivalent:

  * endpoint at t=0:  projection of the origin if it lands inside the frame,
    otherwise the *first* frame-border intersection (min t);
  * endpoint at t=inf: projection of the direction (the vanishing point) if
    inside the frame, otherwise the *last* frame-border intersection (max t);
  * overlaps_image = both chosen endpoints are valid.

Everything is float32, fully batched, static-shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_INF = jnp.inf


class PointProjection(NamedTuple):
    """Projection of one candidate segment endpoint. Ref: epipolar.py:64-71."""
    t: Array        # ray parameter (camera rays: xyz = o + t d)
    xy: Array       # image-plane xy, normalized to [0, 1]
    valid: Array    # in front of camera AND inside the unit image square


class RaySegmentProjection(NamedTuple):
    """Ref: epipolar.py:165-172."""
    t_min: Array
    t_max: Array
    xy_min: Array   # (.., 2) normalized [0,1] image coords of the t_min end
    xy_max: Array
    overlaps_image: Array  # bool; when False the other fields are meaningless


def _in_bounds(xy: Array, eps: float = 1e-6) -> Array:
    """Inside the normalized image square. Ref: epipolar.py:28-35."""
    return jnp.all((xy >= -eps) & (xy <= 1.0 + eps), axis=-1)


def _in_front(xyz: Array, eps: float = 1e-6) -> Array:
    """Positive camera-space depth. Ref: epipolar.py:38-43."""
    return xyz[..., -1] > -eps


def _project_normalized(xyz: Array, intrinsics: Array,
                        eps: float = 1e-8) -> Array:
    """Pinhole projection with normalized (0..1) intrinsics. Ref: epipolar.py:23-26."""
    pts = xyz / (xyz[..., -1:] + eps)
    proj = jnp.einsum('...ij,...nj->...ni', intrinsics, pts, precision=lax.Precision.HIGHEST)
    return proj[..., :2]


def _intersect_image_coordinate(intrinsics: Array, origins: Array,
                                directions: Array, dim: int,
                                coordinate_value: float) -> PointProjection:
    """Intersect the ray's image-plane projection with one border line.

    ``dim`` is 0 for a vertical border (x = value) and 1 for horizontal
    (y = value). Ref: ``_intersect_image_coordinate`` (epipolar.py:74-122).
    """
    other = 1 - dim
    fs = intrinsics[..., None, dim, dim]
    fo = intrinsics[..., None, other, other]
    cs = intrinsics[..., None, dim, 2]
    co = intrinsics[..., None, other, 2]
    os_, oo = origins[..., dim], origins[..., other]
    ds, do = directions[..., dim], directions[..., other]
    oz, dz = origins[..., 2], directions[..., 2]

    c = (coordinate_value - cs) / fs
    # Infinities from zero denominators are fine — they fail the bounds check.
    t = (c * oz - os_) / (ds - c * dz)
    coord_other = co + fo * (oo * (c * dz - ds) + do * (os_ - c * oz)) / (
        dz * os_ - ds * oz)
    coord_same = jnp.full_like(coord_other, coordinate_value)
    xy = jnp.stack([coord_same, coord_other] if dim == 0
                   else [coord_other, coord_same], axis=-1)
    xyz = origins + t[..., None] * directions
    valid = _in_bounds(xy) & _in_front(xyz)
    return PointProjection(t=t, xy=xy, valid=valid)


def _reduce_projections(projs: list[PointProjection],
                        reduction: str) -> PointProjection:
    """Select per-ray the min- or max-t valid intersection.

    Ref: ``_compare_projections`` (epipolar.py:125-149)."""
    t = jnp.stack([p.t for p in projs], axis=0)
    xy = jnp.stack([p.xy for p in projs], axis=0)
    valid = jnp.stack([p.valid for p in projs], axis=0)
    lowest = _INF if reduction == 'min' else -_INF
    t_masked = jnp.where(valid, t, lowest)
    sel = (jnp.argmin(t_masked, axis=0) if reduction == 'min'
           else jnp.argmax(t_masked, axis=0))
    take = lambda arr: jnp.take_along_axis(
        arr, sel[None] if arr.ndim == t.ndim else sel[None, ..., None],
        axis=0)[0]
    return PointProjection(t=take(t_masked), xy=take(xy), valid=take(valid))


def project_rays(origins: Array, directions: Array, extrinsics: Array,
                 intrinsics: Array, epsilon: float = 1e-6
                 ) -> RaySegmentProjection:
    """Project rays into a camera as clipped epipolar segments.

    Args:
      origins: (C, R, 3) world-space ray origins.
      directions: (C, R, 3) world-space ray directions.
      extrinsics: (C, 4, 4) cam2world of the target camera.
      intrinsics: (C, 3+, 3+) intrinsics normalized for a 0..1 image plane.

    Ref: ``project_rays`` (epipolar.py:175-253).
    """
    intrinsics = intrinsics[..., :3, :3]

    world_to_cam = jnp.linalg.inv(extrinsics)
    origins_cam = jnp.einsum('...ij,...nj->...ni',
                             world_to_cam[..., :3, :3], origins, precision=lax.Precision.HIGHEST)
    origins_cam = origins_cam + world_to_cam[..., None, :3, 3]
    dirs_cam = jnp.einsum('...ij,...nj->...ni',
                          world_to_cam[..., :3, :3], directions, precision=lax.Precision.HIGHEST)

    border = [
        _intersect_image_coordinate(intrinsics, origins_cam, dirs_cam, 0, 0.0),
        _intersect_image_coordinate(intrinsics, origins_cam, dirs_cam, 0, 1.0),
        _intersect_image_coordinate(intrinsics, origins_cam, dirs_cam, 1, 0.0),
        _intersect_image_coordinate(intrinsics, origins_cam, dirs_cam, 1, 1.0),
    ]
    frame_min = _reduce_projections(border, 'min')
    frame_max = _reduce_projections(border, 'max')

    # Projection at t=0. An origin that sits exactly at the camera projects
    # via its direction instead; an origin merely on the zero-depth plane is
    # invalid. Ref: epipolar.py:205-221.
    mask_depth_zero = origins_cam[..., -1] < epsilon
    mask_at_camera = jnp.linalg.norm(origins_cam, axis=-1) < epsilon
    origins_for_proj = jnp.where(mask_at_camera[..., None], dirs_cam,
                                 origins_cam)
    xy_zero = _project_normalized(origins_for_proj, intrinsics)
    valid_zero = (_in_bounds(xy_zero) & _in_front(origins_for_proj)
                  & ~(mask_depth_zero & ~mask_at_camera))
    at_zero = PointProjection(t=jnp.zeros_like(frame_min.t), xy=xy_zero,
                              valid=valid_zero)

    # Projection at t=inf: the vanishing point of the direction.
    # Ref: epipolar.py:226-230.
    xy_inf = _project_normalized(dirs_cam, intrinsics)
    at_inf = PointProjection(t=jnp.full_like(frame_max.t, _INF), xy=xy_inf,
                             valid=_in_bounds(xy_inf) & _in_front(dirs_cam))

    # Case resolution (branchless form of epipolar.py:241-251).
    sel_min = at_zero.valid
    sel_max = at_inf.valid
    t_min = jnp.where(sel_min, at_zero.t, frame_min.t)
    xy_min = jnp.where(sel_min[..., None], at_zero.xy, frame_min.xy)
    valid_min = jnp.where(sel_min, at_zero.valid, frame_min.valid)
    t_max = jnp.where(sel_max, at_inf.t, frame_max.t)
    xy_max = jnp.where(sel_max[..., None], at_inf.xy, frame_max.xy)
    valid_max = jnp.where(sel_max, at_inf.valid, frame_max.valid)

    return RaySegmentProjection(
        t_min=t_min, t_max=t_max, xy_min=xy_min, xy_max=xy_max,
        overlaps_image=valid_min & valid_max)


def epipolar_segments_ndc(origins: Array, directions: Array,
                          intrinsics_norm: Array) -> tuple[Array, Array, Array]:
    """Convenience wrapper used by the renderer: identity extrinsics, ndc output.

    Returns (start_ndc, end_ndc, valid) with NaN/Inf scrubbed to 0, matching
    the renderer's post-processing (models.py:238-258).
    """
    eye = jnp.broadcast_to(jnp.eye(4, dtype=origins.dtype),
                           origins.shape[:-2] + (4, 4))
    seg = project_rays(origins, directions, eye, intrinsics_norm)
    start = (seg.xy_min - 0.5) * 2.0
    end = (seg.xy_max - 0.5) * 2.0
    start = jnp.where(jnp.isfinite(start), start, 0.0)
    end = jnp.where(jnp.isfinite(end), end, 0.0)
    return start, end, seg.overlaps_image.astype(origins.dtype)


def volumetric_epipolar_lines(plucker_cam: Array, cam2world: Array,
                              intrinsics: Array, H: int, W: int,
                              npoints: int) -> tuple[Array, Array, Array, Array]:
    """Uniform-depth epipolar sampling (the ``--no_sample`` ablation).

    Samples ``npoints`` depths linearly in [0.1, 10] along each query ray and
    projects them into the context image. Ref:
    ``get_epipolar_lines_volumetric`` (geometry.py:165-187).

    Returns (start_ndc, end_ndc, valid, pixel_ndc) with pixel_ndc of shape
    (..., R, npoints, 2).
    """
    from cross_attention_renderer_tpu.geometry import rays as _rays

    origin = _rays.ray_origin(cam2world)[..., None, None, :]
    interval = jnp.linspace(0.1, 10.0, npoints, dtype=plucker_cam.dtype)
    pts = origin + interval[..., :, None] * plucker_cam[..., None, :3]
    proj = _rays.project_pinhole(pts, intrinsics[..., None, :, :])
    pix = _rays.pixel_to_ndc(proj[..., :2], H, W)
    start = pix[..., 0, :]
    end = pix[..., -1, :]
    inside = jnp.all((pix < 1.0) & (pix > -1.0), axis=-1)
    valid = jnp.any(inside, axis=-1).astype(plucker_cam.dtype)
    return start, end, valid, pix
