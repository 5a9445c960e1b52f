"""Cross-attention light-field renderer (the flagship model).

TPU-first re-design of the reference ``CrossAttentionRenderer``
(``models.py:42-626``): one pure function of (params, scene, rays) built from
channel-last tensors, Dense layers instead of 1x1 convs (same math, maps
straight onto the MXU), branchless masking instead of boolean indexing, and
explicit activations instead of forward hooks. The computation graph is
stage-for-stage equivalent to the reference:

  1. ``encode``: DPT-hybrid multiview encoder + full-res high-freq conv
     branch -> feature pyramid z (models.py:148-188).
  2. Query rays -> Plücker coords in every context frame (models.py:213).
  3. Epipolar segment per (ray, view) + ``npoints`` uniform samples
     (models.py:226-275).
  4. Bilinear gather of the pyramid at the samples (models.py:278).
  5. Multi-view latent exchange: 3D point on the query ray per sample,
     reprojected into the other view(s), second gather, shared 2-layer
     encode (models.py:281-475).
  6. Two rounds of ray<->epipolar-sample cross attention over the joint
     (view x sample) axis (models.py:487-567).
  7. Attention-derived depth (models.py:573-594) and the ResnetFC
     light-field decode (models.py:599-612) with valid-mask whiteout
     (models.py:615-617).

Scene dict layout (channel-last):
  context: rgb (B, V, H, W, 3) in [-1, 1]; cam2world (B, V, 4, 4);
           intrinsics (B, V, 4, 4) in pixel units.
  query:   cam2world (B, 1, 4, 4); intrinsics (B, 1, 4, 4);
           uv (B, 1, R, 2) in pixel units.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu import geometry as G
from cross_attention_renderer_tpu.encoders.dpt import DPTHybridEncoder
from cross_attention_renderer_tpu.models.resnet_fc import ResnetFC
from cross_attention_renderer_tpu.ops import grid_sample_pyramid
from cross_attention_renderer_tpu.utils.image import normalize_imagenet

Array = Any

HIDDEN_DIM = 128          # attention hidden width (models.py:114)
ATTN_SCALE = 1.0 / 16.0   # models.py:532,555
QUERY_FEAT_DIM = 16       # cam_rays 3 + cam_origin 3 + ray_dir 3 + depth 4
                          # + query origin 3 (models.py:528)


def _mlp2(x: Array, layer1, layer2) -> Array:
    return layer2(nn.relu(layer1(x)))


class SplitDense(nn.Module):
    """Dense layer that accepts its input pre-split into channel segments.

    ``SplitDense(f, d)(a, b)`` computes exactly ``Dense(f)(concat([a,b]))``
    by slicing the kernel — the (..., 576)-wide concatenation (which XLA
    pads to lane tiles and materializes, ~7 ms at flagship sizes) never
    exists. Parameter names, shapes, and initializers match ``nn.Dense``
    bit-for-bit, so checkpoints and the torch converter are unaffected.
    Setup-style so fused kernels (ops/experimental/fused_mlp.py) can read ``.kernel`` /
    ``.bias`` directly.
    """
    features: int
    d_in: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param('kernel', nn.initializers.lecun_normal(),
                                 (self.d_in, self.features))
        self.bias = self.param('bias', nn.initializers.zeros_init(),
                               (self.features,))

    def __call__(self, *parts: Array) -> Array:
        assert sum(p.shape[-1] for p in parts) == self.d_in, (
            [p.shape for p in parts], self.d_in)
        k = self.kernel.astype(self.dtype)
        out = None
        off = 0
        for p in parts:
            w = jax.lax.slice_in_dim(k, off, off + p.shape[-1], axis=0)
            off += p.shape[-1]
            t = jnp.matmul(p.astype(self.dtype), w)
            out = t if out is None else out + t
        return out + self.bias.astype(self.dtype)


class CrossAttentionRenderer(nn.Module):
    """See module docstring. Flags mirror the reference CLI ablations
    (models.py:43, experiment_scripts/train_realestate10k.py:51-55)."""

    n_view: int = 2
    npoints: int = 0              # 0 -> reference default (64, or 48 @ 3 views)
    model: str = 'midas_vit'
    no_sample: bool = False       # volumetric uniform-depth sampling ablation
    no_latent_concat: bool = False
    no_multiview: bool = False    # zero the pose embedding
    # Reproduce the reference's 3-view exchange index swap (models.py:384-393
    # projects frame-v coordinates of view-k rays onto frame k) instead of
    # the geometrically consistent pairing. Only meaningful at n_view >= 3;
    # exists so golden-parity tests can pin the reference bit-for-bit while
    # the default stays fixed (see DEVIATIONS.md).
    reference_exchange_compat: bool = False
    no_high_freq: bool = False    # zero the full-res conv branch
    repeat_attention: bool = True
    # Use the fused Pallas joint-softmax attention kernel; the jnp reference
    # path is algebraically identical and used for gradients. None = auto:
    # ON on TPU — with the f32-logit/softmax policy (round-3 bf16 fix) the
    # kernel does that math in VMEM for free and beats the XLA path
    # (457.9 vs 475.5 ms per full image); on CPU the jnp path runs.
    fused_attention: Optional[bool] = None
    # Use the fused Pallas exchange epilogue (ops/gather_epilogue.py).
    # None = auto: ON on TPU (production render hot path), overridable via
    # CAR_FUSED_EPILOGUE. The trainer clones the model with both fused_*
    # fields False: the kernels' custom VJPs recompute the jnp forward in
    # the backward anyway, and the flagship batch-12 train program with the
    # kernels inlined crashes the TPU compiler's register allocator
    # (BENCH_NOTES round 4) — the jnp path is the measured training
    # configuration.
    fused_epilogue: Optional[bool] = None
    # Run both pyramid gathers on a row-sorted sample stream (Pallas windowed
    # gather, ops/sorted_gather.py) instead of XLA row-take. None = auto:
    # enabled on TPU for eval-scale ray counts on the multi-view latent-
    # concat path. Numerically equivalent (same bilinear sum, bf16 tables).
    sorted_stream: Optional[bool] = None
    # Per-level gathered-feature widths after a PCA projection of the
    # encoder pyramid (the narrow fast-eval mode, train/evaluation.py
    # make_narrow_renderer): only the fuse layer's input rows change —
    # the scene-specific basis is folded into query_encode_latent's
    # kernel, so every other layer (and all fused kernels, which are
    # channel-width generic) is untouched. None = full widths. No
    # reference counterpart (its gathers are always full-width,
    # models.py:278).
    narrow_features: Optional[tuple[int, int, int]] = None
    # Encoder size knobs (reference config = defaults). Smaller settings keep
    # the architecture identical for fast CPU tests.
    fusion_features: int = 256
    vit_width: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    remat: bool = False     # rematerialize ViT blocks (memory for FLOPs)
    resnet_layers: tuple[int, int, int] = (3, 4, 9)
    dtype: Any = jnp.float32

    @property
    def n_samples(self) -> int:
        if self.npoints:
            return self.npoints
        return 64 if self.n_view <= 2 else 48

    @property
    def base_latent_dim(self) -> int:
        if self.model == 'midas_vit':
            return 2 * self.fusion_features + 64
        if self.model == 'resnet':
            return 512
        if self.model == 'unet':
            return 960
        raise ValueError(f'unknown encoder model {self.model!r}')

    @property
    def latent_dim(self) -> int:
        if self.n_view > 1 and not self.no_latent_concat:
            return self.base_latent_dim // 2
        return self.base_latent_dim

    def setup(self):
        if self.model == 'midas_vit':
            self.encoder = DPTHybridEncoder(
                features=self.fusion_features, vit_width=self.vit_width,
                vit_depth=self.vit_depth, vit_heads=self.vit_heads,
                remat=self.remat,
                resnet_layers=self.resnet_layers, dtype=self.dtype)
            self.conv_map = nn.Conv(64, (7, 7), padding=3, dtype=self.dtype)
        elif self.model == 'resnet':
            from cross_attention_renderer_tpu.encoders.spatial import (
                SpatialEncoder)
            self.encoder = SpatialEncoder(dtype=self.dtype)
        elif self.model == 'unet':
            from cross_attention_renderer_tpu.encoders.unet import UNetEncoder
            self.encoder = UNetEncoder(dtype=self.dtype)
        else:
            raise ValueError(f'unknown encoder model {self.model!r}')

        ld = self.latent_dim
        multiview = self.n_view > 1 and not self.no_latent_concat
        # channels of interp_val feeding latent_value / key_map
        d_interp = ld * self.n_view if multiview else self.base_latent_dim
        if multiview:
            d_feat = (sum(self.narrow_features) if self.narrow_features
                      else self.base_latent_dim)
            self.query_encode_latent = SplitDense(
                self.base_latent_dim, d_in=d_feat + 3,
                dtype=self.dtype)
            self.query_encode_latent_2 = SplitDense(
                ld, d_in=self.base_latent_dim, dtype=self.dtype)
        elif not self.no_latent_concat:
            self.update_val_merge = nn.Dense(ld, dtype=self.dtype)

        self.latent_value = SplitDense(ld, d_in=d_interp, dtype=self.dtype)
        self.key_map = SplitDense(HIDDEN_DIM, d_in=d_interp,
                                  dtype=self.dtype)
        # SplitDense with one segment == nn.Dense (same params); setup-style
        # so the fused epilogue kernel can read .kernel/.bias.
        self.key_map_2 = SplitDense(HIDDEN_DIM, d_in=HIDDEN_DIM,
                                    dtype=self.dtype)
        # single-segment SplitDense == nn.Dense (same params); setup-style
        # so the fused render kernel can read .kernel/.bias.
        self.query_embed = SplitDense(HIDDEN_DIM, d_in=QUERY_FEAT_DIM,
                                      dtype=self.dtype)
        self.query_embed_2 = SplitDense(HIDDEN_DIM, d_in=HIDDEN_DIM,
                                        dtype=self.dtype)
        self.encode_latent = SplitDense(HIDDEN_DIM, d_in=ld,
                                        dtype=self.dtype)
        self.query_repeat_embed = SplitDense(
            HIDDEN_DIM, d_in=HIDDEN_DIM + QUERY_FEAT_DIM, dtype=self.dtype)
        self.query_repeat_embed_2 = SplitDense(HIDDEN_DIM, d_in=HIDDEN_DIM,
                                               dtype=self.dtype)
        self.phi = ResnetFC(d_in=self.n_view * 9,
                            d_latent=ld * self.n_view,
                            d_out=3, n_blocks=3, d_hidden=128,
                            dtype=self.dtype)

    # ------------------------------------------------------------------
    # Encoder (reference get_z, models.py:148-188)
    # ------------------------------------------------------------------
    def encode(self, scene: dict) -> tuple[Array, ...]:
        ctx = scene['context']
        rgb = ctx['rgb']
        B, V, H, W, _ = rgb.shape
        c2w = ctx['cam2world']
        rel = jnp.einsum('bij,bvjk->bvik', jnp.linalg.inv(c2w[:, 0]), c2w,
                         precision=jax.lax.Precision.HIGHEST)
        rel16 = rel.reshape(B, V, 16)
        if self.no_multiview:
            rel16 = jnp.zeros_like(rel16)

        rgb_norm = normalize_imagenet((rgb + 1.0) * 0.5).astype(self.dtype)

        if self.model == 'midas_vit':
            path2, path1 = self.encoder(rgb_norm, rel16)
            z_conv = self.conv_map(rgb_norm.reshape(B * V, H, W, 3))
            if self.no_high_freq:
                z_conv = jnp.zeros_like(z_conv)
            return (path2, path1, z_conv)
        return tuple(self.encoder(rgb_norm.reshape(B * V, H, W, 3)))

    # ------------------------------------------------------------------
    # Renderer forward (reference forward, models.py:190-626)
    # ------------------------------------------------------------------
    def __call__(self, scene: dict,
                 z: Optional[Sequence[Array]] = None,
                 z_packed: Optional[Sequence[Array]] = None,
                 t_vals: Optional[Array] = None) -> dict:
        ctx, qry = scene['context'], scene['query']
        B, V, H, W, _ = ctx['rgb'].shape
        R = qry['uv'].shape[2]
        # ``t_vals`` (B, V, R, P) overrides the uniform epipolar-segment
        # parametrization with per-ray sample positions in [0, 1] — the
        # coarse-to-fine pruned-eval path (train/evaluation.py
        # make_pruned_renderer) places its fine samples with it. The
        # reference has no counterpart (models.py:231 is always uniform).
        P = t_vals.shape[-1] if t_vals is not None else self.n_samples
        out: dict = {}

        if z is None:
            z = self.encode(scene)
        z = tuple(z)

        # Relative poses: everything happens in each context camera's frame.
        ctx_c2w = ctx['cam2world']
        inv_ctx = jnp.linalg.inv(ctx_c2w)
        query_cam2world = jnp.einsum(
            'bvij,bqjk->bvik', inv_ctx, qry['cam2world'],
            precision=jax.lax.Precision.HIGHEST)           # (B, V, 4, 4)

        # Query-ray Plücker coords per context frame (models.py:213-214).
        uv = jnp.broadcast_to(qry['uv'][:, 0][:, None], (B, V, R, 2))
        q_intr = jnp.broadcast_to(qry['intrinsics'], (B, V, 4, 4))
        lf_coords = G.plucker_embedding(
            query_cam2world.reshape(B * V, 4, 4),
            uv.reshape(B * V, R, 2),
            q_intr.reshape(B * V, 4, 4))                   # (B*V, R, 6)

        ctx_intr = ctx['intrinsics'].reshape(B * V, 4, 4)
        origins = jnp.broadcast_to(
            G.ray_origin(query_cam2world).reshape(B * V, 1, 3), (B * V, R, 3))
        ray_dir = lf_coords[..., :3]

        if self.no_sample:
            if t_vals is not None:
                raise ValueError('t_vals is not supported with no_sample '
                                 '(uniform-depth ablation has no segment '
                                 'parametrization)')
            start, end, valid, pixel_val = G.volumetric_epipolar_lines(
                lf_coords.reshape(B, V, R, 6), query_cam2world,
                ctx['intrinsics'], H, W, P)
            start = start.reshape(B * V, R, 2)
            end = end.reshape(B * V, R, 2)
            valid = valid.reshape(B * V, R)
            pixel_val = pixel_val.reshape(B * V, R, P, 2)
        else:
            # Epipolar segments with intrinsics normalized by H
            # (models.py:226-228 — the reference divides by H, not (W, H)).
            intr_norm = ctx_intr.at[:, :2, :].set(ctx_intr[:, :2, :] / H)
            start, end, valid = G.epipolar_segments_ndc(
                origins, ray_dir, intr_norm)
            if t_vals is not None:
                interval = t_vals.reshape(B * V, R, P).astype(start.dtype)
                pixel_val = (start[..., None, :]
                             + (end - start)[..., None, :]
                             * interval[..., None])        # (B*V, R, P, 2)
            else:
                interval = jnp.linspace(0.0, 1.0, P, dtype=start.dtype)
                pixel_val = (start[..., None, :]
                             + (end - start)[..., None, :]
                             * interval[:, None])          # (B*V, R, P, 2)

        # 3D point on the query ray per epipolar sample (context frame),
        # shared by the latent exchange and the depth head (models.py:283,503).
        eye = jnp.broadcast_to(jnp.eye(4, dtype=lf_coords.dtype),
                               (B * V, 4, 4))
        with jax.named_scope('epipolar_point_3d'):
            pt, dist, parallel = G.epipolar_point_3d(
                lf_coords, pixel_val, eye, H, W, ctx_intr)  # (B*V, R, P, 3)
        pt_views = pt.reshape(B, V, R, P, 3)

        multiview = self.n_view > 1 and not self.no_latent_concat
        use_sorted = multiview and self._use_sorted_stream(B, V, R, P)

        if use_sorted and V == 2:
            # Fully-sorted fast path: one sort serves both pyramid gathers,
            # the exchange, and the attention input projections; a single
            # un-permute restores ray order (see _sorted_exchange_v2).
            with jax.named_scope('sorted_exchange_v2'):
                joint_latent, key_val = self._sorted_exchange_v2(
                    z, pixel_val, pt_views, ctx_c2w, ctx['intrinsics'],
                    H, W)
        elif multiview and V == 2 and not use_sorted:
            from cross_attention_renderer_tpu.ops import pack_pyramid
            # one cell-table build serves both streams; callers rendering
            # many blocks per scene (the scan renderer) pass z_packed so
            # the build happens once per image instead of once per block
            zp = tuple(z_packed) if z_packed is not None else pack_pyramid(z)
            if self._use_fused_render(R):
                # Defer to the fully-fused render core (called after
                # local_coords is assembled, below).
                joint_latent = key_val = None
            elif self._use_fused_epilogue():
                # Production TPU path: raw packed-cell takes feed ONE Pallas
                # kernel fusing combine + exchange MLPs + latent/key
                # projections (ops/gather_epilogue.py).
                with jax.named_scope('fused_exchange_v2'):
                    joint_latent, key_val = self._fused_exchange_v2(
                        zp, pixel_val, pt_views, ctx_c2w,
                        ctx['intrinsics'], H, W)
            else:
                # Standard V=2 path with split-weight projections: neither
                # the 576-ch pyramid concat nor the per-view [self, cross] /
                # [cross, self] channel concatenations (models.py:335,342)
                # are ever materialized — SplitDense slices the fuse /
                # latent_value / key_map kernels instead.
                # NOTE: keeping the pyramid levels as separate SplitDense
                # segments here measured SLOWER (145 vs 141 ms/block): the
                # extra per-part dot accumulations cost more than the
                # concat copies they avoid. The concat stays.
                from cross_attention_renderer_tpu.ops import (
                    grid_sample_pyramid_packed)
                with jax.named_scope('epipolar_gather'):
                    interp_val = grid_sample_pyramid_packed(
                        zp, pixel_val.reshape(B * V, R * P, 2), 'border')
                interp_val = interp_val.reshape(B, V, R, P, -1)
                with jax.named_scope('latent_exchange'):
                    fs, fc = self._latent_exchange_parts(
                        zp, interp_val, pt_views, ctx_c2w,
                        ctx['intrinsics'], H, W)
                joint_latent = jnp.stack(
                    [self.latent_value(fs[:, 0], fc[:, 0]),
                     self.latent_value(fc[:, 1], fs[:, 1])], axis=1)
                h = jnp.stack(
                    [nn.relu(self.key_map(fs[:, 0], fc[:, 0])),
                     nn.relu(self.key_map(fc[:, 1], fs[:, 1]))], axis=1)
                key_val = self.key_map_2(h)
        elif (multiview and V >= 3 and not use_sorted
              and not self.reference_exchange_compat
              and self._use_fused_epilogue()):
            from cross_attention_renderer_tpu.ops import pack_pyramid
            zp = tuple(z_packed) if z_packed is not None else pack_pyramid(z)
            # Production V=3 path: raw packed-cell takes (one per level for
            # all three streams) feed the multi-stream Pallas epilogue —
            # same math as _latent_exchange + latent_value/key_map chains
            # (reference models.py:345-475,491,529).
            with jax.named_scope('fused_exchange_v3'):
                joint_latent, key_val = self._fused_exchange_multi(
                    zp, pixel_val, pt_views, ctx_c2w, ctx['intrinsics'],
                    H, W)
        else:
            if use_sorted:
                # V>=3: per-stream sorts; exchange assembled in ray order.
                with jax.named_scope('sorted_gather_exchange'):
                    interp_val = self._latent_exchange_sorted(
                        z, pixel_val, pt_views, ctx_c2w, ctx['intrinsics'],
                        H, W)
            else:
                # Gather the feature pyramid along the segments
                # (models.py:278).
                with jax.named_scope('epipolar_gather'):
                    interp_val = grid_sample_pyramid(
                        z, pixel_val.reshape(B * V, R * P, 2), 'border')
                interp_val = interp_val.reshape(B, V, R, P, -1)

            if multiview and not use_sorted:
                with jax.named_scope('latent_exchange'):
                    interp_val = self._latent_exchange(
                        z, interp_val, pt_views, ctx_c2w, ctx['intrinsics'],
                        H, W)
            elif multiview or self.no_latent_concat:
                pass
            else:
                # Single view: append tanh-encoded 3D point
                # (models.py:479-485).
                pt1 = pt_views[:, :, :, :, :]
                pt_feat = jnp.concatenate(
                    [jnp.tanh(pt1 / 5.0), jnp.tanh(pt1 / 100.0)], axis=-1)
                interp_val = self.update_val_merge(
                    jnp.concatenate([interp_val, pt_feat], axis=-1))

            joint_latent = self.latent_value(interp_val)   # (B,V,R,P,ld)
            key_val = _mlp2(interp_val, self.key_map, self.key_map_2)

        # Per-sample query features (models.py:494-528).
        cam_rays = G.ray_directions_cam(
            pixel_val, ctx_intr[:, None], H, W)            # (B*V, R, P, 3)
        cam_rays = cam_rays.reshape(B, V, R, P, 3)
        ray_dir_e = jnp.broadcast_to(
            ray_dir.reshape(B, V, R, 1, 3), cam_rays.shape)
        q_orig = G.ray_origin(query_cam2world)             # (B, V, 3)
        q_orig_e = jnp.broadcast_to(
            q_orig[:, :, None, None, :], cam_rays.shape)

        depth = jnp.linalg.norm(
            pt_views - q_orig[:, :, None, None, :], axis=-1, keepdims=True)
        depth = jnp.where(jnp.isfinite(depth), depth, 1e6)
        depth = jax.lax.stop_gradient(depth)               # models.py:516
        depth_encode = jnp.concatenate(
            [jnp.tanh(depth), jnp.tanh(depth / 10.0),
             jnp.tanh(depth / 100.0), jnp.tanh(depth / 1000.0)], axis=-1)

        local_coords = jnp.concatenate(
            [cam_rays, jnp.zeros_like(q_orig_e), ray_dir_e, depth_encode,
             q_orig_e], axis=-1)                           # (B,V,R,P,16)

        if joint_latent is None:
            # Fully-fused render core: takes -> exchange -> both attention
            # rounds in ONE Pallas kernel (ops/fused_render.py); deferred to
            # here because local_coords is a kernel input.
            with jax.named_scope('fused_render_v2'):
                z_final, at_wt = self._fused_render_v2(
                    zp, pixel_val, pt_views, ctx_c2w, ctx['intrinsics'],
                    H, W, local_coords)
            z_local = jnp.broadcast_to(
                z_final[:, None], (B, V, R, z_final.shape[-1]))
        else:
            coords_embed = _mlp2(local_coords, self.query_embed,
                                 self.query_embed_2)

            # Round-1 joint attention over (view, sample)
            # (models.py:532-541).
            z_sum, at_wt = self._attend(coords_embed, key_val, joint_latent)
            z_local = jnp.broadcast_to(z_sum[:, None],
                                       joint_latent.shape[:3]
                                       + (joint_latent.shape[-1],))

            # Round 2: query conditioned on the round-1 latent
            # (models.py:547-565).
            if self.repeat_attention:
                z_embed = self.encode_latent(z_local)      # (B,V,R,128)
                z_embed_local = jnp.broadcast_to(
                    z_embed[:, :, :, None, :],
                    z_embed.shape[:3] + (P, HIDDEN_DIM))
                query_embed_local = self.query_repeat_embed_2(nn.relu(
                    self.query_repeat_embed(
                        z_embed_local, local_coords.astype(self.dtype))))
                z_sum2, _ = self._attend(query_embed_local, coords_embed,
                                         joint_latent)
                # (sum_v of z2 + V * z_sum) broadcast back — identical to
                # the reference's per-view add then cross-view sum
                # (models.py:561-565) since round-1 z_local is already the
                # view-broadcast sum.
                z_local = jnp.broadcast_to(
                    (z_sum2 + V * z_sum)[:, None], z_local.shape)

        # Attention-derived depth, round-1 weights (models.py:573-594).
        pt_clamp = jnp.clip(pt_views, -100.0, 100.0)
        world_point = jnp.sum(at_wt[..., None] * pt_clamp, axis=3)
        world_point = jnp.sum(world_point, axis=1)         # (B, R, 3)
        cam_point = G.points_to_cam(world_point,
                                    qry['cam2world'][:, 0][:, None])
        depth_ray = jnp.clip(cam_point[..., 2], 0.0, 10.0)[..., None]

        # Light-field decode (models.py:596-612).
        coords9 = jnp.concatenate(
            [lf_coords.reshape(B, V, R, 6),
             jnp.broadcast_to(q_orig[:, :, None, :], (B, V, R, 3))], axis=-1)
        coords_flat = coords9.transpose(0, 2, 1, 3).reshape(B, R, V * 9)
        z_flat = z_local.transpose(0, 2, 1, 3).reshape(B, R, -1)
        rgb = self.phi(jnp.concatenate([z_flat, coords_flat], axis=-1))

        # Valid-mask whiteout (models.py:615-617).
        valid_any = jnp.max(valid.reshape(B, V, R), axis=1)
        rgb = rgb * valid_any[..., None] + (1.0 - valid_any[..., None])

        out['rgb'] = rgb.reshape(B, 1, R, 3)
        out['depth_ray'] = depth_ray
        out['valid_mask'] = valid_any[..., None]
        out['at_wt'] = at_wt                               # (B, V, R, P)
        out['at_wt_max'] = jnp.argmax(
            at_wt.transpose(0, 2, 1, 3).reshape(B, R, V * P), axis=-1)
        out['pixel_val'] = pixel_val.reshape(B, V, R, P, 2)
        out['coords'] = coords9
        out['uv'] = qry['uv']
        out['z'] = z
        return out

    # ------------------------------------------------------------------
    def _attend(self, query_embed: Array, key_embed: Array,
                values: Array) -> tuple[Array, Array]:
        """Joint (view, sample) softmax attention -> (z_sum (B,R,C), at_wt).

        Dispatches to the fused Pallas kernel or the jnp reference."""
        from cross_attention_renderer_tpu.ops.epipolar_attention import (
            epipolar_attention, epipolar_attention_reference)
        use_fused = self.fused_attention
        if use_fused is None:
            use_fused = (jax.default_backend() in ('tpu', 'axon')
                         and not self.is_initializing())
        fn = (epipolar_attention if use_fused
              else epipolar_attention_reference)
        return fn(query_embed, key_embed, values)

    def _use_sorted_stream(self, B: int, V: int, R: int, P: int) -> bool:
        """Static (trace-time) choice of the gather strategy.

        Auto mode currently resolves to False: with the tightened take
        epilogue (ops/grid_sample.py) the standard path measures 179 ms per
        8192-ray block vs 249 ms for the sorted path at flagship shapes —
        the sort/unsort permutes cost more than the windowed kernels save
        (BENCH_NOTES.md round 2). Explicit ``sorted_stream=True`` opts in.
        """
        if self.sorted_stream is not None:
            return self.sorted_stream
        return False

    def _use_fused_epilogue(self) -> bool:
        """Static choice of the fused Pallas exchange epilogue (TPU only).

        Default ON on TPU — it is the production hot path; the op itself
        falls back to its jnp reference when block shapes don't divide.
        ``fused_epilogue=False`` (the trainer's clone) or
        ``CAR_FUSED_EPILOGUE=0`` force the unfused SplitDense path."""
        import os
        if self.fused_epilogue is not None:
            return self.fused_epilogue and not self.is_initializing()
        if os.environ.get('CAR_FUSED_EPILOGUE', '1').lower() in ('0',
                                                                 'false'):
            return False
        return (jax.default_backend() in ('tpu', 'axon')
                and not self.is_initializing())

    def _use_fused_render(self, R: int) -> bool:
        """Static choice of the fully-fused render core (TPU only).

        Requires the repeat-attention wiring or plain round-1 (both
        supported) and a ray count divisible by the kernel's ray block.
        ``CAR_FUSED_RENDER=0`` forces the staged (epilogue + XLA
        attention) path."""
        import os
        from cross_attention_renderer_tpu.ops import fused_render as FR
        if os.environ.get('CAR_FUSED_RENDER', '0').lower() in ('', '0',
                                                               'false'):
            return False
        return (jax.default_backend() in ('tpu', 'axon')
                and not self.is_initializing()
                and R % FR.RAY_BLOCK == 0)

    def _stacked_takes(self, zp: tuple, pixel_val: Array, pt_views: Array,
                       ctx_c2w: Array, ctx_intr: Array, H: int, W: int):
        """Address math + ONE stacked row-take per level for both streams.

        Returns (vals_b: per-level (2M, 4C) [self rows | cross rows],
        aux_self, aux_cross: (M, 16) model dtype). See
        :meth:`_fused_exchange_v2` for why the streams stack."""
        from cross_attention_renderer_tpu.ops.grid_sample import (
            cell_rows_and_slot_weights)
        B, V, R, P, _ = pt_views.shape
        M = B * V * R * P

        pt_in = self._exchange_points(pt_views, ctx_c2w)   # (B,K,V,R,P,3)
        pt_self = jnp.stack([pt_in[:, v, v] for v in range(2)], axis=1)
        pt_cross = jnp.stack([pt_in[:, 1 - v, v] for v in range(2)], axis=1)
        # Cross stream, indexed by the RAY's view v: project with frame
        # (1-v)'s intrinsics and sample view (1-v)'s maps (equivalent to
        # _latent_exchange_parts' k = 1-v ordering).
        intr_sw = ctx_intr[:, ::-1]
        proj = G.project_pinhole(pt_cross.reshape(B, V, R * P, 3), intr_sw)
        pix_cross = G.pixel_to_ndc(proj[..., :2], H, W)    # (B, V, R*P, 2)

        coords_self = pixel_val.reshape(B * V, R * P, 2)
        coords_cross = pix_cross.reshape(B * V, R * P, 2)
        # image row (b, v) of the coords arrays samples image (b, 1-v)
        row = jax.lax.broadcasted_iota(jnp.int32, (B * V, R * P), 0)
        xid = row ^ 1                                      # V == 2

        vals_b, w_s, w_c = [], [], []
        for packed in zp:
            Hl, Wl, C4 = packed.shape[1:4]
            flat = packed.reshape(-1, C4)
            cs, ws = cell_rows_and_slot_weights(
                (Hl, Wl), coords_self, 'border')
            cc, wc = cell_rows_and_slot_weights(
                (Hl, Wl), coords_cross, 'zeros', image_id=xid)
            # ONE take per level for BOTH streams: each packed table has a
            # single gather use, so XLA's memory-space assignment prefetches
            # it to VMEM even inside a while loop (with two uses per table
            # it VMEM-placed only one, leaving the other a ~5x slower
            # HBM-random take — measured 21 vs 4 ms on the 128² level in
            # the scan renderer). The epilogue kernel reads the stacked
            # halves via block-index offsets, so they are never split
            # (splitting costs a 4 GB copy per level).
            vals_b.append(jnp.take(
                flat,
                jnp.concatenate([cs.reshape(-1), cc.reshape(-1)]),
                axis=0, mode='clip'))
            w_s.append(ws.reshape(M, 4))
            w_c.append(wc.reshape(M, 4))

        # aux rides in the model dtype: the kernel casts slot weights to it
        # anyway, and halving the (M, 16) arrays halves their layout copy
        # (~1.6 ms/block at flagship shapes). Only tanh(pt/5) loses f32
        # storage — bounded in [-1, 1], it feeds 3 of 579 hidden rows.
        adt = self.dtype
        pad = jnp.zeros((M, 1), adt)
        t_self = jnp.tanh(
            jax.lax.stop_gradient(pt_self).reshape(M, 3) / 5.0).astype(adt)
        t_cross = jnp.tanh(pt_cross.reshape(M, 3) / 5.0).astype(adt)
        w_s = [w.astype(adt) for w in w_s]
        w_c = [w.astype(adt) for w in w_c]
        aux_self = jnp.concatenate(w_s + [t_self, pad], axis=-1)
        aux_cross = jnp.concatenate(w_c + [t_cross, pad], axis=-1)
        return tuple(vals_b), aux_self, aux_cross

    def _fused_exchange_v2(self, zp: tuple, pixel_val: Array,
                           pt_views: Array, ctx_c2w: Array, ctx_intr: Array,
                           H: int, W: int) -> tuple[Array, Array]:
        """V=2 exchange through the fused gather epilogue.

        Same math as the unfused branch (grid_sample_pyramid_packed +
        :meth:`_latent_exchange_parts` + ``latent_value`` / ``key_map`` /
        ``key_map_2``; reference models.py:278-346,491,529): XLA performs
        only the address math and the row-takes; one Pallas kernel does the
        bilinear combine, both fuse-MLP streams, the per-view channel
        ordering, and the attention input projections without touching HBM
        in between. Returns (joint_latent, key_val) as (B, V, R, P, ·).
        """
        from cross_attention_renderer_tpu.ops.gather_epilogue import (
            fused_exchange_epilogue)
        B, V, R, P, _ = pt_views.shape
        ld = self.latent_dim
        vals_b, aux_self, aux_cross = self._stacked_takes(
            zp, pixel_val, pt_views, ctx_c2w, ctx_intr, H, W)

        params = (self.query_encode_latent.kernel,
                  self.query_encode_latent.bias,
                  self.query_encode_latent_2.kernel,
                  self.query_encode_latent_2.bias,
                  self.latent_value.kernel, self.latent_value.bias,
                  self.key_map.kernel, self.key_map.bias,
                  self.key_map_2.kernel, self.key_map_2.bias)
        params = jax.tree.map(lambda a: a.astype(self.dtype), params)
        jl, kv = fused_exchange_epilogue(
            vals_b, aux_self, aux_cross, params, R * P)
        return (jl.reshape(B, V, R, P, ld),
                kv.reshape(B, V, R, P, HIDDEN_DIM))

    def _fused_exchange_multi(self, zp: tuple, pixel_val: Array,
                              pt_views: Array, ctx_c2w: Array,
                              ctx_intr: Array, H: int,
                              W: int) -> tuple[Array, Array]:
        """V>=3 exchange through the multi-stream fused epilogue.

        Same math as grid_sample_pyramid + :meth:`_latent_exchange` (the
        default non-swap wiring) + ``latent_value`` / ``key_map`` /
        ``key_map_2`` (reference models.py:345-475,491,529): XLA does the
        address math and ONE packed-cell row-take per level for all V
        streams; the Pallas kernel does the combines, the V fuse-MLP
        streams, and the attention input projections. Stream j holds, for
        every view v, its j-th other view in ascending frame order, so the
        kernel's fixed [self, cross_0, ...] assembly equals the
        reference's [self] + ascending-k concat. Cross points are
        gradient-stopped (models.py:431-433)."""
        from cross_attention_renderer_tpu.ops.gather_epilogue import (
            fused_exchange_epilogue_multi)
        from cross_attention_renderer_tpu.ops.grid_sample import (
            cell_rows_and_slot_weights)
        B, V, R, P, _ = pt_views.shape
        M = B * V * R * P
        ld = self.latent_dim
        pt_in = self._exchange_points(pt_views, ctx_c2w)   # (B,K,V,R,P,3)
        others = [[k for k in range(V) if k != v] for v in range(V)]

        # stream 0 = self (border padding, own image, no detach at V>=3)
        pt_self = jnp.stack([pt_in[:, v, v] for v in range(V)], axis=1)
        streams = [(pixel_val.reshape(B * V, R * P, 2), None, 'border',
                    pt_self)]
        for j in range(V - 1):
            k_of = jnp.asarray([others[v][j] for v in range(V)], jnp.int32)
            pt_j = jnp.stack(
                [pt_in[:, others[v][j], v] for v in range(V)], axis=1)
            intr_j = jnp.stack(
                [ctx_intr[:, others[v][j]] for v in range(V)], axis=1)
            proj = G.project_pinhole(pt_j.reshape(B, V, R * P, 3), intr_j)
            pix = G.pixel_to_ndc(proj[..., :2], H, W)
            row = jax.lax.broadcasted_iota(jnp.int32, (B * V, R * P), 0)
            xid = (row // V) * V + k_of[row % V]
            streams.append((pix.reshape(B * V, R * P, 2), xid, 'zeros',
                            jax.lax.stop_gradient(pt_j)))

        vals, aux_list = [], []
        per_stream = []
        for coords, xid, mode, pt in streams:
            cells, weights = [], []
            for packed in zp:
                Hl, Wl = packed.shape[1:3]
                c, w = cell_rows_and_slot_weights((Hl, Wl), coords, mode,
                                                  image_id=xid)
                cells.append(c.reshape(-1))
                weights.append(w.reshape(M, 4))
            per_stream.append((cells, weights, pt))

        adt = self.dtype
        pad = jnp.zeros((M, 1), adt)
        for cells, weights, pt in per_stream:
            t = jnp.tanh(pt.reshape(M, 3) / 5.0).astype(adt)
            aux_list.append(jnp.concatenate(
                [w.astype(adt) for w in weights] + [t, pad], axis=-1))
        for l, packed in enumerate(zp):
            flat = packed.reshape(-1, packed.shape[-1])
            idx = jnp.concatenate([s[0][l] for s in per_stream])
            vals.append(jnp.take(flat, idx, axis=0, mode='clip'))

        params = (self.query_encode_latent.kernel,
                  self.query_encode_latent.bias,
                  self.query_encode_latent_2.kernel,
                  self.query_encode_latent_2.bias,
                  self.latent_value.kernel, self.latent_value.bias,
                  self.key_map.kernel, self.key_map.bias,
                  self.key_map_2.kernel, self.key_map_2.bias)
        params = jax.tree.map(lambda a: a.astype(self.dtype), params)
        jl, kv = fused_exchange_epilogue_multi(
            tuple(vals), tuple(aux_list), params)
        return (jl.reshape(B, V, R, P, ld),
                kv.reshape(B, V, R, P, HIDDEN_DIM))

    def _fused_render_v2(self, zp: tuple, pixel_val: Array,
                         pt_views: Array, ctx_c2w: Array, ctx_intr: Array,
                         H: int, W: int, local_coords: Array
                         ) -> tuple[Array, Array]:
        """V=2 takes -> exchange -> both attention rounds, one kernel.

        Everything :meth:`_fused_exchange_v2` fuses PLUS the query-embed
        MLP, the round-1 joint (view, sample) softmax and, when
        ``repeat_attention``, the encode_latent / repeat-query MLPs and
        the round-2 attention (reference models.py:278-565) — per-sample
        latents never touch HBM. Returns (z_final (B, R, ld),
        at_wt (B, V, R, P))."""
        from cross_attention_renderer_tpu.ops.fused_render import (
            fused_render_core)
        B, V, R, P, _ = pt_views.shape
        M = B * V * R * P
        vals_b, aux_self, aux_cross = self._stacked_takes(
            zp, pixel_val, pt_views, ctx_c2w, ctx_intr, H, W)
        channels = tuple(v.shape[-1] // 4 for v in vals_b)

        ld = self.latent_dim
        if self.repeat_attention:
            round2 = (self.encode_latent.kernel, self.encode_latent.bias,
                      self.query_repeat_embed.kernel,
                      self.query_repeat_embed.bias,
                      self.query_repeat_embed_2.kernel,
                      self.query_repeat_embed_2.bias)
        else:
            # round-2 modules are never initialized without repeat
            # attention; the kernel ignores these operands.
            round2 = (jnp.zeros((ld, HIDDEN_DIM)), jnp.zeros((HIDDEN_DIM,)),
                      jnp.zeros((HIDDEN_DIM + QUERY_FEAT_DIM, HIDDEN_DIM)),
                      jnp.zeros((HIDDEN_DIM,)),
                      jnp.zeros((HIDDEN_DIM, HIDDEN_DIM)),
                      jnp.zeros((HIDDEN_DIM,)))
        params = (self.query_encode_latent.kernel,
                  self.query_encode_latent.bias,
                  self.query_encode_latent_2.kernel,
                  self.query_encode_latent_2.bias,
                  self.latent_value.kernel, self.latent_value.bias,
                  self.key_map.kernel, self.key_map.bias,
                  self.key_map_2.kernel, self.key_map_2.bias,
                  self.query_embed.kernel, self.query_embed.bias,
                  self.query_embed_2.kernel, self.query_embed_2.bias,
                  *round2)
        params = jax.tree.map(lambda a: a.astype(self.dtype), params)
        lc = local_coords.reshape(M, QUERY_FEAT_DIM).astype(self.dtype)
        z_final, at_wt = fused_render_core(
            vals_b, aux_self, aux_cross, lc, params, channels, B, R, P,
            bool(self.repeat_attention))
        return z_final, at_wt

    def _fuse_latent(self, feats, points: Array, detach: bool) -> Array:
        """Shared 2-layer exchange encoder (models.py:335-346).

        ``feats`` may be a single array or a tuple of channel segments
        (e.g. per-pyramid-level gathers); all segments plus tanh(pt/5)
        feed one SplitDense, so neither the pyramid concat nor the
        579-channel concatenation is ever materialized. On TPU the whole
        chain runs as one Pallas kernel (ops/experimental/fused_mlp.py) — the hidden
        relu activation never touches HBM."""
        if detach:
            points = jax.lax.stop_gradient(points)
        parts = feats if isinstance(feats, tuple) else (feats,)
        t = jnp.tanh(points / 5.0).astype(parts[0].dtype)
        qel, qel2 = self.query_encode_latent, self.query_encode_latent_2
        # The Pallas fused chain measured SLOWER than XLA's dot chain at
        # flagship shapes (106 vs 99 ms/block) — per-grid-step sequencing
        # eats the saved relu materialization. Env opt-in for re-testing.
        import os
        use_fused = (os.environ.get('CAR_FUSED_MLP', '').lower()
                     not in ('', '0', 'false')
                     and jax.default_backend() in ('tpu', 'axon'))
        if use_fused and len(parts) == 1 and not self.is_initializing():
            from cross_attention_renderer_tpu.ops.experimental.fused_mlp import (
                fused_mlp2)
            x1 = parts[0]
            lead = x1.shape[:-1]
            c1 = x1.shape[-1]
            out = fused_mlp2(
                x1.reshape(-1, c1).astype(self.dtype),
                t.reshape(-1, t.shape[-1]),
                qel.kernel[:c1], qel.kernel[c1:], qel.bias,
                qel2.kernel, qel2.bias)
            return out.reshape(lead + (out.shape[-1],))
        h = nn.relu(qel(*parts, t))
        return qel2(h)

    def _latent_exchange_parts(self, zp: tuple, interp_val: Array,
                               pt_views: Array, ctx_c2w: Array,
                               ctx_intr: Array, H: int,
                               W: int) -> tuple[Array, Array]:
        """V=2 exchange, pre-concat: returns (fuse_self, fuse_cross), each
        (B, V, R, P, ld). Same math as :meth:`_latent_exchange`; the caller
        assembles [self, cross] / [cross, self] via kernel slicing.
        ``zp`` is the pre-packed pyramid (ops.pack_pyramid)."""
        from cross_attention_renderer_tpu.ops import (
            grid_sample_pyramid_packed)
        B, V, R, P, C = interp_val.shape
        pt_in = self._exchange_points(pt_views, ctx_c2w)   # (B,K,V,R,P,3)
        pt_cross = jnp.stack([pt_in[:, k, 1 - k] for k in range(2)],
                             axis=1)                       # (B,K,R,P,3)
        proj = G.project_pinhole(
            pt_cross.reshape(B, V, R * P, 3), ctx_intr)
        pix = G.pixel_to_ndc(proj[..., :2], H, W)
        gathered = grid_sample_pyramid_packed(
            zp, pix.reshape(B * V, R * P, 2),
            'zeros').reshape(B, V, R, P, C)
        fs = jnp.stack(
            [self._fuse_latent(interp_val[:, v], pt_in[:, v, v], True)
             for v in range(2)], axis=1)
        fc = jnp.stack(
            [self._fuse_latent(gathered[:, 1 - v], pt_in[:, 1 - v, v],
                               False) for v in range(2)], axis=1)
        return fs, fc

    def _exchange_points(self, pt_views: Array, ctx_c2w: Array) -> Array:
        """pt_in[k, v]: view-v samples expressed in every frame k."""
        inv = jnp.linalg.inv(ctx_c2w)
        rel = jnp.einsum('bkij,bvjl->bkvil', inv, ctx_c2w,
                         precision=jax.lax.Precision.HIGHEST)  # (B,K,V,4,4)
        pt_in = G.transform_points(
            pt_views[:, None], rel[:, :, :, None, None])   # (B,K,V,R,P,3)
        return jnp.where(jnp.isfinite(pt_in), pt_in, 0.0)

    def _exchange_concat(self, self_nat: Array, cross_fn, V: int,
                         swap: bool) -> Array:
        """Per-view channel assembly shared by both exchange paths.

        Channel order mirrors the reference: ascending view index at V=2
        (models.py:335,342), self-first at V>=3 (models.py:446,459,473);
        under ``swap`` (reference compat) V>=3 interleaves (channel, slot)
        like cat(dim=2).flatten(1,2) (models.py:443-446).
        """
        per_view = []
        for v in range(V):
            self_part = self_nat[:, v]
            cross_parts = [cross_fn(k, v) for k in range(V) if k != v]
            if V == 2:
                parts = ([self_part, cross_parts[0]] if v == 0
                         else [cross_parts[0], self_part])
            else:
                parts = [self_part] + cross_parts
            if swap:
                iv = jnp.stack(parts, axis=-1)
                per_view.append(iv.reshape(iv.shape[:-2] + (-1,)))
            else:
                per_view.append(jnp.concatenate(parts, axis=-1))
        return jnp.stack(per_view, axis=1)                 # (B,V,R,P,ld*V)

    def _sorted_exchange_v2(self, z: tuple, pixel_val: Array,
                            pt_views: Array, ctx_c2w: Array,
                            ctx_intr: Array, H: int,
                            W: int) -> tuple[Array, Array]:
        """Single-sort exchange + attention-input projections for V == 2.

        Same math as grid_sample_pyramid + :meth:`_latent_exchange` +
        ``latent_value``/``key_map`` (models.py:278-346,491,529), permuted:

          * ONE argsort (by self-sample image row) orders the stream; the
            cross gather reuses that order with ``image_id ^ 1`` — element
            (v, r, p)'s cross pair reads the OTHER view's map at the
            projection of the same 3D point, which lies on the matching
            epipolar line, so window coherence survives.
          * all narrow per-sample payloads (cross ndc, self/cross 3D
            points) ride ONE packed (M, 8) permute instead of three.
          * the fuse MLP, the per-view channel assembly (a branchless
            select on the element's view id), and the ``latent_value`` /
            ``key_map`` projections all run in sorted order; a single
            (M, ld + 128) un-permute restores ray order.

        Returns (joint_latent, key_val), each (B, V, R, P, ·).
        """
        from cross_attention_renderer_tpu.ops.sorted_gather import (
            grid_sample_sorted, sort_stream, unsort)
        B, V, R, P, _ = pt_views.shape
        M = B * V * R * P
        ld = self.latent_dim
        key_hw = max(((f.shape[1], f.shape[2]) for f in z),
                     key=lambda s: s[0] * s[1])
        pt_in = self._exchange_points(pt_views, ctx_c2w)   # (B,K,V,R,P,3)

        # Element (v, r, p): self pair = (view-v features at its epipolar
        # sample, pt in frame v); cross pair = (frame-k features at the
        # projection of that sample's 3D point into k, pt in frame k),
        # k = other(v). Gradient stop on the self points (models.py:327-328).
        pt_self = jnp.stack([pt_in[:, v, v] for v in range(V)], axis=1)
        pt_cross = jnp.stack([pt_in[:, 1 - v, v] for v in range(V)], axis=1)
        # Projection uses frame k's intrinsics: swap the view axis of intr.
        intr_sw = ctx_intr[:, ::-1]
        proj = G.project_pinhole(
            pt_cross.reshape(B, V, R * P, 3), intr_sw)
        pix = G.pixel_to_ndc(proj[..., :2], H, W)          # (B,V,R*P,2)

        stream = sort_stream(pixel_val.reshape(B * V, R * P, 2), key_hw)
        payload = jnp.concatenate(
            [pix.reshape(M, 2), pt_self.reshape(M, 3),
             pt_cross.reshape(M, 3)], axis=-1)
        payload_s = jnp.take(payload, stream.perm, axis=0)
        pix_s = payload_s[:, 0:2]
        pt_self_s = payload_s[:, 2:5]
        pt_cross_s = payload_s[:, 5:8]
        cross_id = stream.image_id ^ 1                     # other view, V=2

        with jax.named_scope('self_gather'):
            feat_self = jnp.concatenate(
                [grid_sample_sorted(fm, stream.coords, stream.image_id,
                                    'border') for fm in z], axis=-1)
        with jax.named_scope('cross_gather'):
            feat_cross = jnp.concatenate(
                [grid_sample_sorted(fm, pix_s, cross_id, 'zeros')
                 for fm in z], axis=-1)

        fuse_self = self._fuse_latent(feat_self, pt_self_s, detach=True)
        fuse_cross = self._fuse_latent(feat_cross, pt_cross_s, detach=False)

        # Channel order (models.py:335,342): view 0 -> [self, cross],
        # view 1 -> [cross, self]; select per element on its view id.
        a = jnp.concatenate([fuse_self, fuse_cross], axis=-1)
        b = jnp.concatenate([fuse_cross, fuse_self], axis=-1)
        interp_s = jnp.where((stream.image_id % 2 == 0)[:, None], a, b)

        joint_latent_s = self.latent_value(interp_s)       # (M, ld)
        key_val_s = _mlp2(interp_s, self.key_map, self.key_map_2)
        both = unsort(jnp.concatenate([joint_latent_s, key_val_s], axis=-1),
                      stream)
        joint_latent = both[:, :ld].reshape(B, V, R, P, ld)
        key_val = both[:, ld:].reshape(B, V, R, P, HIDDEN_DIM)
        return joint_latent, key_val

    def _latent_exchange_sorted(self, z: tuple, pixel_val: Array,
                                pt_views: Array, ctx_c2w: Array,
                                ctx_intr: Array, H: int, W: int) -> Array:
        """Sorted-stream epipolar gather + cross-view exchange.

        Same math as grid_sample_pyramid + :meth:`_latent_exchange`, but
        both pyramid gathers run on row-sorted sample streams through the
        Pallas windowed kernel (ops/sorted_gather.py): XLA's scattered
        row-take reaches <10% of HBM bandwidth at these sizes, while a
        4 ms argsort makes each 2048-sample block touch a tiny contiguous
        table window. The fuse MLP runs in sorted order too, so only the
        fused (M, ld) streams pay the un-permute."""
        from cross_attention_renderer_tpu.ops.sorted_gather import (
            grid_sample_pyramid_sorted, sort_stream, unsort)
        B, V, R, P, _ = pt_views.shape
        M = B * V * R * P
        key_hw = max(((f.shape[1], f.shape[2]) for f in z),
                     key=lambda s: s[0] * s[1])
        pt_in = self._exchange_points(pt_views, ctx_c2w)
        others = [[v for v in range(V) if v != k] for k in range(V)]
        swap = self.reference_exchange_compat and V >= 3

        with jax.named_scope('epipolar_stream'):
            stream1 = sort_stream(pixel_val.reshape(B * V, R * P, 2),
                                  key_hw)
            feat_s = grid_sample_pyramid_sorted(z, stream1, 'border')
            pt_self = jnp.stack([pt_in[:, v, v] for v in range(V)], axis=1)
            pt_self_s = jnp.take(pt_self.reshape(M, 3), stream1.perm,
                                 axis=0)
            fuse_self = unsort(
                self._fuse_latent(feat_s, pt_self_s, detach=V == 2),
                stream1).reshape(B, V, R, P, -1)

        with jax.named_scope('exchange_stream'):
            if swap:
                pt_cross = jnp.stack(
                    [pt_in[:, others[k], k] for k in range(V)], axis=1)
            else:
                pt_cross = jnp.stack(
                    [pt_in[:, k, others[k]] for k in range(V)], axis=1)
            M2 = B * V * (V - 1) * R * P
            proj = G.project_pinhole(
                pt_cross.reshape(B, V, (V - 1) * R * P, 3), ctx_intr)
            pix = G.pixel_to_ndc(proj[..., :2], H, W)
            stream2 = sort_stream(
                pix.reshape(B * V, (V - 1) * R * P, 2), key_hw)
            featx_s = grid_sample_pyramid_sorted(z, stream2, 'zeros')
            ptf_s = jnp.take(pt_cross.reshape(M2, 3), stream2.perm, axis=0)
            fuse_cross = unsort(
                self._fuse_latent(featx_s, ptf_s, detach=V >= 3),
                stream2).reshape(B, V, V - 1, R, P, -1)

        def cross_fn(k, v):
            return fuse_cross[:, k, others[k].index(v)]

        return self._exchange_concat(fuse_self, cross_fn, V, swap)

    def _latent_exchange(self, z: tuple, interp_val: Array, pt_views: Array,
                         ctx_c2w: Array, ctx_intr: Array,
                         H: int, W: int) -> Array:
        """Cross-view latent exchange for V in {2, 3} (models.py:281-475).

        For every epipolar sample of view i (a 3D point on the query ray,
        expressed in frame i), re-express the point in every other view j,
        project with view j's intrinsics, gather view j's features there
        (zero padding), and fuse each (features, tanh(pt/5)) pair through the
        shared 2-layer encoder. The fused per-view latents are concatenated
        channel-wise: [self, other views in ascending order].
        """
        B, V, R, P, C = interp_val.shape

        # pt_in[k, v] = samples of view v's geometry expressed in frame k.
        pt_in = self._exchange_points(pt_views, ctx_c2w)   # (B,K,V,R,P,3)

        # Project into frame k and gather view-k features there — only for
        # the cross pairs (k != v); the diagonal uses the epipolar gather
        # already in hand, so fetching it again would double (V=2) the most
        # expensive gather in the model.
        others = [[v for v in range(V) if v != k] for k in range(V)]
        swap = self.reference_exchange_compat and V >= 3
        if swap:
            # Reference V=3 wiring (models.py:384-393): frame k's map is
            # sampled at the projection of pt_in[v, k] (frame-v coordinates
            # of view-k rays' samples) rather than pt_in[k, v].
            pt_cross = jnp.stack(
                [pt_in[:, others[k], k] for k in range(V)], axis=1)
        else:
            pt_cross = jnp.stack(
                [pt_in[:, k, others[k]] for k in range(V)], axis=1
            )                                              # (B,K,V-1,R,P,3)
        proj = G.project_pinhole(
            pt_cross.reshape(B, V, (V - 1) * R * P, 3), ctx_intr)
        pix = G.pixel_to_ndc(proj[..., :2], H, W)
        gathered_x = grid_sample_pyramid(
            z, pix.reshape(B * V, (V - 1) * R * P, 2), 'zeros')
        gathered_x = gathered_x.reshape(B, V, V - 1, R, P, C)

        # For the rays of view v: self-features (the epipolar gather) fused
        # with pt in frame v; cross-features gathered[k, v] fused with
        # pt_in[k, v] for k != v. Gradient stops mirror the reference: at
        # V=2 the self-pair points are detached (models.py:327-328); at V=3
        # the cross-pair points are (models.py:431-433). The non-swap mode
        # deviates from the reference at V>=3 — see DEVIATIONS.md and the
        # comment on ``reference_exchange_compat``.
        self_nat = jnp.stack(
            [self._fuse_latent(interp_val[:, v], pt_in[:, v, v], V == 2)
             for v in range(V)], axis=1)

        def cross_fn(k, v):
            return self._fuse_latent(
                gathered_x[:, k, others[k].index(v)],
                pt_in[:, v, k] if swap else pt_in[:, k, v], V >= 3)

        return self._exchange_concat(self_nat, cross_fn, V, swap)
