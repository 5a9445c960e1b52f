"""Evaluation / rendering loops (the reference's eval + trajectory scripts).

Chunked full-image rendering with the encoder latent computed once per scene
(eval_realestate10k.py:136-161, render_realestate10k_traj.py:84-137), jitted
once per chunk shape.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu.utils.metrics import eval_image_metrics

Array = jax.Array


def make_chunk_renderer(model, params) -> tuple[Callable, Callable]:
    """Returns (encode_fn, render_chunk_fn(scene, z, uv) -> (rgb, valid)).

    Params are jit ARGUMENTS, not closure constants — closing over them bakes
    every weight into the HLO as literals (hundreds of MB of program)."""
    encode_jit = jax.jit(
        lambda p, s: model.apply(p, s, method='encode'))

    @jax.jit
    def render_jit(p, scene, z, uv):
        s = dict(scene)
        s['query'] = dict(scene['query'])
        s['query']['uv'] = uv
        out = model.apply(p, s, z=z)
        return out['rgb'], out['valid_mask']

    encode = lambda scene: encode_jit(params, scene)
    render_chunk = lambda scene, z, uv: render_jit(params, scene, z, uv)
    return encode, render_chunk


def render_full_image(render_chunk, scene, z, uv_full: Array,
                      n_chunks: int) -> tuple[Array, Array]:
    """Render all rays in ``n_chunks`` equal jitted chunks (cached z).

    Ref: eval protocol 9 chunks at 2 views / 18 at 3 views
    (eval_realestate10k.py:144-149). The chunk count must divide the ray
    count for static shapes; 65536 = 2^16 is divisible by the reference's
    ray-chunk sizes once rounded — we use the nearest power-of-two split.
    """
    n_rays = uv_full.shape[2]
    assert n_rays % n_chunks == 0, (n_rays, n_chunks)
    size = n_rays // n_chunks
    rgbs, valids = [], []
    for i in range(n_chunks):
        uv = uv_full[:, :, i * size:(i + 1) * size]
        rgb, valid = render_chunk(scene, z, uv)
        rgbs.append(rgb)
        valids.append(valid)
    return (jnp.concatenate(rgbs, axis=2),
            jnp.concatenate(valids, axis=1))


def make_scan_renderer(model, n_chunks: int) -> Callable:
    """Whole-image renderer with the chunk loop INSIDE the jit as a
    ``lax.scan`` — one device dispatch per image instead of one per chunk
    (host dispatch through the TPU tunnel costs ~20 ms each; the Python
    chunk loop spends ~0.7 s/frame on it at 8 chunks).

    Returns jitted ``fn(params, scene, z, uv_full) -> (rgb, valid)`` with
    ``uv_full`` of shape (B, Q, n_rays, 2), ``n_rays % n_chunks == 0``.
    Peak memory matches the per-chunk path: scan frees each iteration's
    temporaries. Ref: the Python chunk loops at eval_realestate10k.py:
    144-149 and render_realestate10k_traj.py:118-137; SURVEY.md §7.1
    prescribes exactly this scan.

    ``CAR_SCAN_UNROLL=k`` (k dividing n_chunks, default 1) processes k
    half-size sub-blocks per scan iteration as independent subgraphs —
    letting XLA's latency-hiding scheduler overlap sub-block i+1's
    epipolar takes (HBM DMA) with sub-block i's fused epilogue (compute),
    which a While-loop iteration boundary forbids. Outputs are identical;
    the per-sub-block HBM footprint shrinks by k so peak memory with two
    in flight matches the unrolled=1 peak.
    """
    import os

    from cross_attention_renderer_tpu.ops import pack_pyramid

    unroll = max(1, int(os.environ.get('CAR_SCAN_UNROLL', '1')))

    # The V>=2 multiview fused paths sample from packed cell tables; build
    # them ONCE per image outside the scan instead of per block (the table
    # is a 4x-size build the scan body would otherwise redo every iteration).
    uses_packed = (model.n_view >= 2 and not model.no_latent_concat
                   and not model.reference_exchange_compat
                   and not model._use_sorted_stream(1, 2, 8192, 64))

    @jax.jit
    def render_image(p, scene, z, uv_full):
        B, Q, n_rays, _ = uv_full.shape
        k = unroll if n_chunks % unroll == 0 else 1
        n_iter = n_chunks // k
        size = n_rays // n_chunks
        blocks = uv_full.reshape(B, Q, n_iter, k, size, 2)
        blocks = jnp.moveaxis(blocks, 2, 0)             # (NI, B, Q, k, S, 2)
        zp = pack_pyramid(tuple(z)) if uses_packed else None

        def render_block(uv):
            s = dict(scene)
            s['query'] = dict(scene['query'])
            s['query']['uv'] = uv
            out = model.apply(p, s, z=z, z_packed=zp)
            return out['rgb'], out['valid_mask']

        def body(_, uvk):
            outs = [render_block(uvk[:, :, i]) for i in range(k)]
            return None, (jnp.stack([o[0] for o in outs], 2),
                          jnp.stack([o[1] for o in outs], 1))

        _, (rgb, valid) = jax.lax.scan(body, None, blocks)
        # rgb (NI, B, Q, k, S, 3) -> (B, Q, n_rays, 3);
        # valid (NI, B, k, S, 1) -> (B, n_rays, 1)
        rgb = jnp.moveaxis(rgb, 0, 2).reshape(B, Q, n_rays, 3)
        valid = jnp.moveaxis(valid, 0, 1).reshape(B, n_rays, 1)
        return rgb, valid

    return render_image


def make_summary_renderer(model, n_chunks: int) -> Callable:
    """Full-image renderer that also returns the per-ray diagnostic fields
    the TB summaries consume (depth_ray, at_wt, pixel_val) — so the training
    val check covers a whole frame instead of a top-of-image ray strip.
    Same in-jit ``lax.scan`` as :func:`make_scan_renderer`.

    Returns jitted ``fn(params, scene, z, uv_full) -> model_out dict`` with
    entries shaped as one ``model.apply`` over all rays: rgb (B, 1, R, 3),
    valid_mask/depth_ray (B, R, 1), at_wt (B, V, R, P),
    pixel_val (B, V, R, P, 2).
    """
    from cross_attention_renderer_tpu.ops import pack_pyramid

    uses_packed = (model.n_view >= 2 and not model.no_latent_concat
                   and not model.reference_exchange_compat
                   and not model._use_sorted_stream(1, 2, 8192, 64))

    @jax.jit
    def render_image(p, scene, z, uv_full):
        B, Q, n_rays, _ = uv_full.shape
        size = n_rays // n_chunks
        blocks = uv_full.reshape(B, Q, n_chunks, size, 2)
        blocks = jnp.moveaxis(blocks, 2, 0)                # (NB, B, Q, S, 2)
        zp = pack_pyramid(tuple(z)) if uses_packed else None

        def body(_, uv):
            s = dict(scene)
            s['query'] = dict(scene['query'])
            s['query']['uv'] = uv
            out = model.apply(p, s, z=z, z_packed=zp)
            return None, (out['rgb'], out['valid_mask'], out['depth_ray'],
                          out['at_wt'], out['pixel_val'])

        _, (rgb, valid, depth, at_wt, pix) = jax.lax.scan(body, None, blocks)
        V, P = at_wt.shape[2], at_wt.shape[-1]
        return {
            'rgb': jnp.moveaxis(rgb, 0, 2).reshape(B, Q, n_rays, 3),
            'valid_mask': jnp.moveaxis(valid, 0, 1).reshape(B, n_rays, 1),
            'depth_ray': jnp.moveaxis(depth, 0, 1).reshape(B, n_rays, 1),
            'at_wt': jnp.moveaxis(at_wt, 0, 2).reshape(B, V, n_rays, P),
            'pixel_val': jnp.moveaxis(pix, 0, 2).reshape(B, V, n_rays, P, 2),
        }

    return render_image


def make_image_renderer(model, params, n_chunks: int,
                        pruned: Optional[tuple] = None,
                        narrow: Optional[tuple] = None,
                        q8: bool = False) -> tuple[Callable, Callable]:
    """(encode, render_image) pair over the in-jit scan loop.

    ``render_image(scene, z) -> (rgb, valid)`` renders the scene's full
    query uv grid in one device dispatch (see :func:`make_scan_renderer`);
    the CLI eval/trajectory loops use this instead of the Python chunk
    loop (one dispatch per chunk costs ~20 ms host RTT each through the
    TPU tunnel). ``pruned``/``narrow``/``q8`` switch to the fast-eval
    renderer (:func:`make_fast_renderer`)."""
    encode_jit = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    if pruned is not None or narrow is not None or q8:
        scan = make_fast_renderer(model, n_chunks, pruned=pruned,
                                  narrow=narrow, q8=q8)
    else:
        scan = make_scan_renderer(model, n_chunks)
    encode = lambda scene: encode_jit(params, scene)
    render_image = lambda scene, z: scan(params, scene, z,
                                         scene['query']['uv'])
    return encode, render_image


def resample_epipolar_t(at_wt: Array, n_fine: int,
                        floor: float = 0.1) -> Array:
    """Stratified inverse-CDF resampling of epipolar-segment positions.

    ``at_wt`` (B, V, R, Pc): round-1 joint (view, sample) attention weights
    from a coarse uniform pass. Treats each view's weights (renormalized,
    blended with a ``floor`` uniform mass so no segment region is ever
    abandoned) as a piecewise-constant pdf over the segment parameter
    t ∈ [0, 1] — bins centered on the coarse sample positions
    ``linspace(0, 1, Pc)`` — and places ``n_fine`` deterministic stratified
    samples (u = (k+0.5)/n_fine) by inverting the CDF. Returns
    (B, V, R, n_fine), sorted ascending along the last axis.

    This is NeRF-style hierarchical sampling driven by attention weights
    instead of density; the reference renderer has no counterpart (it is
    always uniform, models.py:231).
    """
    *lead, Pc = at_wt.shape
    w = at_wt.astype(jnp.float32)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-9)
    w = (1.0 - floor) * w + floor / Pc

    # Bin edges: [0, midpoints of the coarse grid, 1].
    t = jnp.linspace(0.0, 1.0, Pc, dtype=jnp.float32)
    edges = jnp.concatenate(
        [jnp.zeros((1,)), 0.5 * (t[:-1] + t[1:]), jnp.ones((1,))])  # (Pc+1,)

    # Bin probability = weight (a density at the bin center) x bin width:
    # uniform weights must mean uniform-in-t sampling even though the end
    # bins are half-width. Exact renormalization also absorbs degenerate
    # inputs (an all-masked view's weights are ~0 -> pure uniform floor).
    w = w * (edges[1:] - edges[:-1]) * Pc
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)

    cdf = jnp.cumsum(w, axis=-1)
    cdf = jnp.concatenate(
        [jnp.zeros((*lead, 1), jnp.float32), cdf], axis=-1)  # (..., Pc+1)

    u = (jnp.arange(n_fine, dtype=jnp.float32) + 0.5) / n_fine
    # Bin index per stratum: #\{j : cdf_j <= u_k\} - 1. Pc is small (<=32),
    # so the dense comparison beats a searchsorted lowering on TPU.
    below = jnp.sum((cdf[..., :, None] <= u).astype(jnp.int32),
                    axis=-2) - 1                            # (..., n_fine)
    below = jnp.clip(below, 0, Pc - 1)

    c0 = jnp.take_along_axis(cdf, below, axis=-1)
    c1 = jnp.take_along_axis(cdf, below + 1, axis=-1)
    e0 = edges[below]
    e1 = edges[below + 1]
    frac = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
    return e0 + frac * (e1 - e0)


def make_pruned_renderer(model, n_chunks: int, n_coarse: int = 16,
                         n_fine: int = 24, floor: float = 0.1) -> Callable:
    """Coarse-to-fine whole-image renderer (the documented fast-eval mode).

    Two passes per ray block inside one jitted ``lax.scan``: a cheap
    uniform pass at ``n_coarse`` samples with round-2 attention disabled
    scores the segment via the round-1 attention weights; the full model
    then runs at ``n_fine`` attention-guided samples
    (:func:`resample_epipolar_t`). Epipolar HBM traffic — the measured
    bottleneck of the uniform path (BENCH_NOTES.md roofline) — scales with
    (n_coarse + n_fine) / npoints, e.g. 16+24 vs 64 ≈ 0.63× the bytes.

    Outputs CHANGE relative to the uniform-64 protocol (this is sample
    pruning, not a reformulation), so this renderer is opt-in for eval and
    trajectory rendering only; parity-protocol evals keep the uniform path.
    Same signature as :func:`make_scan_renderer`.
    """
    from cross_attention_renderer_tpu.ops import pack_pyramid

    coarse_model = model.clone(repeat_attention=False)
    uses_packed = (model.n_view >= 2 and not model.no_latent_concat
                   and not model.reference_exchange_compat
                   and not model._use_sorted_stream(1, 2, 8192, 64))

    @jax.jit
    def render_image(p, scene, z, uv_full):
        B, Q, n_rays, _ = uv_full.shape
        V = scene['context']['rgb'].shape[1]
        size = n_rays // n_chunks
        blocks = uv_full.reshape(B, Q, n_chunks, size, 2)
        blocks = jnp.moveaxis(blocks, 2, 0)                # (NB, B, Q, S, 2)
        zp = pack_pyramid(tuple(z)) if uses_packed else None

        t_coarse = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_coarse, dtype=jnp.float32),
            (B, V, size, n_coarse))

        def body(_, uv):
            s = dict(scene)
            s['query'] = dict(scene['query'])
            s['query']['uv'] = uv
            coarse = coarse_model.apply(p, s, z=z, z_packed=zp,
                                        t_vals=t_coarse)
            t_fine = resample_epipolar_t(coarse['at_wt'], n_fine, floor)
            out = model.apply(p, s, z=z, z_packed=zp,
                              t_vals=jax.lax.stop_gradient(t_fine))
            return None, (out['rgb'], out['valid_mask'])

        _, (rgb, valid) = jax.lax.scan(body, None, blocks)
        rgb = jnp.moveaxis(rgb, 0, 2).reshape(B, Q, n_rays, 3)
        valid = jnp.moveaxis(valid, 0, 1).reshape(B, n_rays, 1)
        return rgb, valid

    return render_image


def narrow_pyramid(params: dict, z: tuple, widths: tuple,
                   ) -> tuple[tuple, dict]:
    """Per-scene PCA narrowing of the encoder pyramid (fast-eval lever 2).

    The gathered features on the multiview path are consumed ONLY by the
    fuse layer (``query_encode_latent``), and both the bilinear gather and
    that layer's first matmul are linear — so projecting each level onto
    its top-k (uncentered) principal components and folding the basis into
    the fuse kernel's feature rows leaves the rest of the model untouched:

        fuse_W1^T x  ≈  fuse_W1^T (P^T P x)  =  (P fuse_W1)^T (P x)

    Returns (narrow z levels, params with the folded fuse kernel) for a
    ``model.clone(narrow_features=widths)`` instance. Epipolar HBM traffic
    (the measured bottleneck, BENCH_NOTES.md roofline) scales with
    sum(widths)/base_latent_dim — (128, 128, 64) is 0.56x the bytes of the
    flagship (256, 256, 64). The approximation error is the PCA truncation
    of THIS scene's features; levels with ``k >= C`` pass through exactly.
    """
    bases = []
    z_n = []
    for z_l, k in zip(z, widths):
        C = z_l.shape[-1]
        if k >= C:
            bases.append(None)
            z_n.append(z_l)
            continue
        X = z_l.reshape(-1, C).astype(jnp.float32)
        cov = jnp.matmul(X.T, X, precision=jax.lax.Precision.HIGHEST)
        _, vecs = jnp.linalg.eigh(cov)                 # ascending eigvals
        P = vecs[:, ::-1][:, :k].T                     # (k, C), descending
        bases.append(P)
        z_n.append(jnp.einsum(
            '...c,kc->...k', X.reshape(z_l.shape), P,
            precision=jax.lax.Precision.HIGHEST).astype(z_l.dtype))

    kern = params['params']['query_encode_latent']['kernel']
    blocks = []
    off = 0
    for z_l, P in zip(z, bases):
        C = z_l.shape[-1]
        blk = jax.lax.slice_in_dim(kern, off, off + C, axis=0)
        if P is not None:
            blk = jnp.matmul(P.astype(jnp.float32),
                             blk.astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST
                             ).astype(kern.dtype)
        blocks.append(blk)
        off += C
    blocks.append(jax.lax.slice_in_dim(kern, off, kern.shape[0], axis=0))
    kern_n = jnp.concatenate(blocks, axis=0)

    p = dict(params)
    pp = dict(p['params'])
    qel = dict(pp['query_encode_latent'])
    qel['kernel'] = kern_n
    pp['query_encode_latent'] = qel
    p['params'] = pp
    return tuple(z_n), p


def quantize_pyramid(params: dict, z: tuple) -> tuple[tuple, dict]:
    """int8 quantization of the encoder pyramid (fast-eval lever 3).

    Per-channel symmetric scales (max-abs / 127 over the scene's images);
    like :func:`narrow_pyramid`, the dequant is FREE at render time — the
    bilinear combine is linear per channel, so ``diag(scale)`` folds into
    the fuse kernel's feature rows and the gathers move 1-byte rows (half
    the HBM bytes of bf16 tables, the measured bottleneck). Forward/eval
    only: the take consumers cast int8 -> model dtype in-kernel
    (ops/gather_epilogue.py, ops/fused_render.py) and no VJP is defined
    for int8 tables.
    """
    z_q, scales = [], []
    for z_l in z:
        x = z_l.astype(jnp.float32)
        s = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1))) / 127.0
        s = jnp.maximum(s, 1e-8)
        z_q.append(jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8))
        scales.append(s)

    kern = params['params']['query_encode_latent']['kernel']
    blocks = []
    off = 0
    for s in scales:
        C = s.shape[0]
        blk = jax.lax.slice_in_dim(kern, off, off + C, axis=0)
        blocks.append((blk.astype(jnp.float32) * s[:, None]
                       ).astype(kern.dtype))
        off += C
    blocks.append(jax.lax.slice_in_dim(kern, off, kern.shape[0], axis=0))
    kern_q = jnp.concatenate(blocks, axis=0)

    p = dict(params)
    pp = dict(p['params'])
    qel = dict(pp['query_encode_latent'])
    qel['kernel'] = kern_q
    pp['query_encode_latent'] = qel
    p['params'] = pp
    return tuple(z_q), p


def make_fast_renderer(model, n_chunks: int,
                       pruned: Optional[tuple] = None,
                       narrow: Optional[tuple] = None,
                       q8: bool = False) -> Callable:
    """Whole-image renderer composing the documented fast-eval levers.

    ``pruned=(C, F)`` — coarse-to-fine sample pruning;
    ``narrow=(k1, k2, k3)`` — per-scene PCA feature narrowing;
    ``q8`` — int8 gather tables. All three only change how much HBM the
    epipolar gathers move (the roofline bottleneck); outputs approximate
    the uniform full-width protocol, so this is opt-in for eval and
    trajectory rendering. Same signature as :func:`make_scan_renderer`.
    ``narrow``/``q8`` require the multiview path (V >= 2 with latent
    concat): the folds target the shared fuse layer
    (``query_encode_latent``), which is the features' only consumer on
    that path — at V=3 exactly as at V=2 (``_fuse_latent`` is shared by
    the self and every cross stream).
    """
    if (narrow is not None or q8) and (model.n_view < 2
                                       or model.no_latent_concat):
        raise ValueError('narrow/q8 rendering requires the multiview '
                         '(V >= 2, latent-concat) path')
    inner_model = (model.clone(narrow_features=tuple(narrow))
                   if narrow is not None else model)
    if pruned is not None:
        inner = make_pruned_renderer(inner_model, n_chunks, *pruned)
    else:
        inner = make_scan_renderer(inner_model, n_chunks)

    @jax.jit
    def render_image(params, scene, z, uv_full):
        z_c, params_c = tuple(z), params
        if narrow is not None:
            z_c, params_c = narrow_pyramid(params_c, z_c, tuple(narrow))
        if q8:
            z_c, params_c = quantize_pyramid(params_c, z_c)
        return inner(params_c, scene, z_c, uv_full)

    return render_image


def make_narrow_renderer(model, n_chunks: int,
                         widths: tuple = (128, 128, 64),
                         pruned: Optional[tuple] = None) -> Callable:
    """PCA-narrowed whole-image renderer; see :func:`make_fast_renderer`."""
    return make_fast_renderer(model, n_chunks, pruned=pruned,
                              narrow=tuple(widths))


def make_sharded_renderer(model, params, mesh) -> Callable:
    """Ray-sharded full-image renderer: rays split over the mesh's 'rays'
    axis (sequence parallelism — rays are independent until image assembly,
    SURVEY.md §2.2). Returns fn(scene, z, uv) -> (rgb, valid) with uv
    sharded over devices and outputs gathered.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def render(p, scene, z, uv):
        s = dict(scene)
        s['query'] = dict(scene['query'])
        s['query']['uv'] = uv
        out = model.apply(p, s, z=z)
        return out['rgb'], out['valid_mask']

    ray_sharding = NamedSharding(mesh, P(None, None, 'rays', None))

    def sharded(scene, z, uv):
        uv = jax.device_put(uv, ray_sharding)
        return render(params, scene, z, uv)

    return sharded


def evaluate_scene(model, params, scene, H: int = 256, W: int = 256,
                   n_chunks: int = 8,
                   lpips_fn: Optional[Callable] = None,
                   renderer=None) -> dict:
    """Full eval for one scene dict with full-image query uv.

    Returns numpy metrics + the rendered image, reference protocol
    (eval_realestate10k.py:131-199). ``renderer`` is an (encode,
    render_image) pair from :func:`make_image_renderer`."""
    if renderer is None:
        renderer = make_image_renderer(model, params, n_chunks)
    encode, render_image = renderer
    z = encode(scene)
    rgb, valid = render_image(scene, z)
    pred01 = (rgb.reshape(H, W, 3) + 1.0) * 0.5
    target01 = (scene['query']['rgb'].reshape(H, W, 3) + 1.0) * 0.5
    mask = valid.reshape(H, W, 1)
    metrics = eval_image_metrics(pred01, target01, mask)
    out = {k: np.asarray(v) for k, v in metrics.items()}
    if lpips_fn is not None:
        # lpips_distance is batched NHWC in [-1, 1]
        pred = (np.asarray(metrics['pred'])[None] - 0.5) * 2.0
        target = (np.asarray(metrics['target'])[None] - 0.5) * 2.0
        out['lpips'] = float(np.asarray(lpips_fn(pred, target))[0])
    return out
