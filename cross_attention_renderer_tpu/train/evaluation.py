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
    """
    from cross_attention_renderer_tpu.ops import pack_pyramid

    # The V=2 multiview path samples from packed cell tables; build them
    # ONCE per image outside the scan instead of per block (the table is a
    # 4x-size build the scan body would otherwise redo every iteration).
    uses_packed = (model.n_view == 2 and not model.no_latent_concat
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
            return None, (out['rgb'], out['valid_mask'])

        _, (rgb, valid) = jax.lax.scan(body, None, blocks)
        # (NB, B, Q, S, 3) -> (B, Q, n_rays, 3); valid (NB, B, S, 1)
        rgb = jnp.moveaxis(rgb, 0, 2).reshape(B, Q, n_rays, 3)
        valid = jnp.moveaxis(valid, 0, 1).reshape(B, n_rays, 1)
        return rgb, valid

    return render_image


def make_image_renderer(model, params, n_chunks: int
                        ) -> tuple[Callable, Callable]:
    """(encode, render_image) pair over the in-jit scan loop.

    ``render_image(scene, z) -> (rgb, valid)`` renders the scene's full
    query uv grid in one device dispatch (see :func:`make_scan_renderer`);
    the CLI eval/trajectory loops use this instead of the Python chunk
    loop (one dispatch per chunk costs ~20 ms host RTT each through the
    TPU tunnel)."""
    encode_jit = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    scan = make_scan_renderer(model, n_chunks)
    encode = lambda scene: encode_jit(params, scene)
    render_image = lambda scene, z: scan(params, scene, z,
                                         scene['query']['uv'])
    return encode, render_image


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
        out['lpips'] = float(np.asarray(lpips_fn(
            (metrics['pred'] - 0.5) * 2.0, (metrics['target'] - 0.5) * 2.0)))
    return out
