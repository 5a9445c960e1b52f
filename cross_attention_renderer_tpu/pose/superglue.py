"""SuperGlue attentional matcher in JAX.

Functional re-implementation of the matcher the reference vendors
(``estimate_pose/superglue.py:179-285``): keypoint MLP encoder, 18 layers of
alternating self/cross attention (4 heads, 256-d), final projection,
log-space Sinkhorn optimal transport with a learned dustbin, mutual-check +
threshold. Redesigned for static shapes: the variable-length keypoint lists
become fixed-K slots with validity masks — invalid slots get ~zero transport
mass and are forced to the dustbin, and their matches are reported as -1.

Weights: the reference's ``superglue_indoor.pth`` blob is git-LFS-missing;
:func:`convert_weights` maps an upstream checkpoint; random init supported
for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DESC_DIM = 256
N_HEADS = 4
GNN_LAYERS = ('self', 'cross') * 9
KENC_LAYERS = (32, 64, 128, 256)
_NEG = -1e9


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------

def init_params(rng: np.random.Generator | int = 0) -> dict:
    rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
    p: dict = {'bin_score': np.float32(1.0)}

    def conv1d(name, cin, cout, bn):
        p[f'{name}_w'] = rng.normal(0, 1 / np.sqrt(cin),
                                    (cin, cout)).astype(np.float32)
        p[f'{name}_b'] = np.zeros(cout, np.float32)
        if bn:
            p[f'{name}_bn_scale'] = np.ones(cout, np.float32)
            p[f'{name}_bn_bias'] = np.zeros(cout, np.float32)
            p[f'{name}_bn_mean'] = np.zeros(cout, np.float32)
            p[f'{name}_bn_var'] = np.ones(cout, np.float32)

    dims = (3,) + KENC_LAYERS + (DESC_DIM,)
    for i in range(len(dims) - 1):
        conv1d(f'kenc_{i}', dims[i], dims[i + 1], bn=i < len(dims) - 2)
    for l in range(len(GNN_LAYERS)):
        for proj in ('q', 'k', 'v', 'merge'):
            conv1d(f'gnn{l}_{proj}', DESC_DIM, DESC_DIM, bn=False)
        mlp_dims = (2 * DESC_DIM, 2 * DESC_DIM, DESC_DIM)
        for i in range(2):
            conv1d(f'gnn{l}_mlp{i}', mlp_dims[i], mlp_dims[i + 1], bn=i < 1)
    conv1d('final_proj', DESC_DIM, DESC_DIM, bn=False)
    return p


def convert_weights(torch_state: dict) -> dict:
    """Map the upstream SuperGlue state_dict onto our layout."""
    out = {'bin_score': np.asarray(torch_state['bin_score'])}

    def put(name, prefix, bn_prefix=None):
        w = np.asarray(torch_state[f'{prefix}.weight'])  # (out,in,1)
        out[f'{name}_w'] = w[..., 0].T
        out[f'{name}_b'] = np.asarray(torch_state[f'{prefix}.bias'])
        if bn_prefix:
            for ours, theirs in [('scale', 'weight'), ('bias', 'bias'),
                                 ('mean', 'running_mean'),
                                 ('var', 'running_var')]:
                out[f'{name}_bn_{ours}'] = np.asarray(
                    torch_state[f'{bn_prefix}.{theirs}'])

    # keypoint encoder: encoder indices 0,(1 bn),3,(4 bn),6,(7 bn),9
    enc_ids = [0, 3, 6, 9]
    for i, eid in enumerate(enc_ids):
        bn = f'kenc.encoder.{eid + 1}' if i < len(enc_ids) - 1 else None
        put(f'kenc_{i}', f'kenc.encoder.{eid}', bn)
    for l in range(len(GNN_LAYERS)):
        base = f'gnn.layers.{l}.attn'
        for j, proj in enumerate(('q', 'k', 'v')):
            put(f'gnn{l}_{proj}', f'{base}.proj.{j}')
        put(f'gnn{l}_merge', f'{base}.merge')
        put(f'gnn{l}_mlp0', f'gnn.layers.{l}.mlp.0',
            f'gnn.layers.{l}.mlp.1')
        put(f'gnn{l}_mlp1', f'gnn.layers.{l}.mlp.3')
    put('final_proj', 'final_proj')
    return out


# --------------------------------------------------------------------------
# Layers
# --------------------------------------------------------------------------

def _linear(p, name, x, bn=False, relu=False):
    y = x @ jnp.asarray(p[f'{name}_w']) + jnp.asarray(p[f'{name}_b'])
    if bn:
        mean = jnp.asarray(p[f'{name}_bn_mean'])
        var = jnp.asarray(p[f'{name}_bn_var'])
        y = (y - mean) / jnp.sqrt(var + 1e-5)
        y = y * jnp.asarray(p[f'{name}_bn_scale']) + jnp.asarray(
            p[f'{name}_bn_bias'])
    return jax.nn.relu(y) if relu else y


def normalize_keypoints(kpts: Array, height: int, width: int) -> Array:
    """Ref: superglue.py:65-72."""
    size = jnp.asarray([width, height], kpts.dtype)
    center = size / 2
    scaling = size.max() * 0.7
    return (kpts - center) / scaling


def _kenc(p, kpts_norm, scores):
    x = jnp.concatenate([kpts_norm, scores[..., None]], axis=-1)
    n = len(KENC_LAYERS) + 1
    for i in range(n):
        x = _linear(p, f'kenc_{i}', x, bn=i < n - 1, relu=i < n - 1)
    return x


def _attention(p, l, x, source, src_valid):
    """4-head attention with invalid source slots masked out."""
    B, N, _ = x.shape
    M = source.shape[1]
    hd = DESC_DIM // N_HEADS
    q = _linear(p, f'gnn{l}_q', x).reshape(B, N, N_HEADS, hd)
    k = _linear(p, f'gnn{l}_k', source).reshape(B, M, N_HEADS, hd)
    v = _linear(p, f'gnn{l}_v', source).reshape(B, M, N_HEADS, hd)
    logits = jnp.einsum('bnhd,bmhd->bhnm', q, k) / jnp.sqrt(float(hd))
    logits = jnp.where(src_valid[:, None, None, :], logits, _NEG)
    prob = jax.nn.softmax(logits, axis=-1)
    msg = jnp.einsum('bhnm,bmhd->bnhd', prob, v).reshape(B, N, DESC_DIM)
    return _linear(p, f'gnn{l}_merge', msg)


def _gnn(p, desc0, desc1, valid0, valid1):
    for l, name in enumerate(GNN_LAYERS):
        if name == 'cross':
            src0, sv0 = desc1, valid1
            src1, sv1 = desc0, valid0
        else:
            src0, sv0 = desc0, valid0
            src1, sv1 = desc1, valid1
        m0 = _attention(p, l, desc0, src0, sv0)
        m1 = _attention(p, l, desc1, src1, sv1)

        def mlp(x, m):
            h = jnp.concatenate([x, m], axis=-1)
            h = _linear(p, f'gnn{l}_mlp0', h, bn=True, relu=True)
            return _linear(p, f'gnn{l}_mlp1', h)

        desc0 = desc0 + mlp(desc0, m0)
        desc1 = desc1 + mlp(desc1, m1)
    return desc0, desc1


def log_optimal_transport(scores: Array, alpha: Array, iters: int,
                          valid0: Array, valid1: Array) -> Array:
    """Masked log-space Sinkhorn with a dustbin row/col.

    Ref: superglue.py:143-172; invalid slots get ~zero marginal mass.
    """
    b, m, n = scores.shape
    bins0 = jnp.broadcast_to(alpha, (b, m, 1))
    bins1 = jnp.broadcast_to(alpha, (b, 1, n))
    alpha_c = jnp.broadcast_to(alpha, (b, 1, 1))
    couplings = jnp.concatenate([
        jnp.concatenate([scores, bins0], -1),
        jnp.concatenate([bins1, alpha_c], -1)], 1)

    m_eff = jnp.sum(valid0, -1)          # (b,)
    n_eff = jnp.sum(valid1, -1)
    norm = -jnp.log(m_eff + n_eff)       # (b,)
    log_mu = jnp.concatenate(
        [jnp.where(valid0, norm[:, None], _NEG),
         (jnp.log(n_eff) + norm)[:, None]], axis=1)
    log_nu = jnp.concatenate(
        [jnp.where(valid1, norm[:, None], _NEG),
         (jnp.log(m_eff) + norm)[:, None]], axis=1)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return (u, v)

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    return couplings + u[:, :, None] + v[:, None, :] - norm[:, None, None]


def superglue(params: dict, data: dict, sinkhorn_iterations: int = 100,
              match_threshold: float = 0.2) -> dict:
    """Match two keypoint sets.

    data keys: keypoints0/1 (B,K,2), scores0/1 (B,K), descriptors0/1
    (B,K,256), valid0/1 (B,K) bool, image_shape (H, W).
    """
    H, W = data['image_shape']
    v0, v1 = data['valid0'], data['valid1']
    k0 = normalize_keypoints(data['keypoints0'], H, W)
    k1 = normalize_keypoints(data['keypoints1'], H, W)
    d0 = data['descriptors0'] + _kenc(params, k0, data['scores0'])
    d1 = data['descriptors1'] + _kenc(params, k1, data['scores1'])
    d0, d1 = _gnn(params, d0, d1, v0, v1)
    m0 = _linear(params, 'final_proj', d0)
    m1 = _linear(params, 'final_proj', d1)
    scores = jnp.einsum('bnd,bmd->bnm', m0, m1) / DESC_DIM ** 0.5
    scores = jnp.where(v0[:, :, None] & v1[:, None, :], scores, _NEG)
    Z = log_optimal_transport(scores, jnp.asarray(params['bin_score']),
                              sinkhorn_iterations, v0, v1)

    inner = Z[:, :-1, :-1]
    idx0 = jnp.argmax(inner, axis=2)
    idx1 = jnp.argmax(inner, axis=1)
    max0 = jnp.max(inner, axis=2)
    ar0 = jnp.arange(inner.shape[1])[None]
    ar1 = jnp.arange(inner.shape[2])[None]
    mutual0 = ar0 == jnp.take_along_axis(idx1, idx0, axis=1)
    mutual1 = ar1 == jnp.take_along_axis(idx0, idx1, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1,
                         jnp.take_along_axis(mscores0, idx1, axis=1), 0.0)
    valid_match0 = mutual0 & (mscores0 > match_threshold) & v0
    valid_match1 = mutual1 & jnp.take_along_axis(
        valid_match0, idx1, axis=1) & v1
    matches0 = jnp.where(valid_match0, idx0, -1)
    matches1 = jnp.where(valid_match1, idx1, -1)
    return {'matches0': matches0, 'matches1': matches1,
            'matching_scores0': mscores0, 'matching_scores1': mscores1}
