"""Unit tests for the fused V=2 exchange epilogue (ops/gather_epilogue.py).

The jnp reference is checked against an independent formulation of the same
math (bilinear combine + SplitDense chains, as the renderer's unfused path
writes it); the Pallas kernel is checked against the reference in interpret
mode; gradients flow through the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_attention_renderer_tpu.ops import gather_epilogue as GE

CHANNELS = (32, 32, 16)     # small stand-ins for (256, 256, 64)
F = sum(CHANNELS)
H1 = F                      # fuse hidden width (= base latent dim)
LD = F // 2                 # fuse output / latent dim
HID = 16                    # attention hidden
RP = 64                     # R * P per (b, v)
M = 4 * RP                  # B=2 interleaved with V=2


def _random_case(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s), dtype)

    # self stream rows stacked over cross stream rows (one take per level)
    vals_both = tuple(arr(2 * M, 4 * c) for c in CHANNELS)
    # slot weights: convex-ish rows plus some exact zeros (the 'zeros' mode)
    aux = rng.random((2, M, 16)).astype(np.float32)
    aux[:, ::7, :12] = 0.0
    aux_self, aux_cross = jnp.asarray(aux[0]), jnp.asarray(aux[1])
    params = (arr(F + 3, H1), arr(H1), arr(H1, LD), arr(LD),
              arr(2 * LD, LD), arr(LD), arr(2 * LD, HID), arr(HID),
              arr(HID, HID), arr(HID))
    return vals_both, aux_self, aux_cross, params


def _naive(vals_both, aux_self, aux_cross, params):
    """Independent re-derivation, written the way the renderer's unfused
    path does it (per-view slices, explicit concats)."""
    (w1, b1, w2, b2, lv, lv_bias, km, km_bias, k2, k2_bias) = params
    vals_self = [v[:M] for v in vals_both]
    vals_cross = [v[M:] for v in vals_both]

    def combine(vals, aux):
        outs = []
        for l, v in enumerate(vals):
            c = v.shape[-1] // 4
            vv = v.reshape(M, 4, c)
            w = aux[:, l * 4:(l + 1) * 4]
            outs.append(jnp.einsum('mkc,mk->mc', vv, w))
        return jnp.concatenate(outs, -1)

    def fuse(vals, aux):
        x = jnp.concatenate([combine(vals, aux), aux[:, 12:15]], -1)
        return jax.nn.relu(x @ w1 + b1) @ w2 + b2

    fs = fuse(vals_self, aux_self).reshape(2, 2, RP, LD)
    fc = fuse(vals_cross, aux_cross).reshape(2, 2, RP, LD)
    jl, kv = [], []
    for v in range(2):
        pair = ((fs[:, v], fc[:, v]) if v == 0 else (fc[:, v], fs[:, v]))
        cat = jnp.concatenate(pair, -1)
        jl.append(cat @ lv + lv_bias)
        kv.append(jax.nn.relu(cat @ km + km_bias) @ k2 + k2_bias)
    return (jnp.stack(jl, 1).reshape(M, LD),
            jnp.stack(kv, 1).reshape(M, HID))


def test_reference_matches_naive():
    case = _random_case(0)
    jl, kv = GE._reference(*case, RP)
    jl2, kv2 = _naive(*case)
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jl2),
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kv2),
                               rtol=1e-4, atol=5e-3)


def test_pallas_interpret_matches_reference():
    case = _random_case(1)
    jl, kv = GE._reference(*case, RP)
    old = GE.BLOCK_M
    GE.BLOCK_M = RP
    try:
        jlp, kvp = GE._pallas_forward(*case, RP, interpret=True)
    finally:
        GE.BLOCK_M = old
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jlp),
                               atol=2e-2, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kvp),
                               atol=2e-2, rtol=2e-3)


def test_custom_vjp_matches_reference_grads():
    case = _random_case(2)
    vals_both, aux_self, aux_cross, params = case

    def loss_op(vb, p):
        jl, kv = GE.fused_exchange_epilogue(vb, aux_self, aux_cross, p, RP)
        return jnp.sum(jl ** 2) + jnp.sum(kv ** 2)

    def loss_ref(vb, p):
        jl, kv = GE._reference(vb, aux_self, aux_cross, p, RP)
        return jnp.sum(jl ** 2) + jnp.sum(kv ** 2)

    g_op = jax.grad(loss_op, argnums=(0, 1))(vals_both, params)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(vals_both, params)
    for a, b in zip(jax.tree.leaves(g_op), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=2e-3)


def test_pallas_interpret_int8_tables_match_reference():
    # int8 gather tables (quantized fast-eval mode): the kernel casts rows
    # to the weights dtype in VMEM; reference and kernel must agree.
    case = _random_case(3)
    vals_both, aux_self, aux_cross, params = case
    vals_q = tuple(jnp.clip(jnp.round(v * 16.0), -127, 127).astype(jnp.int8)
                   for v in vals_both)
    jl, kv = GE._reference(vals_q, aux_self, aux_cross, params, RP)
    assert jl.dtype == jnp.float32          # compute dtype = aux dtype
    old = GE.BLOCK_M
    GE.BLOCK_M = RP
    try:
        jlp, kvp = GE._pallas_forward(vals_q, aux_self, aux_cross, params,
                                      RP, interpret=True)
    finally:
        GE.BLOCK_M = old
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jlp),
                               atol=2e-2, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kvp),
                               atol=2e-2, rtol=2e-3)


# ---------------------------------------------------------------------------
# Multi-stream (V >= 3) variant
# ---------------------------------------------------------------------------

S = 3


def _random_case_multi(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s), dtype)

    vals = tuple(arr(S * M, 4 * c) for c in CHANNELS)
    aux = rng.random((S, M, 16)).astype(np.float32)
    aux[:, ::7, :12] = 0.0
    aux_list = tuple(jnp.asarray(a) for a in aux)
    params = (arr(F + 3, H1), arr(H1), arr(H1, LD), arr(LD),
              arr(S * LD, LD), arr(LD), arr(S * LD, HID), arr(HID),
              arr(HID, HID), arr(HID))
    return vals, aux_list, params


def _naive_multi(vals, aux_list, params):
    """Independent re-derivation: per-stream fuse, [self, c0, c1] concat."""
    (w1, b1, w2, b2, lv, lv_bias, km, km_bias, k2, k2_bias) = params

    def combine(vals_s, aux):
        outs = []
        for l, v in enumerate(vals_s):
            c = v.shape[-1] // 4
            vv = v.reshape(M, 4, c)
            w = aux[:, l * 4:(l + 1) * 4]
            outs.append(jnp.einsum('mkc,mk->mc', vv, w))
        return jnp.concatenate(outs, -1)

    def fuse(vals_s, aux):
        x = jnp.concatenate([combine(vals_s, aux), aux[:, 12:15]], -1)
        return jax.nn.relu(x @ w1 + b1) @ w2 + b2

    fs = [fuse([v[s * M:(s + 1) * M] for v in vals], aux_list[s])
          for s in range(S)]
    cat = jnp.concatenate(fs, -1)
    jl = cat @ lv + lv_bias
    kv = jax.nn.relu(cat @ km + km_bias) @ k2 + k2_bias
    return jl, kv


def test_multi_reference_matches_naive():
    case = _random_case_multi(0)
    jl, kv = GE._reference_multi(*case)
    jl2, kv2 = _naive_multi(*case)
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jl2),
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kv2),
                               rtol=1e-4, atol=5e-3)


def test_multi_pallas_interpret_matches_reference():
    case = _random_case_multi(1)
    jl, kv = GE._reference_multi(*case)
    old = GE.BLOCK_M
    GE.BLOCK_M = RP
    try:
        jlp, kvp = GE._pallas_forward_multi(*case, interpret=True)
    finally:
        GE.BLOCK_M = old
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jlp),
                               atol=2e-2, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kvp),
                               atol=2e-2, rtol=2e-3)


def test_multi_custom_vjp_matches_reference_grads():
    vals, aux_list, params = _random_case_multi(2)

    def loss_op(vb, p):
        jl, kv = GE.fused_exchange_epilogue_multi(vb, aux_list, p)
        return jnp.sum(jl ** 2) + jnp.sum(kv ** 2)

    def loss_ref(vb, p):
        jl, kv = GE._reference_multi(vb, aux_list, p)
        return jnp.sum(jl ** 2) + jnp.sum(kv ** 2)

    g_op = jax.grad(loss_op, argnums=(0, 1))(vals, params)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(vals, params)
    for a, b in zip(jax.tree.leaves(g_op), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=2e-3)


def test_multi_int8_tables_match_reference():
    vals, aux_list, params = _random_case_multi(3)
    vals_q = tuple(jnp.clip(jnp.round(v * 16.0), -127, 127).astype(jnp.int8)
                   for v in vals)
    jl, kv = GE._reference_multi(vals_q, aux_list, params)
    assert jl.dtype == jnp.float32
    old = GE.BLOCK_M
    GE.BLOCK_M = RP
    try:
        jlp, kvp = GE._pallas_forward_multi(vals_q, aux_list, params,
                                            interpret=True)
    finally:
        GE.BLOCK_M = old
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jlp),
                               atol=2e-2, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kvp),
                               atol=2e-2, rtol=2e-3)
