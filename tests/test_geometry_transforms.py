"""Geometry API jit/vmap invariants (the module's contract: every function
is jit/vmap/shard_map safe)."""

import jax
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu import geometry as G


def _cams(n, seed=0):
    rng = np.random.default_rng(seed)
    c2w = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
    c2w[:, :3, 3] = rng.normal(0, 1, (n, 3))
    intr = np.broadcast_to(np.diag([200.0, 200.0, 1, 1]), (n, 4, 4)).copy()
    intr[:, 0, 2] = intr[:, 1, 2] = 64
    return (jnp.asarray(c2w, jnp.float32), jnp.asarray(intr, jnp.float32),
            jnp.asarray(rng.uniform(0, 127, (n, 10, 2)), jnp.float32))


def test_jit_matches_eager():
    c2w, intr, uv = _cams(3)
    eager = G.plucker_embedding(c2w, uv, intr)
    jitted = jax.jit(G.plucker_embedding)(c2w, uv, intr)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               atol=1e-6)


def test_vmap_project_rays_matches_batched():
    c2w, intr, uv = _cams(4, seed=1)
    intr_n = intr.at[:, :2, :].set(intr[:, :2, :] / 128.0)
    dirs = G.ray_directions(uv, c2w, intr)
    origins = jnp.broadcast_to(G.ray_origin(c2w)[:, None], dirs.shape)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), c2w.shape)

    batched = G.project_rays(origins, dirs, eye, intr_n)
    vmapped = jax.vmap(
        lambda o, d, e, k: G.project_rays(o[None], d[None], e[None],
                                          k[None]))(origins, dirs, eye,
                                                    intr_n)
    np.testing.assert_array_equal(np.asarray(batched.overlaps_image),
                                  np.asarray(vmapped.overlaps_image)[:, 0])
    ov = np.asarray(batched.overlaps_image)
    np.testing.assert_allclose(np.asarray(batched.xy_min)[ov],
                               np.asarray(vmapped.xy_min)[:, 0][ov],
                               atol=1e-6)


def test_grad_through_plucker():
    """Geometry must be differentiable (the reference backprops through
    lf_coords, models.py:216)."""
    c2w, intr, uv = _cams(2, seed=2)

    def f(c):
        return jnp.sum(G.plucker_embedding(c, uv, intr) ** 2)

    g = jax.grad(f)(c2w)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0
