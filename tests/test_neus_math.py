import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.ops.neus_math import (
    composite_rays,
    cos_anneal_ratio,
    neus_alpha,
    sdf_to_logistic_density,
    variance_to_inv_s,
)


def _ref_alpha(sdf, normal, direction, dt, inv_s, anneal):
    """NumPy oracle transcribing the formulas in testbed_nerf.cu:1590-1617."""
    true_cos = float(np.dot(direction, normal))
    relu = lambda v: max(v, 0.0)
    iter_cos = -(
        relu(-true_cos * 0.5 + 0.5) * (1.0 - anneal) + relu(-true_cos) * anneal
    )
    nxt = sdf + iter_cos * dt * 0.5
    prv = sdf - iter_cos * dt * 0.5
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    p = sig(prv * inv_s) - sig(nxt * inv_s)
    c = sig(prv * inv_s)
    return float(np.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0))


def test_alpha_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(50):
        sdf = rng.normal() * 0.1
        normal = rng.normal(size=3)
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        dt = abs(rng.normal()) * 0.01 + 1e-4
        inv_s = np.exp(10 * 0.3)
        anneal = rng.uniform()
        got = neus_alpha(
            jnp.asarray(sdf), jnp.asarray(normal), jnp.asarray(direction),
            jnp.asarray(dt), jnp.asarray(inv_s), jnp.asarray(anneal),
        )
        want = _ref_alpha(sdf, normal, direction, dt, inv_s, anneal)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_alpha_surface_crossing():
    # A ray crossing the zero level set against the normal should produce
    # high opacity near the surface.
    normal = jnp.array([0.0, 0.0, 1.0])
    direction = jnp.array([0.0, 0.0, -1.0])  # heading into the surface
    alpha = neus_alpha(
        jnp.asarray(0.0), normal, direction, jnp.asarray(0.01),
        variance_to_inv_s(jnp.asarray(0.5)), jnp.asarray(1.0),
    )
    assert alpha > 0.3


def test_variance_to_inv_s():
    np.testing.assert_allclose(variance_to_inv_s(jnp.asarray(0.3)), np.exp(3.0), rtol=1e-5)


def test_logistic_density():
    # At sdf=0 the logistic density peaks at inv_s/4.
    inv_s = jnp.asarray(20.0)
    d0 = sdf_to_logistic_density(jnp.asarray(0.0), inv_s)
    np.testing.assert_allclose(d0, 5.0, rtol=1e-6)
    assert sdf_to_logistic_density(jnp.asarray(1.0), inv_s) < d0


def test_cos_anneal():
    assert cos_anneal_ratio(jnp.asarray(500), 0) == 1.0
    np.testing.assert_allclose(cos_anneal_ratio(jnp.asarray(50), 100), 0.5)
    np.testing.assert_allclose(cos_anneal_ratio(jnp.asarray(500), 100), 1.0)


def test_composite_basic():
    # Two samples: alpha 0.5 then 1.0 -> weights 0.5, 0.5.
    rgb = jnp.array([[[1.0, 0, 0], [0, 1.0, 0]]])
    alpha = jnp.array([[0.5, 1.0]])
    t_vals = jnp.array([[1.0, 2.0]])
    mask = jnp.ones((1, 2), bool)
    out = composite_rays(rgb, alpha, t_vals, mask)
    np.testing.assert_allclose(out.rgb[0], [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(out.weight_sum[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out.depth[0], 1.5, atol=1e-6)
    np.testing.assert_allclose(out.trans[0], 0.0, atol=1e-6)


def test_composite_masking():
    rgb = jnp.ones((1, 4, 3))
    alpha = jnp.full((1, 4), 0.9)
    t_vals = jnp.arange(4.0)[None]
    mask = jnp.array([[True, True, False, False]])
    out = composite_rays(rgb, alpha, t_vals, mask)
    np.testing.assert_allclose(out.weight_sum[0], 0.9 + 0.1 * 0.9, atol=1e-6)


def test_composite_early_out():
    # After transmittance collapses below eps, further samples are culled.
    s = 64
    rgb = jnp.ones((1, s, 3))
    alpha = jnp.full((1, s), 0.9)
    t_vals = jnp.arange(float(s))[None]
    mask = jnp.ones((1, s), bool)
    out = composite_rays(rgb, alpha, t_vals, mask, trans_eps=1e-4)
    n_live = int(out.sample_mask.sum())
    assert n_live < s  # culling happened
    # 0.1^k < 1e-4 at k=4 -> first 5 samples live (T before sample 4 is 1e-4).
    assert n_live == 5


def test_composite_grad_finite():
    def loss(alpha):
        rgb = jnp.ones((2, 8, 3)) * 0.5
        t_vals = jnp.broadcast_to(jnp.arange(8.0), (2, 8))
        mask = jnp.ones((2, 8), bool)
        out = composite_rays(rgb, alpha, t_vals, mask)
        return jnp.sum(out.rgb) + jnp.sum(out.weight_sum)

    g = jax.grad(loss)(jnp.full((2, 8), 0.3))
    assert np.all(np.isfinite(g))
