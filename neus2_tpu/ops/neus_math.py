"""Core NeuS math: SDF -> alpha conversion, volumetric compositing, SDF -> density.

These pure functions are the TPU-native restatement of the reference's fused
loss/composite kernels (src/testbed_nerf.cu:1475-1998 training composite,
936-1045 render composite, common_operation.cuh:307-324 sdf->density).  Unlike
the reference — which hand-derives every gradient — these are written to be
differentiated by ``jax.grad`` (including second order for the eikonal term).

Conventions: all per-sample arrays have a fixed samples-per-ray dimension S and
carry an explicit validity ``mask``; invalid samples contribute zero alpha.
This replaces the reference's atomics-based variable-length compaction with
fixed shapes that XLA can compile once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neus2_tpu.constants import TRAIN_TRANSMITTANCE_EPS


def cos_anneal_ratio(step: jnp.ndarray, anneal_end: int) -> jnp.ndarray:
    """Cosine annealing ratio (reference nerf_network.h:1119-1129)."""
    if anneal_end == 0:
        return jnp.asarray(1.0, jnp.float32)
    return jnp.minimum(1.0, step.astype(jnp.float32) / float(anneal_end))


def neus_alpha(
    sdf: jnp.ndarray,
    normal: jnp.ndarray,
    direction: jnp.ndarray,
    dt: jnp.ndarray,
    inv_s: jnp.ndarray,
    anneal: jnp.ndarray,
) -> jnp.ndarray:
    """NeuS SDF -> opacity conversion.

    Matches the reference training/render composite (testbed_nerf.cu:1590-1617):

      true_cos = <dir, grad sdf>          (unnormalized: NORMAL_VECTORS_NORMALIZED=0)
      iter_cos = -(relu(-true_cos*0.5+0.5)*(1-anneal) + relu(-true_cos)*anneal)
      next/prev_sdf = sdf +/- iter_cos*dt/2
      alpha = clip((sig(prev*s) - sig(next*s) + 1e-5) / (sig(prev*s) + 1e-5), 0, 1)

    Args: sdf (..., ), normal (..., 3), direction (..., 3), dt (...,),
    inv_s scalar or (...,), anneal scalar. Returns alpha (...,).
    """
    true_cos = jnp.sum(direction * normal, axis=-1)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - anneal)
        + jax.nn.relu(-true_cos) * anneal
    )
    est_next_sdf = sdf + iter_cos * dt * 0.5
    est_prev_sdf = sdf - iter_cos * dt * 0.5
    next_cdf = jax.nn.sigmoid(est_next_sdf * inv_s)
    prev_cdf = jax.nn.sigmoid(est_prev_sdf * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)


def variance_to_inv_s(variance_param: jnp.ndarray) -> jnp.ndarray:
    """inv_s = exp(10 * variance) (reference testbed_nerf.cu:1590)."""
    return jnp.exp(10.0 * variance_param)


def sdf_to_logistic_density(sdf: jnp.ndarray, inv_s: jnp.ndarray) -> jnp.ndarray:
    """SDF -> logistic density used for occupancy-grid maintenance.

    Reference ``sdf_to_density_variance_buffer`` (common_operation.cuh:307-324):
    density = s * sig(s * sdf) * (1 - sig(s * sdf)) with s = exp(10*variance).
    """
    sig = jax.nn.sigmoid(sdf * inv_s)
    return inv_s * sig * (1.0 - sig)


class CompositeOut(NamedTuple):
    rgb: jnp.ndarray  # (R, 3) composited color (before background)
    depth: jnp.ndarray  # (R,)
    weight_sum: jnp.ndarray  # (R,)
    weights: jnp.ndarray  # (R, S) per-sample weights
    trans: jnp.ndarray  # (R,) final transmittance T after the last sample
    sample_mask: jnp.ndarray  # (R, S) effective mask after early-out culling


def composite_rays(
    rgb: jnp.ndarray,  # (R, S, 3)
    alpha: jnp.ndarray,  # (R, S)
    t_vals: jnp.ndarray,  # (R, S) metric distance of each sample along the ray
    mask: jnp.ndarray,  # (R, S) bool validity
    trans_eps: float = TRAIN_TRANSMITTANCE_EPS,
) -> CompositeOut:
    """Front-to-back alpha compositing over a fixed samples-per-ray dim.

    Mirrors the reference training composite loop (testbed_nerf.cu:1572-1628):
    weight_i = alpha_i * prod_{j<i}(1-alpha_j), with early-out once the running
    transmittance drops below ``trans_eps`` (the reference stops compositing and
    compacts those samples away; here they are masked out so they contribute
    neither color nor loss).
    """
    alpha = jnp.where(mask, alpha, 0.0)
    # Exclusive cumulative product of (1 - alpha): T before each sample.
    one_minus = 1.0 - alpha
    t_before = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]], axis=-1),
        axis=-1,
    )
    # Early-out: samples after transmittance collapse are culled, matching the
    # reference's `if (T < EPSILON) break`.
    live = t_before >= trans_eps
    eff_mask = mask & live
    alpha = jnp.where(live, alpha, 0.0)
    weights = alpha * t_before
    rgb_ray = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_ray = jnp.sum(weights * t_vals, axis=-1)
    weight_sum = jnp.sum(weights, axis=-1)
    trans = jnp.prod(jnp.where(live, 1.0 - alpha, 1.0), axis=-1)
    return CompositeOut(rgb_ray, depth_ray, weight_sum, weights, trans, eff_mask)
