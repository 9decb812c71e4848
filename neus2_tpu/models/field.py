"""The NeuS composite field: hashgrid + SDF MLP + dir encoding + RGB MLP + variance.

TPU-native restatement of the reference's NerfNetwork
(reference: include/neural-graphics-primitives/nerf_network.h:49-325).  The
reference runs an explicit "backward inside the forward" to obtain the SDF
spatial gradient; here the normal is ``jax.grad`` of the SDF evaluated inside
the forward function, and the whole thing stays differentiable (to second
order, as the eikonal loss requires) by construction.

All positions/directions are in *warped* coordinates ([0,1] cube / [0,1] dirs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from neus2_tpu.constants import SDF_BIAS, VARIANCE_INIT
from neus2_tpu.models.mlp import apply_mlp, geometric_init_sdf_mlp, init_mlp
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.ops.hashgrid_fast import init_hashgrid_tables, make_encode_jac
from neus2_tpu.ops.neus_math import variance_to_inv_s
from neus2_tpu.ops.sh import sh_encode, sh_output_dim

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static field configuration (reference configs/nerf/base.json:29-75)."""

    grid: HashGridConfig = HashGridConfig()
    sdf_hidden_dim: int = 64
    sdf_n_hidden: int = 1
    # Raw SDF-MLP output width: channel 0 = sdf, rest are geometry features
    # fed to the RGB net (reference density_network padded_output_width = 16).
    sdf_out_dim: int = 16
    rgb_hidden_dim: int = 64
    rgb_n_hidden: int = 2
    sh_degree: int = 4
    sdf_bias: float = SDF_BIAS
    geometric_init: bool = True
    init_radius: float = 0.5
    # Per-image appearance/latent codes appended to the RGB input
    # (reference n_extra_learnable_dims, nerf_loader.cu / testbed extra dims).
    latent_dim: int = 0
    # Residual hash grid for dynamic scenes: lookups read frozen_base + grid
    # (reference [MOD] DynamicGridEncoding, my_tcnn double_hash_grid.h:288,
    # 2483-2514 set_base_grid; registered as otype "DynamicGrid").
    residual_grid: bool = False
    # MLP compute dtype: bf16 = hardware-native matmuls with fp32
    # accumulation and fp32 master params (the reference's fp16 + fp32
    # master scheme, trainer.h:79-88; bf16 needs no loss scaling).  The
    # encoder/compositing stay fp32 (SDF differences need the mantissa).
    compute_dtype: Any = None

    @property
    def sdf_in_dim(self) -> int:
        return 3 + self.grid.output_dim

    @property
    def rgb_in_dim(self) -> int:
        # [sdf features | SH(dir) | xyz | normal | latent]
        # (reference nerf_network.h:262-283 rgb_network_input layout)
        return self.sdf_out_dim + sh_output_dim(self.sh_degree) + 3 + 3 + self.latent_dim


class FieldOutput(NamedTuple):
    rgb: jnp.ndarray  # (..., 3) in [0,1] (sigmoid activated)
    sdf: jnp.ndarray  # (...,) biased SDF
    normal: jnp.ndarray  # (..., 3) dSDF/dpos in warped coords (unnormalized)
    inv_s: jnp.ndarray  # scalar


def init_field(key: jax.Array, config: FieldConfig) -> Params:
    k_grid, k_sdf, k_rgb = jax.random.split(key, 3)
    if config.geometric_init:
        sdf_mlp = geometric_init_sdf_mlp(
            k_sdf,
            config.sdf_in_dim,
            config.sdf_hidden_dim,
            config.sdf_n_hidden,
            config.sdf_out_dim,
            radius=config.init_radius,
            sdf_bias=config.sdf_bias,
        )
        sdf_mlp = _calibrate_sphere_init(sdf_mlp, config)
    else:
        sdf_mlp = init_mlp(
            k_sdf,
            config.sdf_in_dim,
            config.sdf_hidden_dim,
            config.sdf_n_hidden,
            config.sdf_out_dim,
        )
    params_out = {
        "hashgrid": init_hashgrid_tables(k_grid, config.grid),
        "sdf_mlp": sdf_mlp,
        "rgb_mlp": init_mlp(
            k_rgb,
            config.rgb_in_dim,
            config.rgb_hidden_dim,
            config.rgb_n_hidden,
            3,
        ),
        # Single variance parameter, init 0.3 (nerf_network.h initialize_params).
        "variance": jnp.asarray(VARIANCE_INIT, jnp.float32),
    }
    if config.residual_grid:
        # Frozen base grid; see effective_grid_tables / freeze_grid_into_base.
        params_out["hashgrid_base"] = tuple(
            jnp.zeros_like(t) for t in params_out["hashgrid"]
        )
    return params_out


import functools


@functools.lru_cache(maxsize=None)
def _encoder(grid_config: HashGridConfig, compute_dtype=None):
    return make_encode_jac(grid_config, compute_dtype=compute_dtype)


def effective_grid_tables(params: Params) -> tuple:
    """Residual-grid composition: frozen base + trainable residual
    (reference double_hash_grid.h:288: result = grid + base_grid)."""
    tables = params["hashgrid"]
    if "hashgrid_base" in params:
        tables = tuple(
            jax.lax.stop_gradient(b) + t
            for b, t in zip(params["hashgrid_base"], tables)
        )
    return tables


def freeze_grid_into_base(params: Params) -> Params:
    """Fold the trained residual into the frozen base (dynamic frame switch;
    reference set_base_grid, double_hash_grid.h:2483)."""
    if "hashgrid_base" not in params:
        return params
    new = dict(params)
    new["hashgrid_base"] = tuple(
        b + t for b, t in zip(params["hashgrid_base"], params["hashgrid"])
    )
    new["hashgrid"] = tuple(jnp.zeros_like(t) for t in params["hashgrid"])
    return new


def _raw_sdf_mlp(params: Params, sdf_mlp: Params, x: jnp.ndarray, config: FieldConfig,
                 valid_level, max_level) -> jnp.ndarray:
    enc, _ = _encoder(config.grid, config.compute_dtype)(
        effective_grid_tables(params), x, valid_level, max_level
    )
    inp = jnp.concatenate([x, enc], axis=-1)
    return apply_mlp(sdf_mlp, inp, dtype=config.compute_dtype)


def _calibrate_sphere_init(sdf_mlp: Params, config: FieldConfig) -> Params:
    """Least-squares-fit the last layer so raw_sdf(x) ~ |x-0.5| - r - bias.

    The SAL/IGR init gives hidden features whose span contains a good radial
    basis; solving a ridge regression of the *actual* hidden activations
    against the target sphere SDF makes the initialization exact up to MLP
    expressivity, for any width/depth (verified by tests/test_field.py).
    """
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (8192, 3), jnp.float32)
    # At init the hashgrid is ~1e-4; calibrate with the grid features zeroed.
    enc = jnp.zeros((x.shape[0], config.grid.output_dim), jnp.float32)
    h = jnp.concatenate([x, enc], axis=-1)
    layers = [dict(l) for l in sdf_mlp["layers"]]
    for layer in layers[:-1]:
        h = jax.nn.relu(jnp.dot(h, layer["w"]) + layer["b"])
    target = (
        jnp.linalg.norm(x - 0.5, axis=-1)
        - config.init_radius
        - config.sdf_bias
    )
    design = jnp.concatenate([h, jnp.ones((h.shape[0], 1), h.dtype)], axis=-1)
    gram = design.T @ design + 1e-4 * jnp.eye(design.shape[1], dtype=h.dtype)
    beta = jnp.linalg.solve(gram, design.T @ target)
    last = dict(layers[-1])
    last["w"] = last["w"].at[:, 0].set(beta[:-1])
    last["b"] = last["b"].at[0].set(beta[-1])
    layers[-1] = last
    return {"layers": layers}


def sdf_fn(
    params: Params,
    x: jnp.ndarray,
    config: FieldConfig,
    valid_level=None,
    max_level=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Biased SDF and geometry features at warped positions x (..., 3).

    Returns (sdf (...,), features (..., sdf_out_dim)); features keep the raw
    (unbiased) sdf in channel 0 as the reference feeds them to the RGB net.
    """
    out = _raw_sdf_mlp(params, params["sdf_mlp"], x, config, valid_level, max_level)
    return out[..., 0] + config.sdf_bias, out


def sdf_normal_features(
    params: Params,
    x: jnp.ndarray,
    config: FieldConfig,
    valid_level=None,
    max_level=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sdf, normal, features) with normal = dSDF/dx, differentiable twice.

    Replaces the reference's in-forward MLP+grid backward with
    EGradientMode::Ignore (nerf_network.h:228-259).

    The hashgrid contributes its *analytic* spatial Jacobian (the reference's
    ``dy_dx`` cache, grid.h:175-369) through a custom-VJP encoder — one
    gather pass, one scatter pass per step, and the eikonal term becomes
    first-order in the Jacobian output (no grad-of-grad through gathers).
    Only the tiny SDF MLP is linearized (forward-mode), which is cheap and
    twice-differentiable.
    """
    enc, jac = _encoder(config.grid, config.compute_dtype)(
        effective_grid_tables(params), x, valid_level, max_level
    )
    inp = jnp.concatenate([x, enc], axis=-1)

    out, f_lin = jax.linearize(
        lambda q: apply_mlp(params["sdf_mlp"], q, dtype=config.compute_dtype),
        inp,
    )
    eye = jnp.eye(3, dtype=x.dtype)
    cols = []
    for i in range(3):
        tangent = jnp.concatenate(
            [jnp.broadcast_to(eye[i], x.shape), jac[:, i, :]], axis=-1
        )
        cols.append(f_lin(tangent)[..., 0])
    normal = jnp.stack(cols, axis=-1)
    return out[..., 0] + config.sdf_bias, normal, out


def rgb_fn(
    params: Params,
    features: jnp.ndarray,
    x: jnp.ndarray,
    normal: jnp.ndarray,
    dir_warped: jnp.ndarray,
    config: FieldConfig,
    latent: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """RGB head. Input layout mirrors nerf_network.h:262-283:
    [sdf features | SH(warped dir) | xyz | dSDF/dx | latent]; sigmoid output
    activation (reference ENerfActivation::Logistic for rgb).
    """
    sh = sh_encode(dir_warped, config.sh_degree).astype(features.dtype)
    parts = [features, sh, x, normal]
    if config.latent_dim:
        if latent is None:
            latent = jnp.zeros(x.shape[:-1] + (config.latent_dim,), x.dtype)
        parts.append(latent)
    inp = jnp.concatenate(parts, axis=-1)
    return jax.nn.sigmoid(
        apply_mlp(params["rgb_mlp"], inp, dtype=config.compute_dtype)
    )


def field_forward(
    params: Params,
    x: jnp.ndarray,
    dir_warped: jnp.ndarray,
    config: FieldConfig,
    valid_level=None,
    max_level=None,
    latent: jnp.ndarray | None = None,
) -> FieldOutput:
    """Full field evaluation at warped positions/directions."""
    sdf, normal, feat = sdf_normal_features(params, x, config, valid_level, max_level)
    rgb = rgb_fn(params, feat, x, normal, dir_warped, config, latent)
    inv_s = variance_to_inv_s(params["variance"])
    return FieldOutput(rgb=rgb, sdf=sdf, normal=normal, inv_s=inv_s)
