"""Small dense MLPs with geometric (sphere) initialization.

Replaces the reference's FullyFusedMLP / CutlassMLP
(reference: dependencies/my_tcnn/src/fully_fused_mlp.cu) — on TPU a small MLP
is a chain of MXU matmuls that XLA fuses; the hand-written double-backward
(`backward_backward_input_impl`, fully_fused_mlp.cu:1089-1198) is replaced by
``jax.grad`` of ``jax.grad``.

Unlike tcnn (bias-free), our MLPs carry biases: this is what makes an *exact*
analytic geometric initialization possible — the reference instead loads
pretrained weights from a `utils/mlp_weights.txt` asset that is absent from
the repo snapshot (nerf_network.h:787-813), so we implement the standard
SAL/IGR sphere init analytically.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def init_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    n_hidden_layers: int,
    out_dim: int,
    dtype=jnp.float32,
) -> Params:
    """He-uniform init, matching tcnn's default MLP initialization scale."""
    dims = [in_dim] + [hidden_dim] * n_hidden_layers + [out_dim]
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(6.0 / (dims[i] + dims[i + 1]))
        w = jax.random.uniform(
            sub, (dims[i], dims[i + 1]), dtype, minval=-scale, maxval=scale
        )
        b = jnp.zeros((dims[i + 1],), dtype)
        layers.append({"w": w, "b": b})
    return {"layers": layers}


def apply_mlp(
    params: Params,
    x: jnp.ndarray,
    activation: Callable[[jnp.ndarray], jnp.ndarray] = jax.nn.relu,
    output_activation: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    dtype=None,
) -> jnp.ndarray:
    """``dtype`` (e.g. bf16) casts activations + weights for the matmuls
    while accumulating fp32 — the TPU analog of the reference's fp16
    tensor-core MLPs with fp32 master params (trainer.h:79-88); params stay
    fp32 in the optimizer, no loss scaling needed with bf16's fp32-range
    exponent.  Output is always fp32.
    """
    layers = params["layers"]
    h = x if dtype is None else x.astype(dtype)
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        if dtype is not None:
            w = w.astype(dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < len(layers) - 1:
            h = activation(h)
            if dtype is not None:
                h = h.astype(dtype)
    if output_activation is not None:
        h = output_activation(h)
    return h


def geometric_init_sdf_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    n_hidden_layers: int,
    out_dim: int,
    n_raw_pos_dims: int = 3,
    center: float = 0.5,
    radius: float = 0.5,
    sdf_bias: float = -0.1,
    dtype=jnp.float32,
) -> Params:
    """SAL/IGR sphere initialization so that initial SDF(x) ~ |x - center| - radius.

    The MLP input is assumed to be ``[xyz (n_raw_pos_dims) | grid features]``;
    grid features are ~1e-4 at init so only the xyz columns matter.  Output
    channel 0 is the raw SDF; the external ``sdf_bias`` (reference
    nerf_network.h:87, -0.1) is *subtracted from the target radius* here so
    that sdf_raw + sdf_bias ~ |x - c| - radius.

    Scheme (Atzmon & Lipman, SAL 2020; Gropp et al., IGR 2020):
      * hidden weights ~ N(0, sqrt(2/fan_out)); xyz centered via biases;
      * last-layer sdf row ~ N(sqrt(pi/fan_in), 1e-4), bias = -(radius+sdf_bias).
    """
    dims = [in_dim] + [hidden_dim] * n_hidden_layers + [out_dim]
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        fan_in, fan_out = dims[i], dims[i + 1]
        is_first = i == 0
        is_last = i == len(dims) - 2
        if is_last:
            w = jax.random.normal(sub, (fan_in, fan_out), dtype) * 1e-4
            mean = jnp.sqrt(jnp.pi / fan_in).astype(dtype)
            w = w.at[:, 0].add(mean)
            b = jnp.zeros((fan_out,), dtype)
            b = b.at[0].set(-(radius + sdf_bias))
        elif is_first:
            w = jax.random.normal(sub, (fan_in, fan_out), dtype) * jnp.sqrt(
                2.0 / fan_out
            )
            # Grid-feature columns start near zero so the sphere geometry is
            # carried by the raw xyz columns alone.
            w = w.at[n_raw_pos_dims:, :].multiply(1e-2)
            # Center the sphere: bias = -W_xyz^T @ (center,)*3 makes the layer
            # act on (x - center).
            b = -jnp.sum(w[:n_raw_pos_dims, :], axis=0) * center
        else:
            w = jax.random.normal(sub, (fan_in, fan_out), dtype) * jnp.sqrt(
                2.0 / fan_out
            )
            b = jnp.zeros((fan_out,), dtype)
        layers.append({"w": w, "b": b})
    return {"layers": layers}
