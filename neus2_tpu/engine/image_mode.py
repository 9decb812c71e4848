"""Image-fit testbed mode (gigapixel image regression).

The reference's inherited instant-ngp mode (src/testbed_image.cu:
train_image :220 — sample pixel coordinates uniformly, fetch bilinear
targets, regress rgb(x, y) with a 2-D hashgrid + MLP under RelativeL2;
render = evaluate the network over the pixel grid).  TPU-native version:

  * a 2-D multiresolution hash encoding in plain jnp (same sizing /
    hashing rules as the 3-D production encoder — grid.h grid_index
    :137-153 with the 2-D prime set; plain autodiff is plenty at image-fit
    scale, no custom VJP needed),
  * jitted fit step over a pixel batch with bilinear target fetch
    (testbed_image.cu eval_image bilinear),
  * whole-image render + PSNR eval.

Mode dispatch: ``python -m neus2_tpu.run --mode image --scene img.png``.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.models.mlp import apply_mlp, init_mlp

_PRIMES = (1, 2654435761)  # grid.h fast_hash primes, first two dims


@dataclasses.dataclass(frozen=True)
class Image2DConfig:
    n_levels: int = 12
    n_features_per_level: int = 2
    log2_hashmap_size: int = 18
    base_resolution: int = 16
    per_level_scale: float = 1.75
    hidden_dim: int = 64
    n_hidden: int = 2
    lr: float = 1e-2
    batch_size: int = 1 << 16

    def level_tables(self) -> list[tuple[int, int]]:
        """[(resolution, n_rows)] per level — the reference sizing rule
        (grid.h constructor) in 2-D."""
        out = []
        for lvl in range(self.n_levels):
            scale = (
                math.exp2(lvl * math.log2(self.per_level_scale))
                * self.base_resolution
                - 1.0
            )
            res = int(math.ceil(scale)) + 1
            rows = min(
                ((res * res + 7) // 8) * 8, 1 << self.log2_hashmap_size
            )
            out.append((res, rows))
        return out


def init_image_params(key: jax.Array, config: Image2DConfig):
    tables = []
    for i, (_, rows) in enumerate(config.level_tables()):
        key, k = jax.random.split(key)
        tables.append(
            jax.random.uniform(
                k, (rows, config.n_features_per_level), jnp.float32,
                -1e-4, 1e-4,
            )
        )
    key, k = jax.random.split(key)
    mlp = init_mlp(
        k,
        config.n_levels * config.n_features_per_level,
        config.hidden_dim,
        config.n_hidden,
        3,
    )
    return {"tables": tuple(tables), "mlp": mlp}


def hash2d_encode(tables, pos: jnp.ndarray, config: Image2DConfig):
    """(N, 2) in [0,1]^2 -> (N, L*F) bilinear multires features."""
    feats = []
    for (res, rows), table in zip(config.level_tables(), tables):
        scaled = pos * (res - 1)
        p0 = jnp.floor(scaled).astype(jnp.int32)
        frac = scaled - p0
        level_feat = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                corner = p0 + jnp.array([dx, dy], jnp.int32)
                corner = jnp.clip(corner, 0, res - 1)
                if res * res <= rows:  # dense: x-major linear index
                    idx = corner[:, 0] + corner[:, 1] * res
                else:  # hashed (grid.h fast_hash XOR-prime, uint32 wrap)
                    cu = corner.astype(jnp.uint32)
                    idx = (
                        (cu[:, 0] * jnp.uint32(_PRIMES[0]))
                        ^ (cu[:, 1] * jnp.uint32(_PRIMES[1]))
                    ) % jnp.uint32(rows)
                    idx = idx.astype(jnp.int32)
                w = jnp.where(dx, frac[:, 0], 1.0 - frac[:, 0]) * jnp.where(
                    dy, frac[:, 1], 1.0 - frac[:, 1]
                )
                level_feat = level_feat + w[:, None] * jnp.take(
                    table, idx, axis=0
                )
        feats.append(level_feat)
    return jnp.concatenate(feats, axis=-1)


def image_forward(params, pos: jnp.ndarray, config: Image2DConfig):
    enc = hash2d_encode(params["tables"], pos, config)
    return apply_mlp(params["mlp"], enc)


def _bilinear_fetch(img: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Bilinear target at continuous uv (testbed_image.cu eval_image)."""
    h, w = img.shape[:2]
    x = pos[:, 0] * (w - 1)
    y = pos[:, 1] * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )


@partial(jax.jit, static_argnames=("config",),
         donate_argnames=("params", "opt_state"))
def image_fit_step(params, opt_state, key, image, config: Image2DConfig):
    import optax

    pos = jax.random.uniform(key, (config.batch_size, 2))
    target = _bilinear_fetch(image, pos)

    def loss_fn(p):
        pred = image_forward(p, pos, config)
        # tcnn RelativeL2 (the image mode's default loss)
        return jnp.mean(
            (pred - target) ** 2 / (jax.lax.stop_gradient(pred) ** 2 + 1e-2)
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    tx = make_image_optimizer(config)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_image_optimizer(config: Image2DConfig):
    import optax

    return optax.adam(config.lr, b1=0.9, b2=0.99, eps=1e-15)


def render_image_fit(params, config: Image2DConfig, resolution):
    """Evaluate the fitted network over the full pixel grid -> (H, W, 3)."""
    w, h = resolution
    u = (jnp.arange(w) + 0.5) / w
    v = (jnp.arange(h) + 0.5) / h
    uu, vv = jnp.meshgrid(u, v)
    pos = jnp.stack([uu.ravel(), vv.ravel()], axis=-1)
    out = []
    chunk = 1 << 16
    for i in range(0, pos.shape[0], chunk):
        out.append(image_forward(params, pos[i : i + chunk], config))
    return jnp.concatenate(out).reshape(h, w, 3)


def fit_image(
    image: np.ndarray,
    n_steps: int = 1000,
    config: Image2DConfig | None = None,
    seed: int = 0,
    verbose: bool = True,
):
    """Fit rgb(x, y) to an (H, W, 3) float image; returns (params, psnr)."""
    from neus2_tpu.ops.image import psnr

    config = config or Image2DConfig()
    img = jnp.asarray(image[..., :3], jnp.float32)
    params = init_image_params(jax.random.PRNGKey(seed), config)
    opt_state = make_image_optimizer(config).init(params)
    key = jax.random.PRNGKey(seed + 1)
    for step in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = image_fit_step(
            params, opt_state, k, img, config
        )
        if verbose and (step + 1) % 200 == 0:
            print(f"image-fit step {step + 1}: loss {float(loss):.3e}",
                  flush=True)
    h, w = image.shape[:2]
    recon = render_image_fit(params, config, (w, h))
    return params, float(psnr(recon, img))
