"""Image quality metrics: PSNR and SSIM.

Mirrors the reference eval protocol (reference: scripts/common.py:46 mse2psnr,
scripts/common.py:201-266 SSIM with an 11x11 Gaussian window, and
scripts/run.py:264-344): PSNR = -10*log10(MSE) on clipped sRGB renders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """PSNR for images in [0, 1]."""
    return -10.0 * jnp.log10(jnp.maximum(mse(a, b), 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair, 11x11 Gaussian window."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    kernel = _gaussian_kernel()
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]

    def filt(img):
        # Depthwise valid convolution per channel.
        img_nchw = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
        k = kernel[None, None]
        out = jax.lax.conv_general_dilated(
            img_nchw, k, window_strides=(1, 1), padding="VALID"
        )
        return jnp.moveaxis(out[:, 0], 0, -1)

    mu_a = filt(a)
    mu_b = filt(b)
    mu_a2 = mu_a * mu_a
    mu_b2 = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_a2 = filt(a * a) - mu_a2
    sigma_b2 = filt(b * b) - mu_b2
    sigma_ab = filt(a * b) - mu_ab
    num = (2.0 * mu_ab + c1) * (2.0 * sigma_ab + c2)
    den = (mu_a2 + mu_b2 + c1) * (sigma_a2 + sigma_b2 + c2)
    return jnp.mean(num / den)


def srgb_eval_target(tex: jnp.ndarray) -> jnp.ndarray:
    """Premultiplied-linear RGBA texels -> the sRGB-on-black eval target.

    The eval protocol (reference scripts/run.py:299-320) compares renders to
    GT with linear->sRGB applied to the un-premultiplied color, then
    re-premultiplied over a black background.  Every PSNR/SSIM call site must
    use this one transform or metrics silently diverge."""
    from neus2_tpu.ops.losses import linear_to_srgb

    a = tex[..., 3:4]
    return jnp.where(
        a > 0, linear_to_srgb(tex[..., :3] / jnp.where(a > 0, a, 1.0)) * a, 0.0
    )


def sharpen_images(images, amount: float):
    """The reference's load-time unsharp filter on (N, H, W, C) images
    (reference sharpen kernel, nerf_loader.cu:103-123, 808-825):
    out = max(0, (center_w * p - left - up - right - down) / (center_w - 4))
    with center_w = 4 + 1/amount (5 = strong ... inf = none).  Edge pixels
    clamp per-axis (the reference's flat-index arithmetic wraps rows at the
    border — a quirk, not a contract).  numpy in / numpy out (host-side,
    applied once at load)."""
    import numpy as np

    if amount <= 0.0:
        return images
    center_w = 4.0 + 1.0 / amount
    p = np.pad(
        images.astype(np.float32), ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="edge",
    )
    out = (
        center_w * images
        - p[:, :-2, 1:-1]
        - p[:, 2:, 1:-1]
        - p[:, 1:-1, :-2]
        - p[:, 1:-1, 2:]
    ) * (1.0 / (center_w - 4.0))
    return np.maximum(out, 0.0).astype(images.dtype)
