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

def sharpness_maps(
    images, resolution: tuple[int, int] = (128, 72)
) -> "np.ndarray":
    """Per-image variance-of-Laplacian sharpness grids (host, load time).

    The reference computes these once at dataset load (compute_sharpness,
    nerf_loader.cu:129-169: rec.709 luma, 4-neighbor Laplacian over the
    image interior, per-cell variance on a 128x72 grid with the cell's
    pixel range x1 = x*W/rs clamped to [1, W-2]) and consumes them in the
    error-map deposit when include_sharpness_in_error is on
    (testbed_nerf.cu:1748-1756).  Vectorized with integral images.

    ``images``: (N, H, W, C>=3) float array-like.  Returns (N, rh, rw)
    float32 where (rw, rh) = resolution.
    """
    import numpy as np

    imgs = np.asarray(images, np.float32)
    n, h, w = imgs.shape[:3]
    rw, rh = resolution
    lum = (
        imgs[..., 0] * 0.2126 + imgs[..., 1] * 0.7152 + imgs[..., 2] * 0.0722
    )
    # 4-neighbor Laplacian on the interior (the reference never reads
    # outside [1, dim-2]).
    lap = np.zeros_like(lum)
    lap[:, 1:-1, 1:-1] = (
        4.0 * lum[:, 1:-1, 1:-1]
        - lum[:, :-2, 1:-1]
        - lum[:, 2:, 1:-1]
        - lum[:, 1:-1, :-2]
        - lum[:, 1:-1, 2:]
    )
    # integral images over (lap, lap^2): cell sums in O(1) per cell
    ii = np.zeros((n, h + 1, w + 1), np.float64)
    ii2 = np.zeros((n, h + 1, w + 1), np.float64)
    ii[:, 1:, 1:] = lap.cumsum(1).cumsum(2)
    ii2[:, 1:, 1:] = (lap * lap).cumsum(1).cumsum(2)

    xs = np.arange(rw + 1) * w // rw
    ys = np.arange(rh + 1) * h // rh
    x1 = np.maximum(xs[:-1], 1)
    x2 = np.minimum(xs[1:], w - 2)
    y1 = np.maximum(ys[:-1], 1)
    y2 = np.minimum(ys[1:], h - 2)

    def rect(a):
        # (N, rh, rw) sums of a over [y1:y2) x [x1:x2)
        return (
            a[:, y2[:, None], x2[None, :]]
            - a[:, y1[:, None], x2[None, :]]
            - a[:, y2[:, None], x1[None, :]]
            + a[:, y1[:, None], x1[None, :]]
        )

    cnt = np.maximum(
        (y2 - y1)[:, None] * (x2 - x1)[None, :], 1
    ).astype(np.float64)
    m = rect(ii) / cnt
    m2 = rect(ii2) / cnt
    return np.maximum(m2 - m * m, 0.0).astype(np.float32)
