"""Real spherical-harmonics direction encoding, degrees 1..8.

Standard hardcoded real SH basis (recurrences from Sloan, "Stupid SH Tricks",
appendix A1) with the same convention as the reference encoder
(reference: dependencies/my_tcnn/include/tiny-cuda-nn/encodings/spherical_harmonics.h):
the input direction is *warped* into [0,1]^3 and unwarped internally via
x = 2*in - 1.  Fully differentiable jnp; autodiff replaces the reference's
hand-written backward kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode(dirs_warped: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the SH basis. dirs_warped (..., 3) in [0,1] -> (..., degree**2)."""
    if not 1 <= degree <= 8:
        raise ValueError(f"SH degree must be in [1, 8], got {degree}")
    d = dirs_warped * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
    x6, y6, z6 = x4 * x2, y4 * y2, z4 * z2
    one = jnp.ones_like(x)

    out = [0.28209479177387814 * one]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    if degree >= 5:
        out += [
            2.5033429417967046 * xy * (x2 - y2),
            1.7701307697799304 * yz * (-3.0 * x2 + y2),
            0.94617469575756008 * xy * (7.0 * z2 - 1.0),
            0.66904654355728921 * yz * (3.0 - 7.0 * z2),
            -3.1735664074561294 * z2 + 3.7024941420321507 * z4 + 0.31735664074561293,
            0.66904654355728921 * xz * (3.0 - 7.0 * z2),
            0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
            1.7701307697799304 * xz * (-x2 + 3.0 * y2),
            -3.7550144126950569 * x2 * y2 + 0.62583573544917614 * x4 + 0.62583573544917614 * y4,
        ]
    if degree >= 6:
        out += [
            0.65638205684017015 * y * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            8.3026492595241645 * xy * z * (x2 - y2),
            -0.48923829943525038 * y * (3.0 * x2 - y2) * (9.0 * z2 - 1.0),
            4.7935367849733241 * xy * z * (3.0 * z2 - 1.0),
            0.45294665119569694 * y * (14.0 * z2 - 21.0 * z4 - 1.0),
            0.1169503224534236 * z * (-70.0 * z2 + 63.0 * z4 + 15.0),
            0.45294665119569694 * x * (14.0 * z2 - 21.0 * z4 - 1.0),
            2.3967683924866621 * z * (x2 - y2) * (3.0 * z2 - 1.0),
            -0.48923829943525038 * x * (x2 - 3.0 * y2) * (9.0 * z2 - 1.0),
            2.0756623148810411 * z * (-6.0 * x2 * y2 + x4 + y4),
            0.65638205684017015 * x * (10.0 * x2 * y2 - x4 - 5.0 * y4),
        ]
    if degree >= 7:
        out += [
            1.3663682103838286 * xy * (-10.0 * x2 * y2 + 3.0 * x4 + 3.0 * y4),
            2.3666191622317521 * yz * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            2.0182596029148963 * xy * (x2 - y2) * (11.0 * z2 - 1.0),
            -0.92120525951492349 * yz * (3.0 * x2 - y2) * (11.0 * z2 - 3.0),
            0.92120525951492349 * xy * (-18.0 * z2 + 33.0 * z4 + 1.0),
            0.58262136251873131 * yz * (30.0 * z2 - 33.0 * z4 - 5.0),
            6.6747662381009842 * z2 - 20.024298714302954 * z4 + 14.684485723822165 * z6 - 0.31784601133814211,
            0.58262136251873131 * xz * (30.0 * z2 - 33.0 * z4 - 5.0),
            0.46060262975746175 * (x2 - y2) * (11.0 * z2 * (3.0 * z2 - 1.0) - 7.0 * z2 + 1.0),
            -0.92120525951492349 * xz * (x2 - 3.0 * y2) * (11.0 * z2 - 3.0),
            0.50456490072872406 * (11.0 * z2 - 1.0) * (-6.0 * x2 * y2 + x4 + y4),
            2.3666191622317521 * xz * (10.0 * x2 * y2 - x4 - 5.0 * y4),
            10.247761577878714 * x2 * y4 - 10.247761577878714 * x4 * y2 + 0.6831841051919143 * x6 - 0.6831841051919143 * y6,
        ]
    if degree >= 8:
        out += [
            0.70716273252459627 * y * (-21.0 * x2 * y4 + 35.0 * x4 * y2 - 7.0 * x6 + y6),
            5.2919213236038001 * xy * z * (-10.0 * x2 * y2 + 3.0 * x4 + 3.0 * y4),
            -0.51891557872026028 * y * (13.0 * z2 - 1.0) * (-10.0 * x2 * y2 + 5.0 * x4 + y4),
            4.1513246297620823 * xy * z * (x2 - y2) * (13.0 * z2 - 3.0),
            -0.15645893386229404 * y * (3.0 * x2 - y2) * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            0.44253269244498261 * xy * z * (-110.0 * z2 + 143.0 * z4 + 15.0),
            0.090331607582517306 * y * (-135.0 * z2 + 495.0 * z4 - 429.0 * z6 + 5.0),
            0.068284276912004949 * z * (315.0 * z2 - 693.0 * z4 + 429.0 * z6 - 35.0),
            0.090331607582517306 * x * (-135.0 * z2 + 495.0 * z4 - 429.0 * z6 + 5.0),
            0.07375544874083044 * z * (x2 - y2) * (143.0 * z2 * (3.0 * z2 - 1.0) - 187.0 * z2 + 45.0),
            -0.15645893386229404 * x * (x2 - 3.0 * y2) * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            1.0378311574405206 * z * (13.0 * z2 - 3.0) * (-6.0 * x2 * y2 + x4 + y4),
            -0.51891557872026028 * x * (13.0 * z2 - 1.0) * (-10.0 * x2 * y2 + x4 + 5.0 * y4),
            2.6459606618019 * z * (15.0 * x2 * y4 - 15.0 * x4 * y2 + x6 - y6),
            0.70716273252459627 * x * (-35.0 * x2 * y4 + 21.0 * x4 * y2 - x6 + 7.0 * y6),
        ]
    return jnp.stack(out, axis=-1)


def sh_output_dim(degree: int) -> int:
    return degree * degree


# ---------------------------------------------------------------------------
# The remaining small tcnn encodings (reference my_tcnn encodings/: Frequency,
# HannWindowFrequency [MOD], OneBlob, TriangleWave, Identity) — trivially
# differentiable jnp; available for composite encodings / the image testbed.
# ---------------------------------------------------------------------------


def frequency_encode(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """NeRF positional encoding: [sin,cos](2^k pi x) (frequency.h)."""
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=x.dtype) * jnp.pi
    ang = x[..., None] * freqs  # (..., D, K)
    out = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(*x.shape[:-1], -1)


def hann_window_frequency_encode(
    x: jnp.ndarray, n_frequencies: int, alpha: jnp.ndarray | float
) -> jnp.ndarray:
    """Frequency encoding with a Hann annealing window over bands
    (reference [MOD] HannWindowFrequency; BARF-style coarse-to-fine):
    band k is weighted by 0.5*(1-cos(pi*clip(alpha-k, 0, 1)))."""
    k = jnp.arange(n_frequencies, dtype=x.dtype)
    w = 0.5 * (1.0 - jnp.cos(jnp.pi * jnp.clip(jnp.asarray(alpha) - k, 0.0, 1.0)))
    freqs = 2.0**k * jnp.pi
    ang = x[..., None] * freqs
    out = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1) * w[None, :, None]
    return out.reshape(*x.shape[:-1], -1)


def oneblob_encode(x: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """OneBlob encoding (oneblob.h): per-dim Gaussian blob over n_bins."""
    centers = (jnp.arange(n_bins, dtype=x.dtype) + 0.5) / n_bins
    sigma = 1.0 / n_bins
    d = x[..., None] - centers
    out = jnp.exp(-0.5 * (d / sigma) ** 2) / (sigma * jnp.sqrt(2.0 * jnp.pi))
    return out.reshape(*x.shape[:-1], -1) / n_bins


def trianglewave_encode(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """TriangleWave encoding (triangle_wave.h): cheap periodic sawtooth-tri."""
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=x.dtype)
    v = x[..., None] * freqs
    tri = jnp.abs(2.0 * (v - jnp.floor(v + 0.5)))
    return tri.reshape(*x.shape[:-1], -1)
