"""Image-fit testbed mode (engine/image_mode.py; reference
src/testbed_image.cu:220)."""

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.engine import image_mode


def _target_image(n=96):
    """Smooth + edge content: radial gradient with a hard quadrant flip."""
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) / (n - 1)
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2)
    img = np.stack([x, y, np.clip(1.5 * r, 0, 1)], -1)
    img[(x > 0.5) & (y > 0.5)] = 1.0 - img[(x > 0.5) & (y > 0.5)]
    return img.astype(np.float32)


def test_hash2d_dense_and_hashed_levels():
    cfg = image_mode.Image2DConfig(
        n_levels=4, log2_hashmap_size=8, base_resolution=4,
        per_level_scale=4.0,
    )
    tabs = cfg.level_tables()
    # dense while res^2 fits, hashed (capped) after
    assert tabs[0][1] == ((tabs[0][0] ** 2 + 7) // 8) * 8
    assert tabs[-1][1] == 1 << 8
    params = image_mode.init_image_params(jax.random.PRNGKey(0), cfg)
    pos = jnp.asarray(np.random.default_rng(0).uniform(size=(64, 2)),
                      jnp.float32)
    enc = image_mode.hash2d_encode(params["tables"], pos, cfg)
    assert enc.shape == (64, 4 * cfg.n_features_per_level)
    assert np.all(np.isfinite(np.asarray(enc)))


def test_image_fit_converges():
    img = _target_image()
    cfg = image_mode.Image2DConfig(
        n_levels=6, log2_hashmap_size=12, base_resolution=4,
        per_level_scale=2.0, hidden_dim=32, n_hidden=2,
        batch_size=4096, lr=5e-3,
    )
    params, psnr = image_mode.fit_image(
        img, n_steps=400, config=cfg, verbose=False
    )
    assert psnr > 26.0, psnr
    # reconstruction resolves the hard quadrant edge
    recon = np.asarray(
        image_mode.render_image_fit(params, cfg, (96, 96))
    )
    assert abs(recon[80, 80, 0] - img[80, 80, 0]) < 0.15
