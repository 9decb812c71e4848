"""Loader parity round 2: camera distortion + depth maps (VERDICT items).

Reference contract: k1/k2/p1/p2 parsed from the json root and applied by
iterative undistortion in ray generation (nerf_loader.cu:397-425,
common_device.cuh:142-283); uint16 depth images scaled by
integer_depth_scale * scene_scale feed the depth-supervision loss
(nerf_loader.cu:91-98, 599-607, 736)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.engine.rays import (
    Cameras,
    apply_camera_distortion,
    iterative_undistortion,
    pixel_to_ray,
)

PARAMS = jnp.array([-0.12, 0.03, 0.004, -0.002], jnp.float32)


def test_undistortion_inverts_distortion():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.6, 0.6, 256), jnp.float32)
    y = jnp.asarray(rng.uniform(-0.6, 0.6, 256), jnp.float32)
    du, dv = apply_camera_distortion(PARAMS, x, y)
    xu, yu = iterative_undistortion(PARAMS, x + du, y + dv)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(y), atol=1e-5)


def test_zero_distortion_identity():
    z = jnp.zeros(4)
    x = jnp.linspace(-0.5, 0.5, 17)
    xu, yu = iterative_undistortion(z, x, x)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-7)


def test_pixel_to_ray_distorted_matches_ideal():
    """A camera observing through a distorting lens: the ray built from the
    DISTORTED pixel of a 3D point must pass through that point."""
    pose = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [0.0]])], 1)[None]
    w = h = 100
    focal = jnp.full((1, 2), 120.0)
    principal = jnp.full((1, 2), 0.5)

    # A 3D point at camera coords (x, y, 1); its ideal normalized coords.
    pt = jnp.array([0.3, -0.2, 1.0])
    x_ideal, y_ideal = pt[0], pt[1]
    du, dv = apply_camera_distortion(PARAMS, x_ideal, y_ideal)
    # The lens maps the ideal direction to distorted sensor coords.
    u_pix = (x_ideal + du) * focal[0, 0] / w + principal[0, 0]
    v_pix = (y_ideal + dv) * focal[0, 1] / h + principal[0, 1]

    cams = Cameras(
        poses=pose, focal=focal, principal=principal, resolution=(w, h),
        distortion=PARAMS,
    )
    _, dirs = pixel_to_ray(
        cams, jnp.zeros((1,), jnp.int32), jnp.array([[u_pix, v_pix]])
    )
    d = dirs[0] / dirs[0, 2]
    np.testing.assert_allclose(np.asarray(d[:2]), np.asarray(pt[:2]), atol=1e-4)


def _write_scene(tmp_path: Path, with_depth: bool, with_distortion: bool):
    import imageio.v2 as imageio

    h = w = 32
    rng = np.random.default_rng(1)
    frames = []
    for i in range(2):
        img = (rng.uniform(0, 1, (h, w, 4)) * 255).astype(np.uint8)
        img[..., 3] = 255
        imageio.imwrite(tmp_path / f"im{i}.png", img)
        frame = {
            "file_path": f"im{i}.png",
            "transform_matrix": np.eye(4)[:3].tolist() if i == 0 else
                np.concatenate([np.eye(3), [[0.1], [0], [0]]], 1).tolist(),
            "intrinsic_matrix": [[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]],
        }
        if with_depth:
            depth = (rng.uniform(100, 4000, (h, w))).astype(np.uint16)
            imageio.imwrite(tmp_path / f"d{i}.png", depth)
            frame["depth_path"] = f"d{i}.png"
        frames.append(frame)
    meta = {
        "from_na": True,
        "scale": 0.5,
        "offset": [0.5, 0.5, 0.5],
        "aabb_scale": 1,
        "frames": frames,
    }
    if with_depth:
        meta["integer_depth_scale"] = 1.0 / 1000.0
    if with_distortion:
        meta.update({"k1": -0.1, "k2": 0.01, "p1": 0.001, "p2": -0.001})
    path = tmp_path / "transforms.json"
    with open(path, "w") as f:
        json.dump(meta, f)
    return path


def test_loader_reads_distortion_and_depth(tmp_path):
    from neus2_tpu.data.dataset import load_dataset

    path = _write_scene(tmp_path, with_depth=True, with_distortion=True)
    ds = load_dataset(path)
    np.testing.assert_allclose(
        ds.distortion, [-0.1, 0.01, 0.001, -0.001], atol=1e-7
    )
    assert ds.depths is not None and ds.depths.shape == (2, 32, 32)
    # uint16 * integer_depth_scale * scene scale.
    assert 0.04 < ds.depths.mean() < 1.1
    cams = ds.cameras()
    assert cams.distortion is not None


def test_depth_supervision_reachable_from_testbed(tmp_path):
    """Depth maps flow from the loader through Testbed.train into the loss
    (round-1 gap: the loss existed but nothing ever fed it)."""
    import dataclasses

    from neus2_tpu.api.testbed import Hyperparams, Testbed
    from neus2_tpu.engine.train import TrainConfig
    from neus2_tpu.models.field import FieldConfig
    from neus2_tpu.ops.hashgrid import HashGridConfig

    path = _write_scene(tmp_path, with_depth=True, with_distortion=False)
    cfg = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                base_resolution=8, per_level_scale=1.5),
            sdf_hidden_dim=16,
            rgb_hidden_dim=16,
        ),
        n_rays=64,
        samples_per_ray=8,
        n_candidates=24,
        occ_n_probe=1 << 10,
        depth_supervision_lambda=0.5,
    )
    tb = Testbed(config=cfg, hyper=Hyperparams(first_frame_max_training_step=3))
    tb.load_training_data(path)
    assert tb.depths is not None
    while tb.frame():
        pass
    assert np.isfinite(tb.loss_scalar)


def test_render_image_uses_lens_distortion():
    """Eval renders must cast the dataset's distorted-camera rays
    (reference init_rays_from_camera applies the identical lens model,
    testbed_nerf.cu:2208-2331) — a pinhole render against distortion-
    captured GT is geometrically misaligned."""
    from neus2_tpu.data.synthetic import make_sphere_dataset
    from neus2_tpu.engine.render import RenderConfig, render_image
    from neus2_tpu.engine.train import TrainConfig, init_train_state
    from neus2_tpu.models.field import FieldConfig
    from neus2_tpu.ops.hashgrid import HashGridConfig

    cfg = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(n_levels=3, log2_hashmap_size=10,
                                base_resolution=8, per_level_scale=1.5),
            sdf_hidden_dim=16, rgb_hidden_dim=16,
        ),
        n_rays=32, samples_per_ray=8, n_candidates=16, occ_n_probe=1 << 9,
    )
    ds = make_sphere_dataset(n_views=2, resolution=24)
    state = init_train_state(jax.random.PRNGKey(0), cfg, n_images=2)
    from neus2_tpu.engine.train import occupancy_update

    state = occupancy_update(state, cfg)
    rcfg = RenderConfig(field=cfg.field, samples_per_ray=8, n_candidates=16,
                        chunk=24 * 24)

    def render(cams):
        img, depth, alpha = render_image(
            state.ema_params, state.acc, state.occupancy, cams,
            cams.poses[0], cams.focal[0], cams.principal[0],
            jax.random.PRNGKey(0), rcfg, spp=1,
        )
        return np.asarray(alpha)

    pin = ds.cameras()
    dist = pin._replace(distortion=PARAMS)
    a0, a1 = render(pin), render(dist)
    # The sphere silhouette must shift under the lens model.
    assert a0.shape == a1.shape and not np.allclose(a0, a1)


# ---------------------------------------------------------------------------
# FTheta fisheye lens mode (reference common.h:172, common_device.cuh:231-243,
# nerf_loader.cu:448-457)
# ---------------------------------------------------------------------------

# Synthetic equidistant-ish fisheye intrinsics: alpha ~ 2.2e-3 * r_pix with
# mild higher-order terms; 800x600 intrinsics scale.
FTHETA = np.array([0.0, 2.2e-3, 1e-7, -3e-11, 0.0, 800.0, 600.0], np.float32)


def test_ftheta_roundtrip_polynomial():
    """dir from ftheta_undistortion must satisfy the defining polynomial:
    polar angle == p(r) and azimuth == pixel offset direction."""
    from neus2_tpu.engine.rays import ftheta_undistortion

    rng = np.random.default_rng(0)
    duv = (rng.uniform(-0.45, 0.45, size=(256, 2))).astype(np.float32)
    d, valid = ftheta_undistortion(jnp.asarray(FTHETA), jnp.asarray(duv))
    d, valid = np.asarray(d), np.asarray(valid)
    xpix = duv[:, 0] * FTHETA[5]
    ypix = duv[:, 1] * FTHETA[6]
    r = np.hypot(xpix, ypix)
    p = FTHETA
    alpha = p[0] + r * (p[1] + r * (p[2] + r * (p[3] + r * p[4])))
    ok = valid & (r > 1e-6)
    assert ok.sum() > 200
    # polar angle of the returned direction
    got_alpha = np.arctan2(np.hypot(d[ok, 0], d[ok, 1]), d[ok, 2])
    np.testing.assert_allclose(got_alpha, alpha[ok], atol=1e-5)
    # azimuth preserved: (dx, dy) parallel to (xpix, ypix)
    cross = d[ok, 0] * ypix[ok] - d[ok, 1] * xpix[ok]
    np.testing.assert_allclose(cross, 0.0, atol=1e-4)


def test_ftheta_invalid_pixels_get_sentinel_origin():
    """Past the valid field (cos(alpha) <= 0) the ray must be un-renderable:
    the reference returns an outside-the-aabb origin
    (common_device.cuh:265-269)."""
    from neus2_tpu.engine.rays import Cameras, pixel_to_ray

    # strong lens: alpha = 0.005 * r -> r > ~314 pix is past 90 deg
    params = np.array([0.0, 5e-3, 0, 0, 0, 800.0, 600.0], np.float32)
    poses = np.eye(4)[None, :3, :].astype(np.float32)
    cams = Cameras(
        poses=jnp.asarray(poses),
        focal=jnp.full((1, 2), 400.0),
        principal=jnp.full((1, 2), 0.5),
        resolution=(800, 600),
        ftheta=jnp.asarray(params),
    )
    uv = jnp.asarray([[0.5 + 0.45, 0.5], [0.5 + 0.05, 0.5]], jnp.float32)
    o, d = pixel_to_ray(cams, jnp.zeros((2,), jnp.int32), uv)
    o = np.asarray(o)
    assert o[0, 0] == 1000.0  # 0.45*800 = 360 pix -> alpha 1.8 rad, invalid
    assert np.allclose(o[1], [0, 0, 0])  # valid pixel keeps the pose origin
    # valid direction: forward-ish (+z in camera = identity world)
    assert np.asarray(d)[1, 2] > 0.9


def test_loader_reads_ftheta(tmp_path):
    import imageio.v2 as imageio

    from neus2_tpu.data.dataset import load_dataset

    img = (np.random.default_rng(0).uniform(size=(8, 8, 4)) * 255).astype(
        np.uint8
    )
    imageio.imwrite(tmp_path / "im0.png", img)
    meta = {
        "fl_x": 4.0, "fl_y": 4.0, "cx": 4.0, "cy": 4.0, "w": 8, "h": 8,
        "ftheta_p0": 0.0, "ftheta_p1": 2e-3, "ftheta_p2": 0.0,
        "ftheta_p3": 0.0, "ftheta_p4": 0.0,
        # distortion keys too: ftheta must take precedence
        # (assigned last in nerf_loader.cu:448-457)
        "k1": 0.1, "k2": 0.0, "p1": 0.0, "p2": 0.0,
        "frames": [
            {"file_path": "im0.png",
             "transform_matrix": np.eye(4).tolist()}
        ],
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    ds = load_dataset(tmp_path / "transforms.json")
    assert ds.ftheta is not None
    np.testing.assert_allclose(
        ds.ftheta, [0.0, 2e-3, 0, 0, 0, 8.0, 8.0]
    )
    cams = ds.cameras()
    assert cams.ftheta is not None and cams.distortion is None
