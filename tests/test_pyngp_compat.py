"""pyngp scripting-surface compatibility (reference python_api.cu:317-616).

Covers the attributes/methods the reference's own driver scripts
(scripts/run.py, scripts/run_dynamic.py) touch: shall_train, loss scalars,
background_color, nerf.training.*, nerf.*, fov / camera control, the
positional render(width, height, spp, linear) form, change_to_frame,
reload_network_from_file, n_params.
"""

import json

import numpy as np
import pytest

from neus2_tpu.api.compat import sharpen_images
from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine.train import TrainConfig
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig


def tiny_config(**kw) -> TrainConfig:
    return TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=4, log2_hashmap_size=12, base_resolution=16,
                per_level_scale=1.4,
            ),
            sdf_hidden_dim=16,
            rgb_hidden_dim=16,
        ),
        n_rays=128,
        samples_per_ray=16,
        n_candidates=48,
        occ_n_probe=1 << 12,
        **kw,
    )


@pytest.fixture(scope="module")
def tb():
    tb = Testbed(
        config=tiny_config(), hyper=Hyperparams(first_frame_max_training_step=5)
    )
    tb.load_training_data_from_datasets([make_sphere_dataset(4, 24)])
    while tb.frame():
        pass
    return tb


def test_shall_train_and_loss_scalars(tb):
    assert tb.shall_train is True
    tb.shall_train = False
    assert tb.m_train is False and tb.frame() is False
    tb.shall_train = True
    assert tb.loss == tb.loss_scalar
    assert tb.ek_loss == tb.ek_loss_scalar
    assert tb.mask_loss == tb.mask_loss_scalar


def test_hyperparam_passthrough(tb):
    tb.first_frame_max_training_step = 7
    assert tb.hyper.first_frame_max_training_step == 7
    tb.next_frame_max_training_step = 9
    assert tb.hyper.next_frame_max_training_step == 9
    tb.first_frame_max_training_step = 5  # restore for other tests


def test_nerf_training_view(tb):
    assert tb.nerf.training.n_images_for_training == 4
    tb.nerf.training.random_bg_color = False
    assert tb.config.random_bg is False
    tb.nerf.training.random_bg_color = True
    tb.nerf.training.near_distance = 0.2
    assert tb.config.near == 0.2
    tb.nerf.training.near_distance = 0.0
    tb.nerf.training.depth_supervision_lambda = 0.5
    assert tb.config.depth_supervision_lambda == 0.5
    tb.nerf.training.depth_supervision_lambda = 0.0
    tb.nerf.training.optimize_extrinsics = True
    assert tb.config.optimize_extrinsics is True
    tb.nerf.training.optimize_extrinsics = False


def test_nerf_view(tb):
    tb.nerf.cone_angle_constant = 1.0 / 128.0
    assert tb.config.cone_angle_constant == 1.0 / 128.0
    tb.nerf.cone_angle_constant = 1.0 / 256.0
    tb.nerf.rendering_min_transmittance = 1e-3
    assert tb.rendering_min_transmittance == 1e-3
    assert tb._default_render_cfg().min_transmittance == 1e-3
    tb.nerf.rendering_min_transmittance = 1e-4
    tb.nerf.render_with_camera_distortion = False
    assert tb._render_cameras().distortion is None
    tb.nerf.render_with_camera_distortion = True


def test_sharpen_filter_math():
    # Constant images are fixed points of the reference's unsharp stencil
    # ((center_w - 4) * c / (center_w - 4) = c, nerf_loader.cu:103-123).
    const = np.full((1, 6, 6, 4), 0.25, np.float32)
    np.testing.assert_allclose(sharpen_images(const, 0.3), const, atol=1e-6)
    # An impulse is amplified by center_w * amount = 4*s + 1.
    imp = np.zeros((1, 5, 5, 4), np.float32)
    imp[0, 2, 2] = 1.0
    s = 0.5
    out = sharpen_images(imp, s)
    assert out[0, 2, 2, 0] == pytest.approx(4 * s + 1, rel=1e-5)
    # Neighbors would go negative and clamp to 0.
    assert out[0, 2, 1, 0] == 0.0


def test_sharpen_setter_refreshes_images(tb):
    before = np.asarray(tb.images)
    tb.nerf.sharpen = 0.5
    after = np.asarray(tb.images)
    assert not np.allclose(before, after)
    tb.nerf.sharpen = 0.0
    np.testing.assert_allclose(np.asarray(tb.images), before)


def test_n_params(tb):
    assert tb.n_params > tb.n_encoding_params > 0
    table = tb.state.params["hashgrid"]
    import jax

    n_tab = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(table))
    assert tb.n_encoding_params == n_tab


def test_fov_and_training_view_camera(tb):
    tb.set_camera_to_training_view(0)
    # fov must reproduce view 0's pixel focal at the dataset resolution.
    W, H = tb.dataset.resolution
    f = np.asarray(tb.cameras.focal[0])
    expect_fov_y = np.degrees(2 * np.arctan2(0.5 * H, f[1]))
    assert tb.fov_axis == 1
    assert tb.fov == pytest.approx(float(expect_fov_y), rel=1e-5)
    got = tb._focal_for((W, H))
    np.testing.assert_allclose(got, f, rtol=1e-5)
    # Isotropic fov setter: focal derived from the fov_axis side.
    tb.fov = 90.0
    np.testing.assert_allclose(
        tb._focal_for((64, 32)), [16.0, 16.0], rtol=1e-5
    )
    tb.fov_xy = (90.0, 90.0)
    np.testing.assert_allclose(
        tb._focal_for((64, 32)), [32.0, 16.0], rtol=1e-5
    )
    tb._fov_deg = None  # restore dataset-driven fov


def test_set_nerf_camera_matrix(tb):
    from neus2_tpu.data.dataset import nerf_matrix_to_ngp

    mat = np.eye(4, dtype=np.float32)
    mat[:3, 3] = [0.1, -0.2, 0.3]
    tb.set_nerf_camera_matrix(mat)
    expect = nerf_matrix_to_ngp(
        mat, tb.dataset.scale, np.asarray(tb.dataset.offset, np.float32),
        tb.dataset.from_na,
    )
    np.testing.assert_allclose(tb._render_pose, expect)
    tb._render_pose = None


def test_pyngp_render_form(tb):
    tb.set_camera_to_training_view(0)
    tb.background_color = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    img = tb.render(32, 24, 2, True)  # (width, height, spp, linear)
    assert img.shape == (24, 32, 4)
    assert np.isfinite(img).all()
    srgb = tb.render(32, 24, 2, False)
    # linear=True output is darker than sRGB-encoded (gamma > 1) wherever lit.
    lit = srgb[..., :3] > 0.05
    assert lit.any()
    assert (img[..., :3][lit] <= srgb[..., :3][lit] + 1e-6).all()
    # img_idx form is unchanged.
    rgb, depth, alpha = tb.render(img_idx=0, spp=1)
    assert rgb.shape[-1] == 3 and depth.ndim == 2


def test_change_to_frame_and_reload(tb, tmp_path):
    tb.change_to_frame(0)
    assert tb.current_training_time_frame == 0
    cfg_json = {
        "encoding": {"n_levels": 3, "log2_hashmap_size": 11,
                     "base_resolution": 16, "per_level_scale": 1.4},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
        "rgb_network": {"n_neurons": 16, "n_hidden_layers": 2},
    }
    p = tmp_path / "net.json"
    p.write_text(json.dumps(cfg_json))
    tb.reload_network_from_file(p)
    assert tb.config.field.grid.n_levels == 3
    assert tb.training_step == 0
    assert tb.state is not None and tb.n_encoding_params > 0
