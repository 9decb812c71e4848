"""Native z-buffer mesh rasterizer (native/mesh_raster.cpp) — the analog of
the reference's eval-time pytorch3d mesh renders (render_utils.py:418-421,
run.py --shaded_mesh)."""

import numpy as np

from neus2_tpu.native import render_mesh_image

# A unit quad facing the camera at camera-space z=2 (identity pose).
QUAD_V = np.array(
    [[-0.5, -0.5, 2], [0.5, -0.5, 2], [0.5, 0.5, 2], [-0.5, 0.5, 2]],
    np.float32,
)
QUAD_F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
POSE = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)


def test_normal_map_and_depth():
    rgb, depth = render_mesh_image(
        QUAD_V, QUAD_F, POSE, (100, 100), (0.5, 0.5), (64, 64)
    )
    # Quad normal faces the camera: world normal (0,0,-1) -> color (.5,.5,0)
    np.testing.assert_allclose(rgb[32, 32], [0.5, 0.5, 0.0], atol=1e-5)
    np.testing.assert_allclose(depth[32, 32], 2.0, atol=1e-4)
    # Projected extent: 100 * 0.5 / 2 = 25 px around center (32,32)
    assert depth[32, 32 + 24] > 0 and depth[32, 32 + 27] == 0
    # Background untouched
    assert rgb[2, 2].max() == 0 and depth[2, 2] == 0


def test_shaded_headlight():
    rgb, _ = render_mesh_image(
        QUAD_V, QUAD_F, POSE, (100, 100), (0.5, 0.5), (64, 64), shaded=True
    )
    # Head-on Lambertian: 0.15 ambient + 0.8 * 1.0
    np.testing.assert_allclose(rgb[32, 32], [0.95] * 3, atol=1e-5)
    assert rgb[32, 32, 0] == rgb[32, 32, 1] == rgb[32, 32, 2]


def test_zbuffer_occlusion():
    # Same quad duplicated one unit farther: front depth must win.
    v2 = np.concatenate([QUAD_V, QUAD_V + np.array([0, 0, 1], np.float32)])
    f2 = np.concatenate([QUAD_F, QUAD_F + 4]).astype(np.int32)
    _, depth = render_mesh_image(v2, f2, POSE, (100, 100), (0.5, 0.5), (64, 64))
    np.testing.assert_allclose(depth[32, 32], 2.0, atol=1e-4)


def test_cli_shaded_mesh_eval(tmp_path):
    """--shaded_mesh + --save_eval_images writes per-view mesh renders
    alongside the render/GT/diff panels (reference frame_XXXXXX_mesh.png)."""
    from neus2_tpu.data.export import save_dataset_na
    from neus2_tpu.data.synthetic import make_sphere_dataset
    from neus2_tpu.run import main

    ds = make_sphere_dataset(n_views=4, resolution=32)
    scene = tmp_path / "scene"
    save_dataset_na(ds, scene)
    main([
        "--scene", str(scene / "transforms.json"),
        "--name", "sm", "--output_dir", str(tmp_path / "out"),
        "--n_steps", "4", "--n_rays", "64", "--samples_per_ray", "16",
        "--multichip", "off", "--mesh_resolution", "32",
        "--test_transforms", str(scene / "transforms.json"),
        "--save_eval_images", "--shaded_mesh", "--eval_spp", "1",
    ])
    eval_dir = tmp_path / "out" / "sm" / "evaluation"
    assert (eval_dir / "view_000.png").exists()
    mesh_png = eval_dir / "view_000_mesh.png"
    assert mesh_png.exists()
    import imageio.v2 as imageio

    img = imageio.imread(mesh_png)
    assert img.shape == (32, 32, 3)
    # 4 untrained steps still give a sphere-ish SDF (geometric init), so the
    # render must contain both hit and background pixels.
    assert (img.max(axis=-1) > 0).any() and (img.max(axis=-1) == 0).any()


def test_nontrivial_pose():
    # Camera shifted back 1 along -Z with identity rotation: quad now at
    # distance 3, projected smaller.
    pose = POSE.copy()
    pose[2, 3] = -1.0
    rgb, depth = render_mesh_image(
        QUAD_V, QUAD_F, pose, (100, 100), (0.5, 0.5), (64, 64)
    )
    np.testing.assert_allclose(depth[32, 32], 3.0, atol=1e-4)
    # extent 100*0.5/3 = 16.7 px
    assert depth[32, 32 + 16] > 0 and depth[32, 32 + 18] == 0
