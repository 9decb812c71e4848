"""SDF-from-mesh mode (engine/sdf_mode.py + native TriangleBVH).

Reference parity surface: src/testbed_sdf.cu (train_sdf :1221,
generate_training_samples_sdf :1084, render_sdf :811, IoU eval) with the
GT oracle from src/triangle_bvh.cu.  Tests run a tiny fit on an analytic
cube mesh where every quantity has a closed form.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.engine import sdf_mode
from neus2_tpu.models.field import FieldConfig, sdf_fn
from neus2_tpu.native import TriangleBVH
from neus2_tpu.ops.hashgrid import HashGridConfig

LO, HI = 0.32, 0.68


def cube_mesh():
    v = np.array(
        [[x, y, z] for z in (LO, HI) for y in (LO, HI) for x in (LO, HI)],
        np.float32,
    )

    def q(a, b, c, d):
        return [[a, b, c], [a, c, d]]

    f = (
        q(0, 2, 3, 1) + q(4, 5, 7, 6) + q(0, 1, 5, 4)
        + q(2, 6, 7, 3) + q(0, 4, 6, 2) + q(1, 3, 7, 5)
    )
    return v, np.array(f, np.int32)


def cube_sdf(p):
    d = np.maximum(LO - p, p - HI).max(-1)
    inside = np.all((p > LO) & (p < HI), axis=-1)
    # exact outside-corner distance not needed for the tests below
    return np.where(inside, d, np.maximum(d, 0.0))


@pytest.fixture(scope="module")
def bvh():
    v, f = cube_mesh()
    return TriangleBVH(v, f)


def test_bvh_signed_distance_matches_analytic(bvh):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.25, 0.75, (5000, 3)).astype(np.float32)
    got = bvh.signed_distance(pts)
    inside = np.all((pts > LO) & (pts < HI), axis=-1)
    np.testing.assert_array_equal(got < 0, inside)
    # inside: |sdf| == min face distance (exact)
    d_in = np.maximum(LO - pts, pts - HI).max(-1)
    np.testing.assert_allclose(got[inside], d_in[inside], atol=1e-5)


def test_training_pool_distribution(bvh):
    v, f = cube_mesh()
    pts, dist = sdf_mode.generate_training_pool(bvh, v, f, 8000, seed=1)
    assert pts.shape == (8000, 3) and dist.shape == (8000,)
    # 4/8 exact-surface points carry distance 0 and lie on the cube faces
    exact = dist[:4000]
    np.testing.assert_array_equal(exact, 0.0)
    on_face = np.min(
        np.abs(np.stack([pts[:4000] - LO, pts[:4000] - HI])), axis=(0, 2)
    )
    assert np.max(on_face) < 1e-5
    # offset points hug the surface; uniform tail covers the cube
    assert np.abs(dist[4000:7000]).mean() < 0.02
    assert np.abs(dist[7000:]).mean() > 0.05


def _tiny_config():
    return sdf_mode.SdfFitConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=6, log2_hashmap_size=13, base_resolution=8,
                per_level_scale=1.6,
            ),
            sdf_hidden_dim=32, sdf_n_hidden=1,
        ),
        batch_size=4096,
        pool_size=1 << 16,
        lr=3e-3,
    )


@pytest.fixture(scope="module")
def fitted(bvh, tmp_path_factory):
    v, f = cube_mesh()
    cfg = _tiny_config()
    pts, dist = sdf_mode.generate_training_pool(
        bvh, v, f, cfg.pool_size, seed=0
    )
    params = sdf_mode.init_field(jax.random.PRNGKey(0), cfg.field)
    opt = sdf_mode.make_sdf_optimizer(cfg).init(params)
    key = jax.random.PRNGKey(1)
    pp, pd = jnp.asarray(pts), jnp.asarray(dist)
    for _ in range(400):
        key, k = jax.random.split(key)
        params, opt, loss = sdf_mode.sdf_fit_step(params, opt, k, pp, pd, cfg)
    return params, cfg, float(loss)


def test_fit_converges_iou(fitted, bvh):
    params, cfg, loss = fitted
    iou = sdf_mode.eval_iou(params, cfg, bvh, n=50_000)
    assert iou > 0.9, (iou, loss)
    # surface |sdf| small on GT surface points
    v, f = cube_mesh()
    pts, dist = sdf_mode.generate_training_pool(bvh, v, f, 4096, seed=3)
    pred, _ = sdf_fn(params, jnp.asarray(pts[:2048]), cfg.field)
    assert float(jnp.abs(pred).mean()) < 0.01


def test_sphere_trace_render_matches_gt_silhouette(fitted, bvh):
    params, cfg, _ = fitted
    from neus2_tpu.data.synthetic import _look_at

    eye = np.array([0.5, -0.75, 0.9], np.float32)
    pose = _look_at(eye, np.full(3, 0.5, np.float32),
                    np.array([0.0, 0.0, 1.0], np.float32))
    res = 64
    focal = jnp.full((2,), 0.5 * res / np.tan(0.35), jnp.float32)
    rgb, depth, hit = sdf_mode.render_sdf_sphere_traced(
        params, jnp.asarray(pose), focal, cfg, resolution=(res, res)
    )
    hit = np.asarray(hit)
    # GT silhouette from the BVH raycast through the same camera
    u = (np.arange(res) + 0.5) / res
    uu, vv = np.meshgrid(u, u)
    xy = np.stack([(uu - 0.5) * res / float(focal[0]),
                   (vv - 0.5) * res / float(focal[1])], -1)
    d_cam = np.concatenate([xy, np.ones_like(xy[..., :1])], -1)
    d = d_cam @ pose[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(pose[:, 3], d.shape).copy()
    t, _ = bvh.raycast(o.reshape(-1, 3), d.reshape(-1, 3))
    gt_hit = (t > 0).reshape(res, res)
    agree = np.mean(hit == gt_hit)
    assert agree > 0.97, agree
    assert hit.sum() > 100  # non-trivial silhouette
    # normals on hits are unit-ish and the normal map is in [0, 1]
    rgb = np.asarray(rgb)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_obj_roundtrip(tmp_path):
    v, f = cube_mesh()
    lines = ["# test"] + [f"v {a} {b} {c}" for a, b, c in v] + [
        f"f {a+1}/{a+1} {b+1}/{b+1} {c+1}/{c+1}" for a, b, c in f
    ]
    p = tmp_path / "cube.obj"
    p.write_text("\n".join(lines))
    v2, f2 = sdf_mode.load_mesh_obj(p)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)
    nv, scale, off = sdf_mode.normalize_mesh(v2)
    assert nv.min() > 0.1 and nv.max() < 0.9
