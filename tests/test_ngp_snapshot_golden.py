"""Golden-fixture reference-snapshot interop test (VERDICT r4 task 5).

The existing roundtrip test (tests/test_ngp_snapshot.py) goes through our
OWN exporter, so a systematic misreading of the reference layout would
cancel out.  This module hand-assembles a reference-layout snapshot
STRICTLY from reading the reference serialization code — never calling
save_reference_snapshot — and asserts load_reference_snapshot reconstructs
planted values.  Layout facts encoded here, each read from the reference:

  * component order density MLP | rgb MLP | hash grid | dir enc (0) |
    variance(4): NerfNetwork::set_params, nerf_network.h:741-785.
  * FullyFusedMLP matrices are bias-free ROW-major (out, in) blocks
    [input (W x in_w), hidden^(k-1) (W x W), output (out_pad x W)] with
    out_pad = next_multiple(out, 16): fully_fused_mlp.cu:836-874 +
    GPUMatrix<T, RM> members (fully_fused_mlp.h:233).
  * density input [xyz | grid feats] and rgb input [density_out(16) |
    SH(16-pad) | xyz | dSDF/dx], each padded to a multiple of 16:
    nerf_network.h:52-80, 195-283.
  * grid params: levels concatenated at hashmap_offset_table offsets (in
    rows), each row = one entry's F contiguous features
    (grid.h grid_index :152 -> (index % hashmap_size) * F + feature;
    kernel_grid :242 grid += offset * F).
  * per-level sizing: resolution = ceil(exp2(l*log2(pls))*base - 1) + 1,
    params = min(next_multiple(res^3, 8), 2^log2_hashmap)
    (grid.h GridEncodingTemplated constructor).
  * density grid: fp16, cascade-major, buffer index == morton(x,y,z)
    within a cascade (testbed_nerf.cu:555-565 morton3D_invert decode).
  * rotation = 12 halfs, row-major 3x3 in [0:9]; transition = 4 halfs,
    xyz in [0:3] (nerf_network.h:89-93, save_global_movement :1179-1204,
    save_global_movement_rotation_6d_kernel common_operation.cuh:588).
  * msgpack document: network config dict with a "snapshot" key;
    binary blobs are msgpack bin (nlohmann to_msgpack of json::binary_t,
    testbed.cu:3144-3177; trainer.h:281-292 n_params/params_binary).
"""

import math

import msgpack
import numpy as np
import pytest

from neus2_tpu.api.ngp_snapshot import (
    field_config_from_ngp,
    load_reference_snapshot,
    morton3d,
    save_reference_snapshot,
)
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig

# --- the tiny golden config ------------------------------------------------
GRID = HashGridConfig(
    n_levels=3,
    n_features_per_level=2,
    log2_hashmap_size=7,  # 128-row hashed levels
    base_resolution=4,
    per_level_scale=2.0,
)
CONFIG = FieldConfig(
    grid=GRID,
    sdf_hidden_dim=16,
    sdf_n_hidden=1,
    rgb_hidden_dim=16,
    rgb_n_hidden=2,
    sh_degree=4,
)


def ref_level_sizes():
    """Per-level (resolution, n_rows) computed the REFERENCE way (grid.h
    constructor) — independent of ops/hashgrid.py."""
    out = []
    for lvl in range(GRID.n_levels):
        scale = (
            math.exp(lvl * math.log(GRID.per_level_scale))
            * GRID.base_resolution
            - 1.0
        )
        res = int(math.ceil(scale)) + 1
        params = min(((res**3 + 7) // 8) * 8, 1 << GRID.log2_hashmap_size)
        out.append((res, params))
    return out


def test_level_tables_match_reference_sizing():
    resolutions, _, offsets, sizes, _ = GRID.level_tables()
    ref = ref_level_sizes()
    assert list(resolutions) == [r for r, _ in ref]
    assert list(sizes) == [p for _, p in ref]
    want_offsets = np.cumsum([0] + [p for _, p in ref])[:-1]
    assert list(offsets) == list(want_offsets)
    # The golden numbers themselves, fully hand-derived: base 4, pls 2 ->
    # resolutions 4, 8, 16; dense sizes 64, 512->128(cap), 4096->128(cap).
    assert list(resolutions) == [4, 8, 16]
    assert list(sizes) == [64, 128, 128]


# MLP geometry implied by the reference layout (all hand-derived):
ENC_OUT = 3 * 2  # n_levels * F
D_IN = 16  # next16(3 + 6)
D_OUT = 16  # padded density output
SH_DIM = 16  # degree-4 SH
RGB_IN = 48  # next16(16 + 16 + 3 + 3) = next16(38)
RGB_OUT = 16  # next16(3)
W = 16
N_GRID_ROWS = 64 + 128 + 128


def _golden_params():
    """Hand-assemble the flat fp16 params vector + the expected pytrees."""
    rng = np.random.default_rng(7)
    # fp16-exact values so fp32 comparisons are bit-exact
    r16 = lambda *s: rng.standard_normal(s).astype("<f2").astype(np.float32)

    parts = []
    # density MLP: input (W, D_IN) with padding cols [9:16] filled with a
    # SENTINEL that must be dropped; output (D_OUT, W).
    d_in_used = r16(W, 9)
    d_in_full = np.full((W, D_IN), 777.0, np.float32)
    d_in_full[:, :9] = d_in_used
    d_out = r16(D_OUT, W)
    parts += [d_in_full, d_out]
    # rgb MLP: input (W, RGB_IN); used col ranges [0:16) density feats,
    # [16:32) SH, [32:38) xyz+dSDF/dx; padding [38:48) sentinel.
    r_in_full = np.full((W, RGB_IN), 777.0, np.float32)
    r_in_used = r16(W, 38)
    r_in_full[:, :38] = r_in_used
    r_hidden = r16(W, W)
    r_out_full = np.full((RGB_OUT, W), 777.0, np.float32)
    r_out_used = r16(3, W)
    r_out_full[:3] = r_out_used
    parts += [r_in_full, r_hidden, r_out_full]
    # grid: row r feature f = 1000*level + r + f/10 (fp16-representable
    # only approximately — use exact small ints instead)
    tables = []
    grid_rows = []
    for lvl, n in enumerate([64, 128, 128]):
        t = r16(n, 2)
        tables.append(t)
        grid_rows.append(t.reshape(-1))
    parts.append(np.concatenate(grid_rows))
    variance = np.array([0.8125, 0.0, 0.0, 0.0], np.float32)  # fp16-exact
    parts.append(variance)

    flat = np.concatenate([p.reshape(-1) for p in parts]).astype("<f2")
    expected = {
        "sdf_in": d_in_used,  # (W, 9) out-major
        "sdf_out": d_out,
        "rgb_in": r_in_used,
        "rgb_hidden": r_hidden,
        "rgb_out": r_out_used,
        "tables": tables,
        "variance": 0.8125,
    }
    return flat, expected


def _golden_density_grid(g=16, cascades=2):
    """Morton-ordered fp16 buffer exactly as the reference serializes it."""
    rng = np.random.default_rng(3)
    cells = rng.standard_normal((cascades, g, g, g)).astype("<f2").astype(
        np.float32
    )
    buf = np.empty(cascades * g**3, np.float32)
    for k in range(cascades):
        for _ in range(1):
            z, y, x = np.meshgrid(
                np.arange(g), np.arange(g), np.arange(g), indexing="ij"
            )
            m = morton3d(x.ravel(), y.ravel(), z.ravel())
            # reference buffer: position morton(x,y,z) holds cell (x,y,z)
            buf[k * g**3 + m] = cells[k].reshape(-1)
    return buf.astype("<f2"), cells


def _golden_doc():
    flat, expected = _golden_params()
    dg, cells = _golden_density_grid()
    rot = np.zeros(12, np.float32)
    rot[:9] = np.arange(1, 10)  # row-major 3x3 [[1,2,3],[4,5,6],[7,8,9]]
    tra = np.array([0.25, -0.5, 0.75, 0.0], np.float32)
    doc = {
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 3,
            "n_features_per_level": 2,
            "log2_hashmap_size": 7,
            "base_resolution": 4,
            "per_level_scale": 2.0,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
        "rgb_network": {"otype": "FullyFusedMLP", "n_neurons": 16,
                        "n_hidden_layers": 2},
        "dir_encoding": {
            "otype": "Composite",
            "nested": [
                {"n_dims_to_encode": 3, "otype": "SphericalHarmonics",
                 "degree": 4},
                {"otype": "Identity"},
            ],
        },
        "snapshot": {
            "n_params": int(flat.size),
            "params_binary": flat.tobytes(),
            "density_grid_size": 16,
            "density_grid_binary": dg.tobytes(),
            "rotation": rot.astype("<f2").tobytes(),
            "transition": tra.astype("<f2").tobytes(),
            "training_step": 1234,
            "loss": 0.0625,
            "nerf": {"aabb_scale": 2},
        },
    }
    return doc, expected, cells


def test_golden_fixture_loads():
    doc, expected, cells = _golden_doc()
    blob = msgpack.packb(doc, use_bin_type=True)
    out = load_reference_snapshot(blob)

    # config parsed from the document itself
    cfg = out["config"]
    assert cfg.grid == GRID
    assert (cfg.sdf_hidden_dim, cfg.sdf_n_hidden) == (16, 1)
    assert (cfg.rgb_hidden_dim, cfg.rgb_n_hidden) == (16, 2)

    p = out["params"]
    # Our MLP convention is w: (in, out) = reference block transposed,
    # padding dropped; biases zero.
    np.testing.assert_array_equal(
        p["sdf_mlp"]["layers"][0]["w"], expected["sdf_in"].T
    )
    np.testing.assert_array_equal(
        p["sdf_mlp"]["layers"][1]["w"], expected["sdf_out"].T
    )
    np.testing.assert_array_equal(
        p["rgb_mlp"]["layers"][0]["w"], expected["rgb_in"].T
    )
    np.testing.assert_array_equal(
        p["rgb_mlp"]["layers"][1]["w"], expected["rgb_hidden"].T
    )
    np.testing.assert_array_equal(
        p["rgb_mlp"]["layers"][2]["w"], expected["rgb_out"].T
    )
    for b in (
        p["sdf_mlp"]["layers"][0]["b"],
        p["rgb_mlp"]["layers"][2]["b"],
    ):
        assert not np.any(b)
    # grid tables at the reference offsets
    assert len(p["hashgrid"]) == 3
    for got, want in zip(p["hashgrid"], expected["tables"]):
        np.testing.assert_array_equal(np.asarray(got), want)
    assert float(p["variance"]) == expected["variance"]

    # density grid: (cascade, z, y, x) with the morton decode applied
    np.testing.assert_array_equal(out["density_grid"], cells)
    # spot-check a handful of cells straight against the morton formula
    g = 16
    rngc = np.random.default_rng(11)
    dgbuf = np.frombuffer(doc["snapshot"]["density_grid_binary"], "<f2")
    for _ in range(20):
        k = int(rngc.integers(0, 2))
        x, y, z = (int(v) for v in rngc.integers(0, g, 3))
        m = int(morton3d(np.array([x]), np.array([y]), np.array([z]))[0])
        assert out["density_grid"][k, z, y, x] == float(
            dgbuf[k * g**3 + m]
        )

    # movement + scalars
    np.testing.assert_array_equal(
        out["acc"]["rotation"],
        np.arange(1.0, 10.0, dtype=np.float32).reshape(3, 3),
    )
    np.testing.assert_array_equal(
        out["acc"]["transition"], np.array([0.25, -0.5, 0.75], np.float32)
    )
    assert out["training_step"] == 1234
    assert out["loss"] == 0.0625
    assert out["aabb_scale"] == 2


def test_export_emits_reference_required_keys():
    """Testbed::load_snapshot indexes these keys with NO .contains()
    guard (testbed.cu:3197-3254, nerf_network.h:1207/:1249) — a file
    missing any of them throws in the reference."""
    import io

    flat, expected = _golden_params()
    # params in OUR pytree form (reuse the loader on the golden fixture)
    doc, _, _ = _golden_doc()
    params = load_reference_snapshot(
        msgpack.packb(doc, use_bin_type=True)
    )["params"]

    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as td:
        path = pathlib.Path(td) / "snap.msgpack"
        save_reference_snapshot(path, params, CONFIG)
        saved = msgpack.unpackb(path.read_bytes(), raw=False,
                                strict_map_key=False)
    snap = saved["snapshot"]
    for key in (
        "n_params", "params_binary", "density_grid_size",
        "density_grid_binary", "rotation", "transition",
        "local_rotation", "local_transition", "training_step", "loss",
    ):
        assert key in snap, key
    assert snap["nerf"]["rgb"]["rays_per_batch"] > 0
    assert snap["nerf"]["rgb"]["measured_batch_size"] > 0
    assert snap["nerf"]["rgb"]["measured_batch_size_before_compaction"] > 0
    # identity defaults decode correctly
    rot = np.frombuffer(snap["rotation"], "<f2")[:9].reshape(3, 3)
    np.testing.assert_array_equal(rot, np.eye(3))
    lr = np.frombuffer(snap["local_rotation"], "<f2")
    np.testing.assert_array_equal(lr[:6], [1, 0, 0, 0, 1, 0])


def test_export_import_density_grid_matches_reference_semantics():
    """Export a grid, then decode the produced buffer BY HAND with the
    reference's morton rule — catches an exporter that merely inverts the
    importer's (possibly wrong) permutation."""
    g = 16
    rng = np.random.default_rng(5)
    cells = rng.standard_normal((1, g, g, g)).astype("<f2").astype(
        np.float32
    )
    import tempfile, pathlib

    flatdoc, _, _ = _golden_doc()
    params = load_reference_snapshot(
        msgpack.packb(flatdoc, use_bin_type=True)
    )["params"]
    with tempfile.TemporaryDirectory() as td:
        path = pathlib.Path(td) / "snap.msgpack"
        save_reference_snapshot(path, params, CONFIG, density_grid=cells)
        saved = msgpack.unpackb(path.read_bytes(), raw=False,
                                strict_map_key=False)
    buf = np.frombuffer(saved["snapshot"]["density_grid_binary"], "<f2")
    z, y, x = np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                          indexing="ij")
    m = morton3d(x.ravel(), y.ravel(), z.ravel())
    # reference decode: cell (x,y,z) lives at buffer position morton(x,y,z)
    np.testing.assert_array_equal(
        np.asarray(buf)[m].reshape(g, g, g), cells[0]
    )
