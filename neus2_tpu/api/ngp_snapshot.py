"""Reference-format (instant-ngp/NeuS2) msgpack snapshot interop.

The reference saves snapshots as nlohmann-json msgpack of the full network
config with a ``snapshot`` key (reference src/testbed.cu:3144-3196
save_snapshot / 3197-3254 load_snapshot):

  snapshot.n_params            total params in the flat fp16 vector
  snapshot.params_binary       fp16 INFERENCE (EMA) params, in the composite
                               ordering of NerfNetwork::set_params
                               (nerf_network.h:741-785): density MLP, rgb
                               MLP, hash grid, dir encoding (0 params),
                               variance buffer (4 entries, [0] used)
  snapshot.density_grid_binary fp16 density grid, cascades-major, MORTON
                               cell order within each cascade
                               (testbed_nerf.cu:555-565)
  snapshot.density_grid_size   128 (NERF_GRIDSIZE)
  snapshot.nerf.aabb_scale     dataset aabb scale
  snapshot.rotation/transition accumulated global movement (half; 3x3
                               row-major in [0:9] / xyz in [0:3],
                               nerf_network.h:1179-1204)
  snapshot.training_step, snapshot.loss

MLP matrices are bias-free row-major (out, in) blocks in layer order
[input (W x in_w), hidden^(k-1) (W x W), output (out_pad x W)]
(my_tcnn fully_fused_mlp.cu:815-889, set_params:1217).  Input layouts
(nerf_network.h:52-80, 195-283):

  density input  [xyz (3) | grid features (L*F)] padded to mult of 16
  rgb input      [density out (16) | SH dir (16) | xyz (3) | dSDF/dx (3)]
                 padded to mult of 16

— exactly the orders this repo uses (models/field.py), so the import is a
transpose + column-slice per matrix (our MLPs carry biases, absent upstream:
imported as zero; export drops them).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import numpy as np

from neus2_tpu.constants import NERF_GRIDSIZE
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.ops.sh import sh_output_dim

_ALIGN = 16  # tcnn minimum_alignment for FullyFusedMLP


def _next_multiple(x: int, m: int = _ALIGN) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Morton (z-order) curve for the density grid cell order
# ---------------------------------------------------------------------------


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of x to every 3rd bit (tcnn expand_bits)."""
    x = x.astype(np.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton3d(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Interleaved morton code, x in the lowest bit (tcnn morton3D)."""
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def _morton_of_flat(g: int) -> np.ndarray:
    """flat (z,y,x x-fastest) cell index -> morton code, for one G^3 cascade.

    The reference's in-memory density grid is MORTON-ordered: linear buffer
    index == morton(x, y, z) (testbed_nerf.cu:555-565 decodes the buffer
    index i with morton3D_invert to get the cell coordinate), and the
    snapshot serializes that buffer verbatim.  So importing is
    ``cells_xmajor = buffer[m]`` and exporting is ``buffer[m] = cells``
    with m = this map.  NOTE the inverse permutation is NOT equivalent:
    bit-interleave is only an involution when bits-per-axis == n_axes
    (g=8) — at the production NERF_GRIDSIZE=128 the two differ (caught by
    the hand-assembled golden fixture, tests/test_ngp_snapshot_golden.py).
    """
    z, y, x = np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                          indexing="ij")
    return morton3d(x.ravel(), y.ravel(), z.ravel()).astype(np.int64)


# ---------------------------------------------------------------------------
# Config <-> FieldConfig
# ---------------------------------------------------------------------------


def field_config_from_ngp(config: dict) -> FieldConfig:
    """Build a FieldConfig from the reference network-config dict
    (configs/nerf/base.json schema; Testbed::reset_network,
    src/testbed.cu:2183-2189 derives per_level_scale from top_resolution)."""
    enc = config["encoding"]
    if "per_level_scale" in enc:
        pls = float(enc["per_level_scale"])
    else:
        pls = HashGridConfig.per_level_scale_from_top(
            int(enc.get("base_resolution", 16)),
            int(enc.get("top_resolution", 2048)),
            int(enc.get("n_levels", 14)),
        )
    grid = HashGridConfig(
        n_levels=int(enc.get("n_levels", 14)),
        n_features_per_level=int(enc.get("n_features_per_level", 2)),
        log2_hashmap_size=int(enc.get("log2_hashmap_size", 19)),
        base_resolution=int(enc.get("base_resolution", 16)),
        per_level_scale=pls,
    )
    net = config.get("network", {})
    rgb = config.get("rgb_network", {})
    sh_degree = 4
    for nested in config.get("dir_encoding", {}).get("nested", []):
        if str(nested.get("otype", "")).lower().startswith("spherical"):
            sh_degree = int(nested.get("degree", 4))
    return FieldConfig(
        grid=grid,
        sdf_hidden_dim=int(net.get("n_neurons", 64)),
        sdf_n_hidden=int(net.get("n_hidden_layers", 1)),
        rgb_hidden_dim=int(rgb.get("n_neurons", 64)),
        rgb_n_hidden=int(rgb.get("n_hidden_layers", 2)),
        sh_degree=sh_degree,
    )


def _mlp_matrix_shapes(in_w: int, width: int, n_hidden: int, out_pad: int):
    """FullyFusedMLP matrix shapes in storage order
    (fully_fused_mlp.cu:839-874): input, (n_hidden-1) hidden, output."""
    shapes = [(width, in_w)]
    shapes += [(width, width)] * (n_hidden - 1)
    shapes.append((out_pad, width))
    return shapes


def _layout(config: FieldConfig):
    """Composite layout: [(name, shapes/sizes)] in set_params order."""
    if config.latent_dim or config.residual_grid:
        raise NotImplementedError(
            "reference-snapshot interop covers the NeuS2 composite network; "
            "latent codes / residual grids have no reference counterpart in "
            "the params_binary layout"
        )
    enc_out = config.grid.output_dim
    density_in = _next_multiple(3 + enc_out)
    density_out = _next_multiple(config.sdf_out_dim)
    sh_pad = _next_multiple(sh_output_dim(config.sh_degree))
    rgb_in = _next_multiple(3 + 3 + sh_pad + density_out)
    rgb_out = _next_multiple(16)
    return {
        # n_hidden_layers=k -> k+1 weight matrices: input, (k-1) hidden,
        # output (fully_fused_mlp.cu:835) — the same count as our k-hidden
        # MLP's layer list (models/mlp.py dims).
        "density": _mlp_matrix_shapes(
            density_in, config.sdf_hidden_dim, config.sdf_n_hidden,
            density_out,
        ),
        "rgb": _mlp_matrix_shapes(
            rgb_in, config.rgb_hidden_dim, config.rgb_n_hidden, rgb_out
        ),
        "grid": config.grid.n_params,
        "variance": 4,
        "density_in": density_in,
        "rgb_in": rgb_in,
        "sh_pad": sh_pad,
        "density_out": density_out,
    }


def ngp_n_params(config: FieldConfig) -> int:
    lay = _layout(config)
    n = sum(r * c for r, c in lay["density"]) + sum(
        r * c for r, c in lay["rgb"]
    )
    return n + lay["grid"] + lay["variance"]


# ---------------------------------------------------------------------------
# Import
# ---------------------------------------------------------------------------


def _take(flat: np.ndarray, pos: int, n: int):
    if pos + n > flat.size:
        raise ValueError(
            f"snapshot params too short: need {pos + n}, have {flat.size}"
        )
    return flat[pos : pos + n], pos + n


def _import_mlp(flat, pos, shapes, col_slices, out_rows=None):
    """Consume one MLP's matrices -> our {'layers': [{'w','b'}...]} pytree.

    ``col_slices``: for the input matrix, the list of column ranges to keep
    (drops zero padding).  ``out_rows``: rows of the output matrix to keep.
    """
    layers = []
    for i, (r, c) in enumerate(shapes):
        block, pos = _take(flat, pos, r * c)
        w_ref = block.reshape(r, c).astype(np.float32)  # (out, in) row-major
        if i == 0 and col_slices is not None:
            w_ref = np.concatenate(
                [w_ref[:, a:b] for a, b in col_slices], axis=1
            )
        if i == len(shapes) - 1 and out_rows is not None:
            w_ref = w_ref[:out_rows]
        layers.append(
            {"w": w_ref.T.copy(), "b": np.zeros((w_ref.shape[0],), np.float32)}
        )
    return {"layers": layers}, pos


def load_reference_snapshot(
    path: str | Path | bytes, config: FieldConfig | None = None
) -> dict[str, Any]:
    """Parse a reference msgpack snapshot -> our pytrees.

    Returns {"params", "density_grid" (C, G, G, G) float32 | None,
    "acc" {'rotation','transition'} | None, "config": FieldConfig,
    "aabb_scale", "training_step", "loss"}.  ``params`` carries the
    reference's INFERENCE (EMA) values — install into both params and
    ema_params when resuming.  Optimizer state is not imported (the
    reference's Adam layout is tied to its fused kernels; training resumes
    with fresh moments).
    """
    import msgpack

    data = path if isinstance(path, bytes) else Path(path).read_bytes()
    cfgd = msgpack.unpackb(data, strict_map_key=False, raw=False)
    if "snapshot" not in cfgd:
        raise ValueError("file does not contain a snapshot")
    snap = cfgd["snapshot"]
    config = config or field_config_from_ngp(cfgd)
    lay = _layout(config)

    flat = np.frombuffer(snap["params_binary"], dtype="<f2")
    if int(snap.get("n_params", flat.size)) != flat.size:
        raise ValueError("n_params does not match params_binary size")
    want = ngp_n_params(config)
    if flat.size != want:
        raise ValueError(
            f"snapshot has {flat.size} params but the config implies {want} "
            "— config/snapshot mismatch"
        )

    pos = 0
    enc_out = config.grid.output_dim
    sdf_mlp, pos = _import_mlp(
        flat, pos, lay["density"], [(0, 3 + enc_out)]
    )
    sh_dim = sh_output_dim(config.sh_degree)
    rgb_cols = [
        (0, config.sdf_out_dim),  # density features (padded region start)
        (lay["density_out"], lay["density_out"] + sh_dim),  # SH
        (
            lay["density_out"] + lay["sh_pad"],
            lay["density_out"] + lay["sh_pad"] + 6,
        ),  # xyz + dSDF/dx
    ]
    rgb_mlp, pos = _import_mlp(flat, pos, lay["rgb"], rgb_cols, out_rows=3)
    grid_flat, pos = _take(flat, pos, lay["grid"])
    F = config.grid.n_features_per_level
    _, _, offsets, sizes, _ = config.grid.level_tables()
    tables = tuple(
        grid_flat[o * F : (o + s) * F].reshape(s, F).astype(np.float32)
        for o, s in zip(offsets, sizes)
    )
    var_buf, pos = _take(flat, pos, lay["variance"])

    params = {
        "hashgrid": tables,
        "sdf_mlp": sdf_mlp,
        "rgb_mlp": rgb_mlp,
        "variance": np.float32(var_buf[0]),
    }

    density_grid = None
    if "density_grid_binary" in snap:
        g = int(snap.get("density_grid_size", NERF_GRIDSIZE))
        dg = np.frombuffer(snap["density_grid_binary"], dtype="<f2")
        if dg.size % (g**3):
            raise ValueError("density grid size is not a whole cascade count")
        c = dg.size // g**3
        m = _morton_of_flat(g)
        cas = [
            dg[k * g**3 : (k + 1) * g**3][m].reshape(g, g, g)
            for k in range(c)
        ]
        # morton order is (x fastest); our density axes are (z, y, x)
        # x-fastest as well (engine/occupancy.py cell_position), so the
        # reshape lands directly.
        density_grid = np.stack(cas).astype(np.float32)

    acc = None
    if "rotation" in snap and "transition" in snap:
        rot = np.frombuffer(snap["rotation"], dtype="<f2").astype(np.float32)
        tra = np.frombuffer(snap["transition"], dtype="<f2").astype(np.float32)
        acc = {
            "rotation": rot[:9].reshape(3, 3),
            "transition": tra[:3],
        }

    return {
        "params": params,
        "density_grid": density_grid,
        "acc": acc,
        "config": config,
        "aabb_scale": int(snap.get("nerf", {}).get("aabb_scale", 1)),
        "training_step": int(snap.get("training_step", 0)),
        "loss": float(snap.get("loss", 0.0)),
    }


# ---------------------------------------------------------------------------
# Export (also how the interop test synthesizes reference-format files)
# ---------------------------------------------------------------------------


def _export_mlp(layers, shapes, col_slices, out_rows=None) -> np.ndarray:
    """Our MLP layers -> the reference's flat fp16 block (biases dropped —
    the reference MLPs are bias-free)."""
    out = []
    for i, ((r, c), layer) in enumerate(zip(shapes, layers)):
        w = np.zeros((r, c), np.float32)
        ours = np.asarray(layer["w"], np.float32).T  # (out, in)
        if i == 0 and col_slices is not None:
            k = 0
            for a, b in col_slices:
                w[: ours.shape[0], a:b] = ours[:, k : k + (b - a)]
                k += b - a
        elif i == len(shapes) - 1 and out_rows is not None:
            w[:out_rows, : ours.shape[1]] = ours[:out_rows]
        else:
            w[: ours.shape[0], : ours.shape[1]] = ours
        out.append(w.reshape(-1))
    return np.concatenate(out).astype("<f2")


def save_reference_snapshot(
    path: str | Path,
    params,
    config: FieldConfig,
    density_grid=None,
    acc=None,
    aabb_scale: int = 1,
    training_step: int = 0,
    loss: float = 0.0,
    network_config: dict | None = None,
) -> None:
    """Write our params as a reference-format msgpack snapshot (the inverse
    of load_reference_snapshot; fp16, bias-free — biases are dropped)."""
    import msgpack

    lay = _layout(config)
    enc_out = config.grid.output_dim
    sh_dim = sh_output_dim(config.sh_degree)
    parts = [
        _export_mlp(
            params["sdf_mlp"]["layers"], lay["density"], [(0, 3 + enc_out)]
        ),
        _export_mlp(
            params["rgb_mlp"]["layers"],
            lay["rgb"],
            [
                (0, config.sdf_out_dim),
                (lay["density_out"], lay["density_out"] + sh_dim),
                (
                    lay["density_out"] + lay["sh_pad"],
                    lay["density_out"] + lay["sh_pad"] + 6,
                ),
            ],
            out_rows=3,
        ),
        np.concatenate(
            [np.asarray(t, np.float32).reshape(-1) for t in params["hashgrid"]]
        ).astype("<f2"),
        np.array(
            [float(params["variance"]), 0.0, 0.0, 0.0], "<f2"
        ),
    ]
    flat = np.concatenate(parts)

    # Keys the reference's Testbed::load_snapshot reads UNCONDITIONALLY
    # (testbed.cu:3197-3254 — no .contains() guards): density_grid_size,
    # density_grid_binary, nerf.rgb.{rays_per_batch, measured_batch_size,
    # measured_batch_size_before_compaction}, rotation/transition
    # (load_global_movement, nerf_network.h:1207) and local_rotation/
    # local_transition (load_local_movement, :1249).  All are emitted with
    # faithful defaults so the reference can load our files; a zero-length
    # density grid is its documented "never populated" state.
    snap: dict[str, Any] = {
        "n_params": int(flat.size),
        "params_binary": flat.tobytes(),
        "training_step": int(training_step),
        "loss": float(loss),
        "nerf": {
            "aabb_scale": int(aabb_scale),
            "rgb": {
                "rays_per_batch": 4096,
                "measured_batch_size": 1 << 18,
                "measured_batch_size_before_compaction": 1 << 18,
            },
        },
        "density_grid_size": NERF_GRIDSIZE,
        "density_grid_binary": b"",
        # local (delta) movement: identity 6d rotation in an 8-buffer +
        # zero transition in a 4-buffer (transform_network.h:30-35).
        "local_rotation": np.array(
            [1, 0, 0, 0, 1, 0, 0, 0], "<f2"
        ).tobytes(),
        "local_transition": np.zeros(4, "<f2").tobytes(),
    }
    if acc is None:
        # Identity accumulated movement (12/4-buffer layout,
        # nerf_network.h:89-93; row-major 3x3 in [0:9]).
        snap["rotation"] = np.concatenate(
            [np.eye(3, dtype=np.float32).reshape(-1), np.zeros(3)]
        ).astype("<f2").tobytes()
        snap["transition"] = np.zeros(4, "<f2").tobytes()
    if density_grid is not None:
        dg = np.asarray(density_grid, np.float32)
        g = dg.shape[-1]
        m = _morton_of_flat(g)
        cas = []
        for c in dg.reshape(-1, g**3):
            buf = np.empty(g**3, np.float32)
            buf[m] = c  # buffer position morton(x,y,z) <- cell (z,y,x)
            cas.append(buf)
        snap["density_grid_size"] = g
        snap["density_grid_binary"] = (
            np.concatenate(cas).astype("<f2").tobytes()
        )
    if acc is not None:
        rot = np.zeros(12, np.float32)
        rot[:9] = np.asarray(acc["rotation"], np.float32).reshape(-1)
        tra = np.zeros(4, np.float32)
        tra[:3] = np.asarray(acc["transition"], np.float32).reshape(-1)
        snap["rotation"] = rot.astype("<f2").tobytes()
        snap["transition"] = tra.astype("<f2").tobytes()

    doc = dict(network_config or {})
    doc.setdefault("encoding", {
        "otype": "HashGrid",
        "n_levels": config.grid.n_levels,
        "n_features_per_level": config.grid.n_features_per_level,
        "log2_hashmap_size": config.grid.log2_hashmap_size,
        "base_resolution": config.grid.base_resolution,
        "per_level_scale": config.grid.per_level_scale,
    })
    doc.setdefault("network", {
        "otype": "FullyFusedMLP",
        "n_neurons": config.sdf_hidden_dim,
        "n_hidden_layers": config.sdf_n_hidden,
    })
    doc.setdefault("rgb_network", {
        "otype": "FullyFusedMLP",
        "n_neurons": config.rgb_hidden_dim,
        "n_hidden_layers": config.rgb_n_hidden,
    })
    doc.setdefault("dir_encoding", {
        "otype": "Composite",
        "nested": [
            {"n_dims_to_encode": 3, "otype": "SphericalHarmonics",
             "degree": config.sh_degree},
            {"otype": "Identity"},
        ],
    })
    doc["snapshot"] = snap
    Path(path).write_bytes(msgpack.packb(doc, use_bin_type=True))
