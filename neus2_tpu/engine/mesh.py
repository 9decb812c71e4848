"""SDF grid query + marching-cubes mesh export.

Mirrors the reference mesh path (SURVEY.md §3.5): batched SDF queries on a
uniform grid on-device (reference Testbed::get_density_on_grid,
src/testbed_nerf.cu:4096-4130 — queries NerfNetwork::sdf), then native
marching cubes on host (reference marching_cubes_gpu, src/marching_cubes.cu:794)
and OBJ/PLY export (save_mesh, 824) with the dataset scale/offset un-warp
(Testbed::compute_and_save_marching_cubes_mesh, src/testbed.cu:308-320).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.models.field import FieldConfig, field_forward, sdf_fn
from neus2_tpu.ops.warp import AABB, warp_direction


@partial(jax.jit, static_argnames=("config", "resolution", "chunk"))
def sdf_grid(
    params,
    config: FieldConfig,
    lo: jnp.ndarray,  # (3,) world-space box
    hi: jnp.ndarray,
    aabb_lo: jnp.ndarray,
    aabb_diag: jnp.ndarray,
    resolution: int = 256,
    chunk: int = 1 << 16,
) -> jnp.ndarray:
    """Evaluate the SDF on a uniform (R, R, R) grid over [lo, hi]."""
    r = resolution
    xs = (jnp.arange(r) + 0.5) / r
    grid = jnp.stack(jnp.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    pts = lo + grid.reshape(-1, 3) * (hi - lo)
    pts_w = (pts - aabb_lo) / aabb_diag

    n = pts_w.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    pw = jnp.pad(pts_w, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

    def body(p):
        s, _ = sdf_fn(params, p, config)
        return s

    vals = jax.lax.map(body, pw).reshape(-1)[:n]
    return vals.reshape(r, r, r)


def extract_mesh(
    params,
    config: FieldConfig,
    resolution: int = 256,
    box: AABB | None = None,
    aabb: AABB | None = None,
    thresh: float = 0.0,
):
    """Marching-cubes mesh of the SDF zero set -> (verts (V,3) world, tris)."""
    from neus2_tpu.native import marching_cubes

    if aabb is None:
        aabb = AABB(jnp.zeros(3), jnp.ones(3))
    if box is None:
        box = aabb
    grid = np.asarray(
        sdf_grid(
            params, config, box.lo, box.hi, aabb.lo, aabb.diag,
            resolution=resolution,
        )
    )
    verts, tris = marching_cubes(grid, thresh=thresh)
    lo = np.asarray(box.lo)
    hi = np.asarray(box.hi)
    # vertex (i+0.5)/r spacing: grid samples are at cell centers
    verts_world = lo + (verts + 0.5) / resolution * (hi - lo)
    return verts_world, tris


def save_density_grid_png(
    params,
    config: FieldConfig,
    path,
    resolution: int = 128,
    box: AABB | None = None,
    aabb: AABB | None = None,
    thresh: float = 0.0,
    value_range: float = 1.0,
    swap_y_z: bool = True,
):
    """Diagnostic mosaic PNG of the SDF grid (reference
    marching_cubes.cu:962-1024 ``save_density_grid_to_png``): Z-slices tiled
    ~sqrt(Z) across, values in [-range, +range] mapped to [0, 255] around 128.
    Returns (n_surface_voxels, n_lattice_points_near_zero_crossing), the same
    stats the reference logs."""
    import imageio.v2 as imageio

    if aabb is None:
        aabb = AABB(jnp.zeros(3), jnp.ones(3))
    if box is None:
        box = aabb
    g = np.asarray(
        sdf_grid(params, config, box.lo, box.hi, aabb.lo, aabb.diag,
                 resolution=resolution)
    )
    inside = g < thresh
    # surface voxels: 2x2x2 corner blocks with a mixed sign, anchors in
    # [1, res-2] per axis (reference loops x,y,z from 1 to res-2 inclusive)
    c = sum(
        inside[dx:resolution - 1 + dx, dy:resolution - 1 + dy,
               dz:resolution - 1 + dz].astype(np.int32)
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    )[1:, 1:, 1:]
    n_voxels = int(np.count_nonzero((c > 0) & (c < 8)))
    # lattice points whose 6-neighborhood crosses the threshold
    i = inside[1:-1, 1:-1, 1:-1]
    near = np.zeros_like(i)
    for ax, sl in ((0, np.s_[2:, 1:-1, 1:-1]), (0, np.s_[:-2, 1:-1, 1:-1]),
                   (1, np.s_[1:-1, 2:, 1:-1]), (1, np.s_[1:-1, :-2, 1:-1]),
                   (2, np.s_[1:-1, 1:-1, 2:]), (2, np.s_[1:-1, 1:-1, :-2])):
        near |= inside[sl] != i
    n_near = int(np.count_nonzero(near))

    vol = np.transpose(g, (2, 1, 0))  # -> (z, y, x) slices
    if swap_y_z:
        vol = np.transpose(g, (1, 2, 0))  # y becomes the slice axis
    z, h, w = vol.shape
    ndown = int(np.sqrt(z))
    nacross = -(-z // ndown)
    sheet = np.zeros((h * ndown, w * nacross), np.uint8)
    # Reference mapping: clamp((v - thresh)*128/range + 128.5, 0, 255)
    # truncated to uint8 (marching_cubes.cu:1019).
    px = np.clip(
        (vol - thresh) * (128.0 / value_range) + 128.5, 0, 255
    ).astype(np.uint8)
    for k in range(z):
        r, col = divmod(k, nacross)
        sheet[r * h:(r + 1) * h, col * w:(col + 1) * w] = px[k]
    imageio.imwrite(str(path), sheet)
    return n_voxels, n_near


def largest_component(verts: np.ndarray, tris: np.ndarray):
    """Keep only the largest connected component (by triangle count).

    SDF reconstructions grow floater blobs in never-observed regions (the
    solid interior, outside the visual hull); the reference's DTU protocol
    crops them away with object masks (scripts/run.py eval).  Mask-free
    analog: connected components over shared mesh vertices, host-side."""
    import numpy as np
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = verts.shape[0]
    t = np.asarray(tris, np.int64)
    if t.shape[0] == 0:
        return verts, tris
    rows = np.concatenate([t[:, 0], t[:, 1], t[:, 2]])
    cols = np.concatenate([t[:, 1], t[:, 2], t[:, 0]])
    adj = coo_matrix(
        (np.ones(rows.shape[0], np.int8), (rows, cols)), shape=(n, n)
    )
    _, labels = connected_components(adj, directed=False)
    tri_label = labels[t[:, 0]]
    vals, counts = np.unique(tri_label, return_counts=True)
    keep = vals[np.argmax(counts)]
    keep_tris = t[tri_label == keep]
    used = np.unique(keep_tris)
    remap = np.full(n, -1, np.int64)
    remap[used] = np.arange(used.shape[0])
    return verts[used], remap[keep_tris].astype(tris.dtype)


@partial(jax.jit, static_argnames=("config", "chunk"))
def vertex_colors(
    params,
    config: FieldConfig,
    verts: jnp.ndarray,  # (V, 3) world-space (pre-warp) vertices
    aabb_lo: jnp.ndarray,
    aabb_diag: jnp.ndarray,
    chunk: int = 1 << 14,
) -> jnp.ndarray:
    """Per-vertex sRGB colors (V, 3) from the RGB head with outward view
    dirs — dir = normalize(pos - 0.5), the reference's "for want of a better
    choice" convention (compute_mesh_vertex_colors,
    src/testbed_nerf.cu:4071-4094 + generate_nerf_network_inputs_from_positions
    848-854)."""
    x_w = (verts - aabb_lo) / aabb_diag
    n = x_w.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xw = jnp.pad(x_w, ((0, pad), (0, 0)), constant_values=0.25).reshape(
        n_chunks, chunk, 3
    )

    def body(x):
        d = x - 0.5
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        out = field_forward(params, x, warp_direction(d), config)
        return out.rgb

    rgb = jax.lax.map(body, xw).reshape(-1, 3)[:n]
    return jnp.clip(rgb, 0.0, 1.0)


def vertex_normals(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Area-weighted 1-ring vertex normals (reference accumulate_1ring,
    src/marching_cubes.cu:331-360: per-face cross products atomically
    accumulated per vertex; deterministic bincount here)."""
    v = np.asarray(verts, np.float64)
    t = np.asarray(tris)
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    n = np.zeros_like(v)
    for k in range(3):
        for c in range(3):
            n[:, c] += np.bincount(t[:, k], weights=fn[:, c], minlength=len(v))
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n.astype(np.float32)


def smooth_vertices_1ring(verts: np.ndarray, tris: np.ndarray,
                          amount: float = 0.5) -> np.ndarray:
    """1-ring centroid smoothing (the other half of the reference's
    mesh-vertex optimization, accumulate_1ring's verts_out average blended
    by k_smooth_amount)."""
    v = np.asarray(verts, np.float64)
    t = np.asarray(tris)
    acc = np.zeros_like(v)
    cnt = np.zeros(len(v))
    # each triangle contributes its two other vertices to each corner's ring
    for k in range(3):
        for other in ((k + 1) % 3, (k + 2) % 3):
            cnt += np.bincount(t[:, k], minlength=len(v))
            for c in range(3):
                acc[:, c] += np.bincount(
                    t[:, k], weights=v[t[:, other], c], minlength=len(v)
                )
    ring = acc / np.maximum(cnt, 1.0)[:, None]
    has = cnt > 0
    out = v.copy()
    out[has] = v[has] * (1.0 - amount) + ring[has] * amount
    return out.astype(np.float32)


def save_mesh_obj(
    path: str | Path,
    verts: np.ndarray,
    tris: np.ndarray,
    scale: float = 1.0,
    offset=(0.0, 0.0, 0.0),
    normals: np.ndarray | None = None,
):
    """OBJ export, un-warping by dataset scale/offset (testbed.cu:315).

    Output vertices are (v - offset) / scale, i.e. original dataset space.
    """
    offset = np.asarray(offset, np.float32)
    v = (verts - offset) / scale
    path = Path(path)
    with open(path, "w") as f:
        f.write("# neus2_tpu marching cubes export\n")
        for p in v:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        if normals is not None:
            for n in normals:
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
            for t in tris:
                f.write(
                    f"f {t[0]+1}//{t[0]+1} {t[1]+1}//{t[1]+1} "
                    f"{t[2]+1}//{t[2]+1}\n"
                )
        else:
            for t in tris:
                f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def save_mesh_ply(
    path: str | Path,
    verts: np.ndarray,
    tris: np.ndarray,
    scale: float = 1.0,
    offset=(0.0, 0.0, 0.0),
    colors: np.ndarray | None = None,
    normals: np.ndarray | None = None,
):
    """Binary-less ASCII PLY export (reference save_mesh supports OBJ/PLY)."""
    offset = np.asarray(offset, np.float32)
    v = (verts - offset) / scale
    path = Path(path)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(v)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if normals is not None:
            f.write("property float nx\nproperty float ny\nproperty float nz\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        c8 = (
            np.clip(colors * 255.0, 0, 255).astype(np.uint8)
            if colors is not None else None
        )
        for i, p in enumerate(v):
            row = f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}"
            if normals is not None:
                n = normals[i]
                row += f" {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}"
            if c8 is not None:
                c = c8[i]
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def chamfer_distance(a: np.ndarray, b: np.ndarray, n_sample: int = 30000, seed: int = 0):
    """Symmetric point-set Chamfer distance (eval vs reference meshes)."""
    rng = np.random.default_rng(seed)
    if len(a) > n_sample:
        a = a[rng.choice(len(a), n_sample, replace=False)]
    if len(b) > n_sample:
        b = b[rng.choice(len(b), n_sample, replace=False)]
    a_j = jnp.asarray(a)
    b_j = jnp.asarray(b)

    @jax.jit
    def one_way(p, q):
        def body(pi):
            return jnp.min(jnp.sum((q - pi) ** 2, -1))
        return jnp.mean(jax.lax.map(body, p, batch_size=256))

    return float(jnp.sqrt(one_way(a_j, b_j)) + jnp.sqrt(one_way(b_j, a_j)))


def ring_centroids(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex 1-ring neighbor centroid (reference compute_mesh_1ring /
    accumulate_1ring, src/marching_cubes.cu:720-727: each triangle deposits
    its other two vertices, homogeneous-weight normalized).  Isolated
    vertices keep their own position."""
    a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
    pos = jnp.zeros_like(verts)
    w = jnp.zeros((verts.shape[0],), verts.dtype)
    for i, j, k in ((a, b, c), (b, c, a), (c, a, b)):
        pos = pos.at[i].add(verts[j] + verts[k])
        w = w.at[i].add(2.0)
    safe_w = jnp.maximum(w, 1.0)[:, None]
    return jnp.where(w[:, None] > 0, pos / safe_w, verts)


@partial(
    jax.jit,
    static_argnames=("config", "n_iters", "step", "k_smooth", "k_inflate"),
)
def refine_vertices(
    params,
    config: FieldConfig,
    verts_w: jnp.ndarray,  # (V, 3) in warped coords
    n_iters: int = 5,
    step: float = 0.8,
    faces: jnp.ndarray | None = None,
    k_smooth: float = 0.0,
    k_inflate: float = 0.0,
) -> jnp.ndarray:
    """Mesh-vertex optimization (reference compute_mesh_opt_gradients,
    src/marching_cubes.cu:728-762): per iteration the vertex moves by a
    Newton projection onto the SDF zero set (exact-step upgrade of the
    reference's sign(density)*k_density step), minus ``k_smooth`` times its
    offset from the 1-ring centroid (umbrella Laplacian), plus ``k_inflate``
    along the outward SDF normal.  Smoothing/inflation need ``faces``/the
    normal and default off, matching the pure-projection behavior."""
    from neus2_tpu.models.field import sdf_normal_features

    def body(v, _):
        s, n, _ = sdf_normal_features(params, v, config)
        n2 = jnp.sum(n * n, axis=-1, keepdims=True)
        v_new = v - step * s[:, None] * n / jnp.maximum(n2, 1e-8)
        if k_smooth and faces is not None:
            v_new = v_new - k_smooth * (v - ring_centroids(v, faces))
        if k_inflate:
            unit_n = n / jnp.sqrt(jnp.maximum(n2, 1e-12))
            v_new = v_new + k_inflate * unit_n
        return v_new, None

    out, _ = jax.lax.scan(body, verts_w, None, length=n_iters)
    return out
