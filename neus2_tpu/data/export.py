"""Export a NerfDataset to the NeuS2 ``from_na`` on-disk format.

The inverse of data/dataset.py's loader: writes per-frame PNGs and a
transforms.json with per-frame ``intrinsic_matrix`` / ``transform_matrix``
(reference data convention: README "Data Convention"; nerf_loader.cu:675-694).
Used by tests and by the synthetic-scene tooling; the real-data analog of the
reference's tools/data_format_from_neus.py converter.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from neus2_tpu.data.dataset import NerfDataset, ngp_matrix_to_nerf


def _linear_to_srgb_np(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.0031308, 12.92 * c, 1.055 * np.maximum(c, 1e-7) ** (1 / 2.4) - 0.055)


def save_dataset_na(ds: NerfDataset, out_dir: str | Path, name="transforms.json"):
    """Write images/ + transforms.json (from_na convention)."""
    out = Path(out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    import imageio.v2 as imageio

    w, h = ds.resolution
    frames = []
    offset = np.asarray(ds.offset, np.float32)
    for i in range(ds.n_images):
        img = ds.images[i]  # premultiplied-linear RGBA
        a = img[..., 3:4]
        rgb = np.where(a > 0, img[..., :3] / np.maximum(a, 1e-8), 0.0)
        srgb = np.clip(_linear_to_srgb_np(rgb), 0.0, 1.0)
        rgba8 = np.concatenate([srgb, a], -1)
        rgba8 = (rgba8 * 255.0 + 0.5).astype(np.uint8)
        rel = f"images/{i:04d}.png"
        imageio.imwrite(str(out / rel), rgba8)

        fx, fy = ds.focal[i]
        cx, cy = ds.principal[i]
        intrinsic = [
            [float(fx), 0.0, float(cx * w), 0.0],
            [0.0, float(fy), float(cy * h), 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
        # Invert the loader's nerf_matrix_to_ngp for from_na data.
        mat = ngp_matrix_to_nerf(ds.poses[i], ds.scale, offset, from_na=True)
        mat4 = np.concatenate([mat, [[0, 0, 0, 1]]], axis=0)
        frames.append(
            {
                "file_path": rel,
                "intrinsic_matrix": intrinsic,
                "transform_matrix": [[float(v) for v in row] for row in mat4],
            }
        )
    meta = {
        "from_na": True,
        "w": w,
        "h": h,
        "aabb_scale": ds.aabb_scale,
        "scale": ds.scale,
        "offset": list(np.asarray(ds.offset, float)),
        "frames": frames,
    }
    with open(out / name, "w") as f:
        json.dump(meta, f, indent=1)
    return out / name
