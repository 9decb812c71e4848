"""Convert a NeuS-format dataset (cameras_sphere.npz) to from_na transforms.json.

Equivalent of the reference's tools/data_format_from_neus.py (238 LoC): NeuS
datasets store per-image projection matrices ``world_mat_{i}`` (P = K [R|t])
and normalization matrices ``scale_mat_{i}``; the converter decomposes P into
intrinsics + camera-to-world pose, applies the scale normalization, and emits
a transforms.json with per-frame ``intrinsic_matrix`` / ``transform_matrix``
in the NA convention (consumed by data/dataset.py).

Usage: python -m neus2_tpu.tools.from_neus <neus_case_dir> <out_dir>
       (expects <case>/cameras_sphere.npz and <case>/image/*.png)
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

import numpy as np


def load_K_Rt_from_P(P: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection into K (3,3) and camera-to-world (4,4).

    Same RQ-based decomposition the NeuS codebase (and the reference
    converter) uses, via cv2.decomposeProjectionMatrix.
    """
    import cv2

    out = cv2.decomposeProjectionMatrix(P[:3, :4])
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return K.astype(np.float32), pose


def convert(case_dir: str | Path, out_dir: str | Path, image_glob="image/*.png"):
    case_dir = Path(case_dir)
    out_dir = Path(out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)

    cams = np.load(case_dir / "cameras_sphere.npz")
    images = sorted(case_dir.glob(image_glob))
    if not images:
        raise FileNotFoundError(f"no images under {case_dir}/{image_glob}")

    import imageio.v2 as imageio

    first = imageio.imread(str(images[0]))
    h, w = first.shape[:2]

    frames = []
    for i, img_path in enumerate(images):
        world_mat = cams[f"world_mat_{i}"]
        scale_mat = cams.get(f"scale_mat_{i}", np.eye(4))
        P = (world_mat @ scale_mat)[:3, :4]
        K, pose = load_K_Rt_from_P(P)
        rel = f"images/{i:04d}.png"
        shutil.copyfile(img_path, out_dir / rel)
        frames.append(
            {
                "file_path": rel,
                "intrinsic_matrix": [
                    [float(K[0, 0]), 0.0, float(K[0, 2]), 0.0],
                    [0.0, float(K[1, 1]), float(K[1, 2]), 0.0],
                    [0.0, 0.0, 1.0, 0.0],
                    [0.0, 0.0, 0.0, 1.0],
                ],
                "transform_matrix": [[float(v) for v in row] for row in pose],
            }
        )

    meta = {
        "from_na": True,
        "w": w,
        "h": h,
        # NeuS scale_mats normalize the object into the unit sphere; the
        # NA convention then maps it into the [0.25, 0.75]^3 region
        # (reference data convention: scale 0.5, offset (0.5,)*3).
        "scale": 0.5,
        "offset": [0.5, 0.5, 0.5],
        "aabb_scale": 1,
        "frames": frames,
    }
    out_json = out_dir / "transforms.json"
    with open(out_json, "w") as f:
        json.dump(meta, f, indent=1)
    return out_json


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    print(convert(sys.argv[1], sys.argv[2]))
