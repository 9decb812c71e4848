"""Flagship hash-grid variants shared by bench.py and the validation tools.

``parity`` is the reference's base.json grid (L14/F2, 2^19 table, top-res
2048 — configs/base.json); ``tpu_opt`` (L7/F4) and ``l4f8`` (L4/F8) hold the
total feature width and table capacity fixed while cutting the level count —
the lever TPU step cost actually scales with (PERF.md speed-of-light budget).
Mirrors configs/{base,tpu_opt,l4f8}.json; kept as one helper so the bench
and every validator construct identical grids.
"""

from __future__ import annotations

from neus2_tpu.ops.hashgrid import HashGridConfig

FLAGSHIP_VARIANTS = {
    "parity": (14, 2),
    "tpu_opt": (7, 4),
    "l4f8": (4, 8),
}


def flagship_grid(variant: str = "parity") -> HashGridConfig:
    levels, feats = FLAGSHIP_VARIANTS[variant or "parity"]
    return HashGridConfig(
        n_levels=levels,
        n_features_per_level=feats,
        log2_hashmap_size=19,
        base_resolution=16,
        per_level_scale=HashGridConfig.per_level_scale_from_top(
            16, 2048, levels
        ),
    )
