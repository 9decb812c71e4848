"""Hashgrid introspection: per-level weight statistics and histograms.

Mirrors the reference GUI's encoding diagnostics (compute_level_stats /
Testbed::gather_histograms, src/testbed.cu:3056-3117; LevelStats,
include/.../testbed.h:230-244): per level — count of near-zero entries,
mean/sigma/min/max over the non-zero ones — plus a fixed-scale 257-bin
histogram of one level's weights for cross-level comparison.

Usage:
    stats = hashgrid_level_stats(tb.state.params)
    hist = hashgrid_level_histogram(tb.state.params, level=5)
CLI: python -m neus2_tpu.run ... --grid_stats logs the table per run.
"""

from __future__ import annotations

import numpy as np

ZERO_EPS = 1e-5  # reference compute_level_stats: |v| < 0.00001 counts as zero


def hashgrid_level_stats(params) -> list[dict]:
    """Per-level stats of the (effective) hashgrid tables.

    Returns one dict per level: {level, size, count, numzero, fraczero,
    mean, sigma, min, max} over entries with |v| >= 1e-5 (the reference's
    near-zero cut keeps untouched hash rows from flattening the moments).
    """
    from neus2_tpu.models.field import effective_grid_tables

    out = []
    for l, t in enumerate(effective_grid_tables(params)):
        v = np.asarray(t, np.float32).ravel()
        nz = np.abs(v) >= ZERO_EPS
        live = v[nz]
        n = int(live.size)
        out.append(
            {
                "level": l,
                "size": int(v.size),
                "count": n,
                "numzero": int(v.size - n),
                "fraczero": float((v.size - n) / max(v.size, 1)),
                "mean": float(live.mean()) if n else 0.0,
                "sigma": float(live.std()) if n else 0.0,
                "min": float(live.min()) if n else 0.0,
                "max": float(live.max()) if n else 0.0,
            }
        )
    return out


def hashgrid_level_histogram(
    params, level: int, histo_scale: float = 1.0
) -> np.ndarray:
    """257-bin histogram of one level's non-zero weights.

    Reference binning (testbed.cu:3100-3113): bin = floor(v * 128 /
    histo_scale + 128.5), clipped to [0, 256] — a fixed scale so histograms
    are comparable across levels.
    """
    from neus2_tpu.models.field import effective_grid_tables

    tables = effective_grid_tables(params)
    v = np.asarray(tables[level], np.float32).ravel()
    v = v[v != 0.0]
    bins = np.floor(v * (128.0 / histo_scale) + 128.5).astype(np.int64)
    bins = bins[(bins >= 0) & (bins <= 256)]
    return np.bincount(bins, minlength=257)


def format_level_stats(stats: list[dict]) -> str:
    """Fixed-width text table (the GUI panel's text analog)."""
    lines = [
        f"{'lvl':>3} {'size':>9} {'nonzero':>9} {'frac0':>6} "
        f"{'mean':>9} {'sigma':>9} {'min':>9} {'max':>9}"
    ]
    for s in stats:
        lines.append(
            f"{s['level']:>3} {s['size']:>9} {s['count']:>9} "
            f"{s['fraczero']:>6.3f} {s['mean']:>9.5f} {s['sigma']:>9.5f} "
            f"{s['min']:>9.5f} {s['max']:>9.5f}"
        )
    return "\n".join(lines)
