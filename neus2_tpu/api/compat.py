"""pyngp-shaped attribute namespaces over the Testbed.

The reference exposes its scripting surface through pybind11 as
``testbed.nerf.<attr>`` and ``testbed.nerf.training.<attr>`` (reference:
src/python_api.cu:416-487 — the ``Nerf`` / ``Nerf::Training`` sub-objects),
and its own driver scripts (scripts/run.py, scripts/run_dynamic.py) set these
directly.  Here both namespaces are thin views that read/write the Testbed's
``TrainConfig`` (a frozen dataclass: every write swaps in a replaced config,
which keys a fresh jit cache entry — the analog of the reference rebuilding
its CUDA graph on a settings change).

Only knobs with a real backing implementation are exposed; anything else
raises AttributeError rather than silently accepting and ignoring a setting.
"""

from __future__ import annotations

import dataclasses


def _cfg_property(field: str, doc: str):
    """A property that proxies a TrainConfig field on the owning Testbed."""

    def get(self):
        return getattr(self._tb.config, field)

    def set(self, value):
        self._tb.config = dataclasses.replace(
            self._tb.config, **{field: type(getattr(self._tb.config, field))(value)}
        )

    return property(get, set, doc=doc)


class NerfTrainingView:
    """``testbed.nerf.training`` (reference python_api.cu:429-470)."""

    def __init__(self, tb):
        self._tb = tb

    random_bg_color = _cfg_property(
        "random_bg",
        "Train transparent pixels against a per-ray random background "
        "(reference m_nerf.training.random_bg_color, testbed_nerf.cu:1642).",
    )
    near_distance = _cfg_property(
        "near",
        "Minimum marching distance along each training ray "
        "(reference m_nerf.training.near_distance).",
    )
    depth_supervision_lambda = _cfg_property(
        "depth_supervision_lambda",
        "Weight of the L2 depth term (reference depth_supervision_lambda).",
    )
    optimize_extrinsics = _cfg_property(
        "optimize_extrinsics",
        "Jointly optimize per-image camera poses (reference "
        "m_nerf.training.optimize_extrinsics).",
    )
    optimize_exposure = _cfg_property(
        "optimize_exposure",
        "Jointly optimize per-image exposure (reference optimize_exposure).",
    )
    optimize_focal_length = _cfg_property(
        "optimize_focal_length",
        "Jointly optimize the shared focal length (reference "
        "optimize_focal_length).",
    )

    @property
    def n_images_for_training(self) -> int:
        """Number of training images in the current frame's dataset
        (reference n_images_for_training, python_api.cu:448)."""
        ds = self._tb.dataset
        return 0 if ds is None else int(ds.n_images)


class NerfView:
    """``testbed.nerf`` (reference python_api.cu:416-427)."""

    def __init__(self, tb):
        self._tb = tb
        self.training = NerfTrainingView(tb)

    cone_angle_constant = _cfg_property(
        "cone_angle_constant",
        "Marching step growth rate dt ~ cone*t (reference "
        "m_nerf.cone_angle_constant = 1/256, testbed_nerf.cu:58).",
    )

    @property
    def rendering_min_transmittance(self) -> float:
        """Early-out transmittance for eval renders (reference
        m_nerf.rendering_min_transmittance; eval protocol 1e-4)."""
        return self._tb.rendering_min_transmittance

    @rendering_min_transmittance.setter
    def rendering_min_transmittance(self, v: float):
        self._tb.rendering_min_transmittance = float(v)

    @property
    def render_with_camera_distortion(self) -> bool:
        """Apply the dataset's lens model when rendering (reference
        m_nerf.render_with_camera_distortion)."""
        return self._tb.render_with_camera_distortion

    @render_with_camera_distortion.setter
    def render_with_camera_distortion(self, v: bool):
        self._tb.render_with_camera_distortion = bool(v)

    @property
    def sharpen(self) -> float:
        """Unsharp-mask amount applied to the training images (reference
        sharpen kernel, nerf_loader.cu:103-123, center weight 4 + 1/amount).
        Setting re-filters the current frame's images from the pristine
        host copy (idempotent)."""
        return self._tb._sharpen

    @sharpen.setter
    def sharpen(self, amount: float):
        self._tb._sharpen = float(amount)
        self._tb._refresh_images()


# Canonical implementation in ops/image.py — shared with the loader's json
# "sharpen" key (data/dataset.py); re-exported here for the nerf.sharpen
# setter's callers.
from neus2_tpu.ops.image import sharpen_images  # noqa: E402  (re-export)
