"""Learnable global rigid transform for dynamic scenes ("DeltaNetwork").

TPU-native restatement of the reference DeltaNetwork
(reference: include/neural-graphics-primitives/transform_network.h:23-250 and
common_operation.cuh:417-513 `add_global_movement_with_rotation_6d`): a 9-DoF
(6D rotation + 3 translation) transform applied to warped sample positions and
directions.  The reference hand-derives per-DoF gradients and reduce_sums
them; here the transform is a pure function and JAX autodiff produces the
same gradients.

State layout:
  * ``delta`` params {"rotation6d", "transition"} — the trainable per-frame
    transform (only optimized during the pose-refinement phase);
  * accumulated transform {"rotation" (3,3), "transition" (3,)} — frozen
    product of all past frames' deltas, applied to rays at generation time
    (reference testbed_nerf.cu:1383-1387).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from neus2_tpu.ops.rotation import (
    apply_rotation,
    identity_6d,
    rotation_6d_to_matrix,
)
from neus2_tpu.ops.warp import unwarp_direction, warp_direction

Params = dict[str, Any]


def init_delta() -> Params:
    """Identity transform (reference transform_network.h init: 6D identity)."""
    return {
        "rotation6d": identity_6d(),
        "transition": jnp.zeros((3,), jnp.float32),
    }


def init_accumulated() -> Params:
    return {
        "rotation": jnp.eye(3, dtype=jnp.float32),
        "transition": jnp.zeros((3,), jnp.float32),
    }


def apply_delta(
    delta: Params,
    pos_warped: jnp.ndarray,
    dir_warped: jnp.ndarray,
    first_frame_offset: jnp.ndarray | float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the per-frame delta transform to warped sample pos/dirs.

    Matches add_global_movement_with_rotation_6d (common_operation.cuh:417-473):
      pos' = R @ (pos + t - o) + o
      dir' = warp(R @ unwarp(dir))
    with o = first_frame_offset (default 0, reference transform_network.h:460).
    """
    rot = rotation_6d_to_matrix(delta["rotation6d"])
    pos = pos_warped + delta["transition"] - first_frame_offset
    pos = apply_rotation(rot, pos) + first_frame_offset
    d = unwarp_direction(dir_warped)
    d = apply_rotation(rot, d)
    return pos, warp_direction(d)


def apply_accumulated_to_rays(
    acc: Params,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    first_frame_offset: jnp.ndarray | float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the accumulated transform to rays at generation time.

    Matches generate_training_samples_nerf_with_global_movement
    (testbed_nerf.cu:1380-1387 + global_movement_with_rotation_6d at 194-213):
    o' = R_acc @ (o - ffo) + t_acc, d' = R_acc @ d.
    """
    o = apply_rotation(acc["rotation"], ray_o - first_frame_offset) + acc["transition"]
    d = apply_rotation(acc["rotation"], ray_d)
    return o, d


def accumulate_delta(acc: Params, delta: Params) -> Params:
    """Fold a converged per-frame delta into the accumulated transform.

    Reference accumulate_global_movement_rotation_6d_kernel
    (common_operation.cuh:551-586):
      R_acc' = R_delta @ R_acc;  t_acc' = R_delta @ (t_acc + t_delta).
    This equals (delta map) o (acc map) given the apply conventions: the delta
    map is x -> R_d (x + t_d) and the accumulated ray map is x -> R_a x + t_a.
    """
    rot = rotation_6d_to_matrix(delta["rotation6d"])
    return {
        "rotation": rot @ acc["rotation"],
        "transition": apply_rotation(rot, acc["transition"] + delta["transition"]),
    }
