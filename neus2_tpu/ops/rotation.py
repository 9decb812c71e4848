"""Rigid-transform math: 6D rotation parameterization (Gram-Schmidt) and helpers.

Behavior contract follows the reference's 6D-rotation representation
(reference: include/neural-graphics-primitives/common_operation.cuh:38-61
`rotation_6d_to_matrix`), i.e. Zhou et al., "On the Continuity of Rotation
Representations in Neural Networks".  All functions are pure jnp and fully
differentiable (JAX autodiff replaces the reference's hand-derived
`gradient_rotation_matrix_to_6d`).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Convert a 6D rotation representation to a 3x3 rotation matrix.

    ``d6`` holds the first two rows (a1, a2) of a rotation matrix before
    orthonormalization; rows are Gram-Schmidt orthonormalized and the third is
    their cross product.  Shape (..., 6) -> (..., 3, 3).
    """
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = a2 - dot * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(mat: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rotation_6d_to_matrix`: take the first two rows."""
    return jnp.concatenate([mat[..., 0, :], mat[..., 1, :]], axis=-1)


def identity_6d() -> jnp.ndarray:
    """The 6D representation of the identity rotation."""
    return jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype=jnp.float32)


def apply_rigid(
    rotation: jnp.ndarray, translation: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Apply ``R @ p + t`` to points of shape (..., 3)."""
    return jnp.einsum("ij,...j->...i", rotation, points) + translation


def apply_rotation(rotation: jnp.ndarray, vectors: jnp.ndarray) -> jnp.ndarray:
    """Apply ``R @ v`` to direction vectors of shape (..., 3)."""
    return jnp.einsum("ij,...j->...i", rotation, vectors)


def compose_rigid(
    r_new: jnp.ndarray,
    t_new: jnp.ndarray,
    r_acc: jnp.ndarray,
    t_acc: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold a per-frame delta transform into the accumulated transform.

    Mirrors the reference's ``accumulate_global_movement``
    (nerf_network.h:1163, common_operation.cuh:551+): the accumulated map is
    ``x -> R_new @ (R_acc @ x + t_acc) + t_new``, i.e.
    ``R' = R_new R_acc``, ``t' = R_new t_acc + t_new``.
    """
    r = r_new @ r_acc
    t = r_new @ t_acc + t_new
    return r, t
