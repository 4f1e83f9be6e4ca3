"""Batched SE(3) poses stored as (R, C): world->camera rotation + camera center.

Reference parity: openMVG geometry/pose3.hpp:23 stores (rotation_, center_)
with  x_cam = R (x_world - C),  translation t = -R C.  We keep the same
convention so openMVG sfm_data files round-trip exactly.  A "Poses" batch is
just a pair of arrays (R: (N,3,3), C: (N,3)); every function broadcasts.
"""

from typing import NamedTuple

import jax.numpy as jnp


class Pose(NamedTuple):
    """Batched world->camera pose(s): x_cam = R @ (x_world - C)."""

    R: jnp.ndarray  # (..., 3, 3)
    C: jnp.ndarray  # (..., 3)

    @property
    def t(self):
        """Translation t = -R C so that x_cam = R x + t."""
        return -jnp.einsum("...ij,...j->...i", self.R, self.C)

    def apply(self, X):
        """World point(s) (..., 3) -> camera frame."""
        return jnp.einsum("...ij,...j->...i", self.R, X - self.C)

    def inverse(self):
        """Camera->world pose: parity pose3.hpp inverse()."""
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(R=Rt, C=-jnp.einsum("...ij,...j->...i", self.R, self.C))

    def compose(self, other):
        """self * other (apply other first): parity pose3.hpp operator*."""
        return Pose(
            R=self.R @ other.R,
            C=other.C + jnp.einsum("...ij,...j->...i", jnp.swapaxes(other.R, -1, -2), self.C),
        )


def pose_from_Rt(R, t):
    """Build Pose from (R, t) with t = -R C  =>  C = -R^T t."""
    C = -jnp.einsum("...ji,...j->...i", R, t)
    return Pose(R=R, C=C)


def relative_pose(pose_a: Pose, pose_b: Pose) -> Pose:
    """Pose of b relative to a: x_b = R_rel (x_a - C_rel).

    Parity: sequential/global engines compute pose_b * pose_a.inverse().
    """
    R_rel = pose_b.R @ jnp.swapaxes(pose_a.R, -1, -2)
    C_rel = jnp.einsum("...ij,...j->...i", pose_a.R, pose_b.C - pose_a.C)
    return Pose(R=R_rel, C=C_rel)
