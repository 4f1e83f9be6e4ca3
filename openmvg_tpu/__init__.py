"""openmvg_tpu — a TPU-native Structure-from-Motion framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of openMVG
(reference: /root/reference): feature extraction, descriptor matching,
robust multi-view geometry (AC-RANSAC over E/F/H/resection), tracks,
triangulation, incremental & global reconstruction engines, and a
from-scratch batched Schur-complement bundle adjuster — all built on
batched arrays, pure functions and sharded pytrees rather than the
reference's per-object C++ design.

Layout:
  core/      dtypes, constants, batched linalg helpers
  geometry/  SO(3)/SE(3), similarity transforms, frusta
  models/    camera models (pinhole, radial k1/k3, brown, fisheye, spherical)
  ops/       batched compute kernels: solvers, RANSAC, matching, SIFT, averaging
  sfm/       scene pytree, tracks, engines (incremental/global), bundle adjustment
  io/        openMVG-compatible file formats (sfm_data json/bin, .feat/.desc, matches)
  parallel/  mesh/sharding utilities, distributed matching + BA
  utils/     host-side graph algorithms, union-find, logging, reports
"""

__version__ = "0.1.0"

# TPU correctness: XLA:TPU's default f32 matmul precision is bf16 passes,
# which silently destroys the conditioning of the geometric solvers (SVD
# null spaces, Gauss-Jordan eliminations: observed on-chip as AC-RANSAC
# accepting degenerate essential matrices with threshold 0).  Force full
# f32 matmul precision package-wide; compute paths that are safe at lower
# precision opt back in explicitly (descriptor matching runs int8/bf16
# MXU paths by explicit input dtypes, SIFT's Gaussian pyramid passes
# precision=DEFAULT).  No effect on CPU, where f32 matmuls are exact.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
