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
