"""Collection geometric filtering of putative matches.

Reference parity: matching_image_collection/GeometricFilter.hpp
ImageCollectionGeometricFilter::Robust_model_estimation (:31-63) with the
per-model AC-RANSAC functors F/E/H/angular (F_ACRobust.hpp:89 etc.):
for every pair run AC-RANSAC with an upper-bound precision (default 4 px,
max 2048 iterations in main_GeometricFilter.cpp), keep the pair if a
meaningful model with > 2.5x MINIMUM_SAMPLES inliers is found, and keep
only the inlier matches.
"""

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm import robust
from openmvg_tpu.sfm.pipeline_incremental import _pad_pow2

MIN_SAMPLES = {"f": 7, "e": 5, "h": 4, "a": 8}


def geometric_filter(scene, features: List[np.ndarray],
                     matches: Dict[Tuple[int, int], np.ndarray],
                     model: str = "f", threshold_px: float = 4.0,
                     n_samples: int = 2048, seed: int = 0,
                     guided: bool = False, descs: List[np.ndarray] = None,
                     ) -> Dict[Tuple[int, int], np.ndarray]:
    """Filter putative matches with the chosen geometric model
    ('f' fundamental | 'e' essential | 'h' homography | 'a' angular).

    guided=True (main_GeometricFilter -r, model 'f' only): pairs that pass
    are re-matched over ALL features gated by distance to the estimated
    F's epipolar lines (Geometry_guided_matching, GeometricFilter.hpp:109);
    requires `descs`."""
    key = jax.random.PRNGKey(seed)
    out = {}
    prec = threshold_px * threshold_px if np.isfinite(threshold_px) else np.inf
    for n_pair, ((va, vb), m) in enumerate(sorted(matches.items())):
        m = np.asarray(m)
        n = len(m)
        if n <= MIN_SAMPLES[model]:
            continue
        xa = features[va][m[:, 0], :2]
        xb = features[vb][m[:, 1], :2]
        (xa_p, xb_p), k = _pad_pow2([xa, xb], n)
        valid = np.arange(k) < n
        wh_a = scene.view_wh[va]
        wh_b = scene.view_wh[vb]
        pkey = jax.random.fold_in(key, n_pair)
        if model == "f":
            res = robust.robust_fundamental(
                pkey, jnp.asarray(xa_p), jnp.asarray(xb_p), jnp.asarray(valid),
                float(wh_a[0]), float(wh_a[1]), float(wh_b[0]), float(wh_b[1]),
                n_samples=n_samples, precision_sq=prec)
        elif model == "h":
            res = robust.robust_homography(
                pkey, jnp.asarray(xa_p), jnp.asarray(xb_p), jnp.asarray(valid),
                float(wh_a[0]), float(wh_a[1]), float(wh_b[0]), float(wh_b[1]),
                n_samples=n_samples, precision_sq=prec)
        elif model in ("e", "a"):
            ka = scene.view_intrinsic[va]
            kb = scene.view_intrinsic[vb]
            cams = scene.cameras
            def bear(iid, x):
                return np.asarray(cm.bearing(
                    jnp.asarray(np.asarray(cams.kind)[iid]),
                    jnp.asarray(np.asarray(cams.params)[iid]),
                    jnp.asarray(np.asarray(cams.width)[iid]),
                    jnp.asarray(np.asarray(cams.height)[iid]),
                    jnp.asarray(x)))
            (ba_p, bb_p), _ = _pad_pow2([bear(ka, xa), bear(kb, xb)], n)
            if model == "a":
                res = robust.robust_essential_angular(
                    pkey, jnp.asarray(ba_p), jnp.asarray(bb_p),
                    jnp.asarray(valid), n_samples=n_samples)
            else:
                Ka = np.asarray(cm.K_matrix(jnp.asarray(np.asarray(cams.params)[ka])))
                Kb = np.asarray(cm.K_matrix(jnp.asarray(np.asarray(cams.params)[kb])))
                res = robust.robust_essential(
                    pkey, jnp.asarray(ba_p), jnp.asarray(bb_p),
                    jnp.asarray(xa_p), jnp.asarray(xb_p), jnp.asarray(Ka),
                    jnp.asarray(Kb), jnp.asarray(valid),
                    float(wh_b[0]), float(wh_b[1]),
                    n_samples=n_samples, precision_sq=prec)
        else:
            raise ValueError(f"unknown model {model}")
        inl = np.asarray(res.inliers)[:n]
        if bool(res.found) and inl.sum() > 2.5 * MIN_SAMPLES[model]:
            if guided and model == "f" and descs is not None:
                from openmvg_tpu.sfm.known_poses import guided_matching_pair

                thr = float(np.sqrt(float(res.threshold_sq)))
                gm = guided_matching_pair(
                    scene, va, vb, features[va], features[vb],
                    descs[va], descs[vb],
                    epipolar_threshold_px=thr, F=np.asarray(res.model))
                out[(va, vb)] = gm if len(gm) >= inl.sum() else m[inl]
            else:
                out[(va, vb)] = m[inl]
    return out
