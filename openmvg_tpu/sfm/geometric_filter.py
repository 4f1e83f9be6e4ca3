"""Collection geometric filtering of putative matches — batched.

Reference parity: matching_image_collection/GeometricFilter.hpp
ImageCollectionGeometricFilter::Robust_model_estimation (:31-63) with the
per-model AC-RANSAC functors F/E/H/angular/upright/ortho
(F_ACRobust.hpp:89, E_ACRobust.hpp, E_ACRobust_Angular.hpp:34-111,
Eo_Robust.hpp:50-120; model dispatch main_GeometricFilter.cpp:165-368):
for every pair run AC-RANSAC with an upper-bound precision (default 4 px,
2.0 px for ortho, max 2048 iterations), keep the pair if a meaningful
model with > 2.5x MINIMUM_SAMPLES inliers is found, and keep only the
inlier matches.

TPU recast: the reference OpenMPs one AC-RANSAC per pair
(GeometricFilter.hpp:79-82); here pairs are bucketed by pow2
correspondence count and every (bucket, chunk) group runs as ONE vmapped
AC-RANSAC device program — the same batching the relative-pose engine
uses one file over (pipeline_incremental.relative_pose_batch).
"""

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm import robust
from openmvg_tpu.utils import hostmath

MIN_SAMPLES = {"f": 7, "e": 5, "h": 4, "a": 8, "u": 3, "o": 3}
# ortho runs at 2.0 px like GeometricFilter_EOMatrix_RA(2.0, ...)
# (main_GeometricFilter.cpp:358-361); every other model at the caller's
# threshold (4.0 px default)
ORTHO_DEFAULT_PRECISION_PX = 2.0


def _pow2(n, lo=64):
    k = lo
    while k < n:
        k *= 2
    return k


def geometric_filter(scene, features: List[np.ndarray],
                     matches: Dict[Tuple[int, int], np.ndarray],
                     model: str = "f", threshold_px: float = None,
                     n_samples: int = 2048, seed: int = 0,
                     guided: bool = False, descs: List[np.ndarray] = None,
                     chunk: int = None,
                     ) -> Dict[Tuple[int, int], np.ndarray]:
    """Filter putative matches with the chosen geometric model
    ('f' fundamental | 'e' essential | 'h' homography | 'a' angular |
    'u' upright essential | 'o' orthographic essential).

    guided=True (main_GeometricFilter -r, model 'f' only): pairs that pass
    are re-matched over ALL features gated by distance to the estimated
    F's epipolar lines (Geometry_guided_matching, GeometricFilter.hpp:109);
    requires `descs`.

    chunk = pairs per device program, default 4096 // n_samples: vmapped
    solver instance counts (pairs x samples) above ~4096 reproducibly
    crash the v5e TPU worker (measured round 3)."""
    if model not in MIN_SAMPLES:
        raise ValueError(f"unknown model {model}")
    if chunk is None:
        chunk = max(1, 4096 // max(n_samples, 1))
    if threshold_px is None:
        # per-model reference default: 2.0 px for ortho, 4.0 px otherwise
        # (main_GeometricFilter.cpp:342-361 functor constructor arguments)
        threshold_px = ORTHO_DEFAULT_PRECISION_PX if model == "o" else 4.0
    key = jax.random.PRNGKey(seed)
    prec = threshold_px * threshold_px if np.isfinite(threshold_px) else np.inf

    kinds = np.asarray(scene.cameras.kind)
    params = np.asarray(scene.cameras.params)
    widths = np.asarray(scene.cameras.width)
    heights = np.asarray(scene.cameras.height)
    K_all = hostmath.K_matrix_np(params)

    # ---- gather correspondences for every admissible pair --------------
    recs = []
    for n_pair, ((va, vb), m) in enumerate(sorted(matches.items())):
        m = np.asarray(m)
        if len(m) <= MIN_SAMPLES[model]:
            continue
        recs.append(dict(pos=n_pair, va=int(va), vb=int(vb), m=m,
                         xa=features[va][m[:, 0], :2],
                         xb=features[vb][m[:, 1], :2]))
    if not recs:
        return {}
    keys_all = np.asarray(_fold_keys_gf(key, [r["pos"] for r in recs]))
    for r, kr in zip(recs, keys_all):
        r["key"] = kr

    # bearings (one padded device call over every correspondence) for the
    # models that need them; camera-plane xy for ortho
    if model in ("e", "a", "u", "o"):
        xy_cat = np.concatenate(
            [np.concatenate([r["xa"], r["xb"]]) for r in recs])
        iid_cat = np.concatenate([
            np.concatenate([
                np.full(len(r["xa"]), scene.view_intrinsic[r["va"]]),
                np.full(len(r["xb"]), scene.view_intrinsic[r["vb"]])])
            for r in recs])
        b_cat = hostmath.padded_apply(cm.bearing_jit, (
            kinds[iid_cat], params[iid_cat], widths[iid_cat],
            heights[iid_cat], xy_cat))
        ofs = 0
        for r in recs:
            n = len(r["m"])
            r["ba"] = b_cat[ofs:ofs + n]
            r["bb"] = b_cat[ofs + n:ofs + 2 * n]
            ofs += 2 * n

    buckets = {}
    for r in recs:
        buckets.setdefault(_pow2(len(r["m"])), []).append(r)

    out = {}
    for k, rs in buckets.items():
        for lo in range(0, len(rs), chunk):
            grp = rs[lo:lo + chunk]
            P = min(chunk, _pow2(len(grp), lo=1))

            def padk(field, width):
                a = np.zeros((P, k, width))
                for i in range(P):
                    r = grp[min(i, len(grp) - 1)]
                    a[i, :len(r["m"])] = r[field]
                return jnp.asarray(a)

            valid = np.zeros((P, k), bool)
            wh_a = np.zeros((P, 2))
            wh_b = np.zeros((P, 2))
            keys = np.zeros((P,) + keys_all.shape[1:], keys_all.dtype)
            for i in range(P):
                r = grp[min(i, len(grp) - 1)]
                valid[i, :len(r["m"])] = True
                wh_a[i] = scene.view_wh[r["va"]]
                wh_b[i] = scene.view_wh[r["vb"]]
                keys[i] = r["key"]
            keys = jnp.asarray(keys)
            valid_j = jnp.asarray(valid)
            w1, h1 = jnp.asarray(wh_a[:, 0]), jnp.asarray(wh_a[:, 1])
            w2, h2 = jnp.asarray(wh_b[:, 0]), jnp.asarray(wh_b[:, 1])

            if model == "f":
                res = robust.robust_fundamental_batch(
                    keys, padk("xa", 2), padk("xb", 2), valid_j,
                    w1, h1, w2, h2, n_samples=n_samples, precision_sq=prec)
            elif model == "h":
                res = robust.robust_homography_batch(
                    keys, padk("xa", 2), padk("xb", 2), valid_j,
                    w1, h1, w2, h2, n_samples=n_samples, precision_sq=prec)
            elif model == "e":
                Ka = np.zeros((P, 3, 3))
                Kb = np.zeros((P, 3, 3))
                for i in range(P):
                    r = grp[min(i, len(grp) - 1)]
                    Ka[i] = K_all[scene.view_intrinsic[r["va"]]]
                    Kb[i] = K_all[scene.view_intrinsic[r["vb"]]]
                res = robust.robust_essential_batch(
                    keys, padk("ba", 3), padk("bb", 3), padk("xa", 2),
                    padk("xb", 2), jnp.asarray(Ka), jnp.asarray(Kb),
                    valid_j, w2, h2, n_samples=n_samples, precision_sq=prec)
            elif model == "a":
                res = robust.robust_essential_angular_batch(
                    keys, padk("ba", 3), padk("bb", 3), valid_j,
                    n_samples=n_samples)
            elif model == "u":
                res = robust.robust_essential_upright_batch(
                    keys, padk("ba", 3), padk("bb", 3), valid_j,
                    n_samples=n_samples)
            else:  # "o": camera-plane points, per-pair converted precision
                for r in grp:
                    r["ca"] = r["ba"][:, :2] / np.maximum(
                        np.abs(r["ba"][:, 2:]), 1e-12) * np.sign(r["ba"][:, 2:])
                    r["cb"] = r["bb"][:, :2] / np.maximum(
                        np.abs(r["bb"][:, 2:]), 1e-12) * np.sign(r["bb"][:, 2:])
                prec_o = np.full(P, np.inf)
                thr_o = ORTHO_DEFAULT_PRECISION_PX ** 2 \
                    if not np.isfinite(prec) else prec
                for i in range(P):
                    r = grp[min(i, len(grp) - 1)]
                    fa = params[scene.view_intrinsic[r["va"]], 0]
                    fb = params[scene.view_intrinsic[r["vb"]], 0]
                    prec_o[i] = 0.5 * (thr_o / fa + thr_o / fb)
                res = robust.robust_essential_ortho_batch(
                    keys, padk("ca", 2), padk("cb", 2), valid_j, w2, h2,
                    jnp.asarray(prec_o), n_samples=n_samples)

            found = np.asarray(res.found)
            inliers = np.asarray(res.inliers)
            thr_sq = np.asarray(res.threshold_sq)
            models = res.model
            for i, r in enumerate(grp):
                n = len(r["m"])
                inl = inliers[i, :n]
                if not found[i] or inl.sum() <= 2.5 * MIN_SAMPLES[model]:
                    continue
                if guided and model == "f" and descs is not None:
                    from openmvg_tpu.sfm.known_poses import \
                        guided_matching_pair

                    thr = float(np.sqrt(float(thr_sq[i])))
                    gm = guided_matching_pair(
                        scene, r["va"], r["vb"], features[r["va"]],
                        features[r["vb"]], descs[r["va"]], descs[r["vb"]],
                        epipolar_threshold_px=thr,
                        F=np.asarray(models)[i])
                    out[(r["va"], r["vb"])] = (gm if len(gm) >= inl.sum()
                                               else r["m"][inl])
                else:
                    out[(r["va"], r["vb"])] = r["m"][inl]
    return {p: out[p] for p in sorted(out)}


_fold_in_gf = None


def _fold_keys_gf(key, positions):
    """One vmapped fold_in per batch (see pipeline_incremental._fold_keys)."""
    global _fold_in_gf
    if _fold_in_gf is None:
        _fold_in_gf = jax.jit(jax.vmap(jax.random.fold_in, in_axes=(None, 0)))
    return hostmath.padded_apply(
        lambda pos: _fold_in_gf(key, pos),
        (np.asarray(positions, np.uint32),), lo=32)
