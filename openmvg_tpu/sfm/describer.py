"""Image describer dispatch — the Image_describer layer.

Reference parity: features/image_describer.hpp Describe + the method/preset
enums of main_ComputeFeatures.cpp:77-86 (SIFT | SIFT_ANATOMY | AKAZE_FLOAT
| AKAZE_MLDB; presets NORMAL/HIGH/ULTRA).  SIFT and SIFT_ANATOMY both map
to the TPU SIFT (ops/sift.py — the vlfeat path is superseded, flag kept);
AKAZE maps to ops/akaze.py when available.

Images from the same camera share a shape, so jit-compilation buckets by
(H, W) naturally.
"""

import numpy as np

from openmvg_tpu.ops import sift

PRESETS = {
    # SIFT_Anatomy_Image_Describer.hpp:88-107/140: NORMAL peak 0.04,
    # HIGH 0.01, ULTRA 0.01 + upsampled first octave (delta_min 0.5)
    "NORMAL": dict(peak_threshold=0.04, first_octave=0),
    "HIGH": dict(peak_threshold=0.01, first_octave=0),
    "ULTRA": dict(peak_threshold=0.01, first_octave=-1),
}


def make_config(method="SIFT", preset="NORMAL", max_features=8192,
                image_shape=None):
    p = PRESETS.get(preset.upper(), PRESETS["NORMAL"])
    first_octave = p["first_octave"]
    n_oct = 4 - first_octave
    if image_shape is not None:
        # octave cap from the (possibly upsampled) base image, >= 32 px
        # (hierarchical_gaussian_scale_space.hpp SetImage)
        base = min(image_shape) * (2 if first_octave == -1 else 1)
        n_oct = max(1, min(6, int(np.log2(base / 16))))
    return sift.SiftConfig(peak_threshold=p["peak_threshold"],
                           n_octaves=n_oct,
                           first_octave=first_octave,
                           max_per_octave=max(256, max_features // n_oct))


def describe_image(gray_image, method="SIFT", preset="NORMAL",
                   max_features=8192, upright=False):
    """(H, W) float [0,1] -> (feats (N,4) [x y scale ori], descs (N,128) u8).

    upright: -u flag parity (main_ComputeFeatures.cpp:81) — descriptors in
    the image frame (orientation fixed to 0, one slot per keypoint)."""
    method = method.upper()
    if method in ("SIFT", "SIFT_ANATOMY"):
        cfg = make_config(method, preset, max_features, gray_image.shape)
        return sift.extract_to_numpy(gray_image, cfg, max_features=max_features,
                                     upright=upright)
    if method.startswith("AKAZE"):
        from openmvg_tpu.ops import akaze

        return akaze.extract_to_numpy(gray_image, method=method,
                                      max_features=max_features,
                                      upright=upright)
    raise ValueError(f"unknown describer method {method}")


def describe_images_batch(gray_images, method="SIFT", preset="NORMAL",
                          max_features=8192, upright=False):
    """Batched describe: list of same-shape (H, W) images -> list of
    (feats, descs), identical per image to describe_image.

    SIFT runs through sift.extract_batch (one vmapped device program —
    the small per-octave tails batch into dense work, the TPU throughput
    path); other methods fall back to the per-image loop."""
    method_u = method.upper()
    if method_u not in ("SIFT", "SIFT_ANATOMY") or len(gray_images) == 1:
        return [describe_image(im, method, preset, max_features, upright)
                for im in gray_images]
    import jax.numpy as jnp

    cfg = make_config(method_u, preset, max_features, gray_images[0].shape)
    fb = sift.extract_batch(
        jnp.asarray(np.stack(gray_images), jnp.float32), cfg,
        upright=upright)
    mask = np.asarray(fb.mask)
    resp = np.asarray(fb.response)
    xy = np.asarray(fb.xy)
    sc = np.asarray(fb.scale)
    ori = np.asarray(fb.orientation)
    desc = np.asarray(fb.desc)
    outs = []
    for b in range(len(gray_images)):
        idx = np.nonzero(mask[b])[0]
        order = idx[np.argsort(-resp[b][idx], kind="stable")]
        if max_features is not None:
            order = order[:max_features]
        feats = np.concatenate([xy[b][order], sc[b][order][:, None],
                                ori[b][order][:, None]], axis=1)
        outs.append((feats, desc[b][order]))
    return outs
