"""Scene colorization: sample per-landmark RGB from source images.

Reference parity: sfm/sfm_data_colorization.cpp ColorizeTracks — for each
landmark pick the view where it is observed closest to the image center
(approximated here by the first valid observation) and sample the pixel.
"""

import os

import numpy as np

from openmvg_tpu.io.image import read_image


def colorize(scene):
    """Returns (L, 3) uint8 colors for valid landmarks (zeros elsewhere)."""
    colors = np.zeros((len(scene.X), 3), np.uint8)
    # group observations by view to read each image once
    ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
    done = np.zeros(len(scene.X), bool)
    by_view = {}
    for idx in np.nonzero(ok)[0]:
        by_view.setdefault(int(scene.obs_view[idx]), []).append(idx)
    for v, idxs in by_view.items():
        name = scene.view_filename[v]
        path = os.path.join(scene.root_path, name)
        if not os.path.exists(path):
            continue
        img = read_image(path)
        h, w = img.shape[:2]
        for idx in idxs:
            l = int(scene.obs_landmark[idx])
            if done[l]:
                continue
            x, y = scene.obs_x[idx]
            xi = int(np.clip(round(x), 0, w - 1))
            yi = int(np.clip(round(y), 0, h - 1))
            colors[l] = img[yi, xi]
            done[l] = True
    return colors
