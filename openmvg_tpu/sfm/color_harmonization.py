"""Global color harmonization over the match graph.

Reference parity: software/colorHarmonize +
color_harmonization/global_quantile_gain_offset_alignment.hpp — per image
a gain g_i and offset o_i per channel such that matched-region color
quantiles agree across every matched pair, solved globally with the
reference image pinned to (g, o) = (1, 0).  The reference solves the
L-infinity program with OSI-CLP; here the same 10-quantile constraints go
through an IRLS-L1 least squares (no LP dependency, same minimizer
family).
"""

from typing import Dict, Tuple

import numpy as np

N_QUANTILES = 10


def pair_quantiles(samples_a, samples_b):
    """Matched-region color samples -> (Q,) quantile vectors per side."""
    qs = np.linspace(0.05, 0.95, N_QUANTILES)
    return (np.quantile(np.asarray(samples_a, float), qs),
            np.quantile(np.asarray(samples_b, float), qs))


def solve_gain_offset(n_images, pair_data: Dict[Tuple[int, int], tuple],
                      ref_image=0, n_irls=8):
    """pair_data[(i, j)] = (quant_i (Q,), quant_j (Q,)).

    Returns (gains (N,), offsets (N,)) with image `ref_image` = (1, 0).
    Constraint rows: g_i q_i + o_i - g_j q_j - o_j = 0.
    """
    rows = []
    vals = []
    for (i, j), (qi, qj) in pair_data.items():
        for a, b in zip(np.asarray(qi), np.asarray(qj)):
            rows.append((i, j, a, b))
    m = len(rows)
    if m == 0:
        return np.ones(n_images), np.zeros(n_images)
    A = np.zeros((m + 2, 2 * n_images))
    for r, (i, j, a, b) in enumerate(rows):
        A[r, 2 * i] = a
        A[r, 2 * i + 1] = 1.0
        A[r, 2 * j] = -b
        A[r, 2 * j + 1] = -1.0
    # gauge
    A[m, 2 * ref_image] = 1e3
    A[m + 1, 2 * ref_image + 1] = 1e3
    rhs = np.zeros(m + 2)
    rhs[m] = 1e3  # gain = 1
    w = np.ones(m + 2)
    x = None
    for _ in range(n_irls):
        Aw = A * w[:, None]
        x, *_ = np.linalg.lstsq(Aw, rhs * w, rcond=None)
        resid = A @ x - rhs
        w = 1.0 / np.maximum(np.abs(resid), 1e-3)
        w[m:] = 1.0
    gains = np.maximum(x[0::2], 1e-3)
    offsets = x[1::2]
    return gains, offsets


def harmonize_images(images, gains, offsets):
    """Apply per-image gain/offset (float images)."""
    return [np.clip(np.asarray(im, float) * g + o, 0.0, 1.0)
            for im, g, o in zip(images, gains, offsets)]
