"""AKAZE tests mirroring the SIFT test pattern."""

import numpy as np

from openmvg_tpu.ops import akaze, matching
from tests.test_sift import blob_image
import pytest

pytestmark = pytest.mark.slow  # heavy scale-space compiles

CFG = akaze.AkazeConfig(n_octaves=3, max_per_octave=256)


def test_akaze_blob_detected():
    img = blob_image(blobs=[(40.0, 50.0, 4.0), (90.0, 80.0, 8.0)])
    feats, descs = akaze.extract_to_numpy(img, cfg=CFG)
    assert len(feats) > 0
    for (cy, cx, s) in [(40.0, 50.0, 4.0), (90.0, 80.0, 8.0)]:
        d = np.linalg.norm(feats[:, :2] - [cx, cy], axis=1)
        assert (d < 4.0).any(), (cx, cy)


def test_akaze_translation_matching():
    rng = np.random.default_rng(1)
    blobs = [(float(rng.uniform(30, 98)), float(rng.uniform(30, 98)),
              float(rng.uniform(3, 7))) for _ in range(6)]
    img1 = blob_image(blobs=blobs, noise=0.01, seed=2)
    shift = 6
    img2 = blob_image(blobs=[(y + shift, x + shift, s) for (y, x, s) in blobs],
                      noise=0.01, seed=3)
    f1, d1 = akaze.extract_to_numpy(img1, cfg=CFG)
    f2, d2 = akaze.extract_to_numpy(img2, cfg=CFG)
    assert len(f1) > 3 and len(f2) > 3
    import jax.numpy as jnp

    res = matching.match_brute_force(jnp.asarray(d1), jnp.asarray(d2),
                                     ratio=0.95)
    m = np.asarray(res.mask)
    assert m.sum() >= 3
    dx = f2[np.asarray(res.idx_b)[m], :2] - f1[m, :2]
    good = np.abs(dx - shift).max(axis=1) < 2.5
    assert good.mean() > 0.6, dx


def test_akaze_mldb_binary():
    img = blob_image(blobs=[(50, 60, 5.0), (80, 40, 4.0)], noise=0.01)
    feats, descs = akaze.extract_to_numpy(img, method="AKAZE_MLDB",
                                          cfg=akaze.AkazeConfig(
                                              n_octaves=3, max_per_octave=128,
                                              descriptor="MLDB"))
    assert descs.dtype == np.uint8
    assert descs.shape[1] == 60
    assert len(feats) > 0


def test_akaze_upright():
    from openmvg_tpu.ops import akaze as ak

    rng = np.random.default_rng(0)
    from scipy import ndimage
    img = ndimage.gaussian_filter(
        rng.uniform(0, 1, (128, 128)), 2.0).astype(np.float32)
    feats, descs = ak.extract_to_numpy(img, max_features=64, upright=True)
    assert np.all(feats[:, 3] == 0.0)
