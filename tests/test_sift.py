"""SIFT tests (features/sift/sift_test.cpp analogue): blob detection at the
right location/scale, descriptor invariance under rotation/translation."""

import numpy as np
import pytest

from openmvg_tpu.ops import sift, matching


def blob_image(h=128, w=128, blobs=((64, 64, 6.0),), noise=0.0, seed=0):
    """White Gaussian blobs on black background."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for (cy, cx, s) in blobs:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    if noise:
        img += rng.normal(scale=noise, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


CFG = sift.SiftConfig(n_octaves=3, max_per_octave=256)


def test_blob_detected():
    img = blob_image(blobs=[(40.0, 50.0, 4.0), (90.0, 80.0, 8.0)])
    feats, descs = sift.extract_to_numpy(img, CFG)
    assert len(feats) > 0
    # a keypoint near each blob center
    for (cy, cx, s) in [(40.0, 50.0, 4.0), (90.0, 80.0, 8.0)]:
        d = np.linalg.norm(feats[:, :2] - [cx, cy], axis=1)
        near = d < 3.0
        assert near.any(), (cx, cy)
        # detected scale proportional to blob sigma (sigma_kp ~ s for LoG)
        sc = feats[near, 2]
        assert (np.abs(sc - s) / s < 0.6).any(), (s, sc)


def test_descriptor_translation_invariance():
    rng = np.random.default_rng(1)
    blobs = [(float(rng.uniform(30, 98)), float(rng.uniform(30, 98)),
              float(rng.uniform(3, 7))) for _ in range(6)]
    img1 = blob_image(blobs=blobs, noise=0.01, seed=2)
    shift = 7
    blobs2 = [(y + shift, x + shift, s) for (y, x, s) in blobs]
    img2 = blob_image(blobs=blobs2, noise=0.01, seed=3)
    f1, d1 = sift.extract_to_numpy(img1, CFG)
    f2, d2 = sift.extract_to_numpy(img2, CFG)
    assert len(f1) > 4 and len(f2) > 4
    import jax.numpy as jnp

    res = matching.match_brute_force(jnp.asarray(d1), jnp.asarray(d2), ratio=0.9)
    m = np.asarray(res.mask)
    assert m.sum() >= 4
    # matched keypoints displaced by the shift
    dx = f2[np.asarray(res.idx_b)[m], :2] - f1[m, :2]
    good = np.abs(dx - shift).max(axis=1) < 2.0
    assert good.mean() > 0.7


def test_descriptor_rotation_invariance():
    """Rotate the image 90 deg; descriptors must still match."""
    rng = np.random.default_rng(4)
    blobs = []
    base = blob_image(blobs=[(40, 60, 4.0), (80, 40, 5.0), (70, 90, 3.5)],
                      noise=0.01, seed=5)
    rot = np.rot90(base).copy()
    f1, d1 = sift.extract_to_numpy(base, CFG)
    f2, d2 = sift.extract_to_numpy(rot, CFG)
    assert len(f1) >= 3 and len(f2) >= 3
    import jax.numpy as jnp

    res = matching.match_brute_force(jnp.asarray(d1), jnp.asarray(d2), ratio=0.9)
    m = np.asarray(res.mask)
    assert m.sum() >= 2
    # check mapped positions: rot90 maps (x, y) -> (y, W-1-x)
    H, W = base.shape
    exp_x = f1[m, 1]
    exp_y = W - 1 - f1[m, 0]
    got = f2[np.asarray(res.idx_b)[m], :2]
    err = np.hypot(got[:, 0] - exp_x, got[:, 1] - exp_y)
    assert (err < 2.5).mean() > 0.6, err


def test_feat_desc_roundtrip_files(tmp_path):
    from openmvg_tpu.io import features_io

    img = blob_image(blobs=[(50, 50, 5.0)])
    feats, descs = sift.extract_to_numpy(img, CFG)
    features_io.save_feats(str(tmp_path / "i.feat"), feats)
    features_io.save_descs(str(tmp_path / "i.desc"), descs)
    f2 = features_io.load_feats(str(tmp_path / "i.feat"))
    d2 = features_io.load_descs(str(tmp_path / "i.desc"))
    np.testing.assert_allclose(f2, feats, atol=1e-6)
    np.testing.assert_array_equal(d2, descs)


def test_upright_extraction():
    """-u parity: orientations fixed to 0, one slot per keypoint, blob
    still detected."""
    img = blob_image(blobs=[(40.0, 50.0, 4.0), (90.0, 80.0, 8.0)])
    feats, descs = sift.extract_to_numpy(img, CFG, upright=True)
    assert len(feats) > 0
    assert np.all(feats[:, 3] == 0.0)
    d = np.linalg.norm(feats[:, :2] - [50.0, 40.0], axis=1)
    assert (d < 3.0).any()


def test_extract_batch_matches_single():
    """sift.extract_batch == vmapped extract, per image (round 3: the
    bench and CLI batch images for TPU throughput)."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.random((2, 96, 96)).astype(np.float32))
    cfg = sift.SiftConfig(max_per_octave=128, n_octaves=2)
    fb = sift.extract_batch(imgs, cfg)
    f0 = sift.extract(imgs[0], cfg)
    f1 = sift.extract(imgs[1], cfg)
    assert fb.desc.shape[0] == 2
    np.testing.assert_array_equal(np.asarray(fb.desc[0]), np.asarray(f0.desc))
    np.testing.assert_array_equal(np.asarray(fb.mask[1]), np.asarray(f1.mask))
    np.testing.assert_allclose(np.asarray(fb.xy[1]), np.asarray(f1.xy),
                               rtol=1e-6, atol=1e-6)
