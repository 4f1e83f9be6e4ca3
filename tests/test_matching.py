"""Matching tests: parity with matching_test.cpp / metric_test.cpp —
exact L2 distances, ratio filtering, dedupe, cascade-Hamming recall."""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import matching


def test_l2_distance_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, size=(37, 128)).astype(np.uint8)
    b = rng.integers(0, 256, size=(53, 128)).astype(np.uint8)
    d = np.asarray(matching.l2_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :].astype(np.int64) - b[None, :, :].astype(np.int64)) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, rtol=1e-6)


def test_brute_force_self_match():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(100, 128)).astype(np.float32)
    noisy = d + rng.normal(scale=0.01, size=d.shape).astype(np.float32)
    perm = rng.permutation(100)
    res = matching.match_brute_force(jnp.asarray(d), jnp.asarray(noisy[perm]),
                                     ratio=0.8)
    inv = np.empty(100, np.int64)
    inv[perm] = np.arange(100)
    mask = np.asarray(res.mask)
    assert mask.sum() > 95
    np.testing.assert_array_equal(np.asarray(res.idx_b)[mask], inv[mask])


def test_ratio_filter_rejects_ambiguous():
    # two identical targets -> ratio test must reject
    a = jnp.asarray(np.ones((1, 128), np.float32))
    b = jnp.asarray(np.ones((2, 128), np.float32))
    res = matching.match_brute_force(a, b, ratio=0.8)
    assert not bool(res.mask[0])


def test_dedupe_right():
    # two rows matching the same target: only the closer row survives
    rng = np.random.default_rng(2)
    t = rng.normal(size=(1, 128)).astype(np.float32)
    far = rng.normal(size=(1, 128)).astype(np.float32) * 10
    a = np.concatenate([t + 0.01, t + 0.02], axis=0).astype(np.float32)
    b = np.concatenate([t, far], axis=0).astype(np.float32)
    res = matching.match_brute_force(jnp.asarray(a), jnp.asarray(b), ratio=0.99)
    mask = np.asarray(res.mask)
    assert mask.tolist() == [True, False]


def test_cascade_recall_vs_bruteforce():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(500, 128)).astype(np.float32)
    noisy = base + rng.normal(scale=0.05, size=base.shape).astype(np.float32)
    proj = matching.make_hash_projections(jax.random.PRNGKey(0))
    mean = jnp.asarray(base.mean(axis=0))
    bf = matching.match_brute_force(jnp.asarray(base), jnp.asarray(noisy))
    ch = matching.match_cascade(jnp.asarray(base), jnp.asarray(noisy), proj,
                                mean, top_c=16)
    bf_pairs = {(i, int(j)) for i, (j, m) in
                enumerate(zip(np.asarray(bf.idx_b), np.asarray(bf.mask))) if m}
    ch_pairs = {(i, int(j)) for i, (j, m) in
                enumerate(zip(np.asarray(ch.idx_b), np.asarray(ch.mask))) if m}
    recall = len(bf_pairs & ch_pairs) / max(len(bf_pairs), 1)
    assert recall > 0.95, recall


def test_match_pair_batch_and_padding():
    rng = np.random.default_rng(4)
    V, Nmax = 4, 64
    descs = rng.normal(size=(V, Nmax, 128)).astype(np.float32)
    counts = np.array([64, 50, 40, 30])
    # view1 = permuted copy of view0's first 50
    perm = rng.permutation(50)
    descs[1, :50] = descs[0, :50][perm] + 0.001
    pairs = np.array([[0, 1], [2, 3]])
    res = matching.match_pair_batch(
        jnp.asarray(descs), jnp.asarray(counts), jnp.asarray(pairs), ratio=0.9)
    d = matching.matches_to_dict(pairs, res)
    m01 = d[(0, 1)]
    # no match may point at padded rows
    assert (m01[:, 0] < 64).all() and (m01[:, 1] < 50).all()
    inv = np.empty(50, np.int64)
    inv[perm] = np.arange(50)
    good = sum(1 for i, j in m01 if i < 50 and inv[i] == j)
    assert good > 45


def test_kdtree_matches_bruteforce():
    """ANNL2 kd-tree host path (FLANN parity) agrees with the MXU
    brute-force matcher exactly (both are exact 2-NN + ratio + dedupe)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(90, 128)).astype(np.uint8)
    b = rng.integers(0, 256, size=(110, 128)).astype(np.uint8)
    # plant unambiguous matches so the ratio filter keeps some
    b[10:40] = a[5:35] + rng.integers(0, 3, size=(30, 128)).astype(np.uint8)

    res = matching.match_brute_force(jnp.asarray(a), jnp.asarray(b), ratio=0.8)
    mask = np.asarray(res.mask)
    bf = np.stack([np.nonzero(mask)[0],
                   np.asarray(res.idx_b)[mask]], 1)
    kd = matching.match_kdtree(a, b, ratio=0.8)
    assert len(kd) > 20
    assert np.array_equal(np.sort(bf, 0), np.sort(kd, 0))
