"""Pallas fused 2-NN kernel parity tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import matching
from openmvg_tpu.ops.pallas_matching import two_nn_fused


def test_fused_two_nn_matches_xla():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, size=(300, 128)).astype(np.uint8)
    b = rng.integers(0, 256, size=(700, 128)).astype(np.uint8)
    d = matching.l2_distance_matrix(jnp.asarray(a), jnp.asarray(b))
    d1_ref, d2_ref, i1_ref = matching.two_nn(d)
    d1, d2, i1 = two_nn_fused(jnp.asarray(a), jnp.asarray(b), interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1_ref))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref), rtol=1e-5)


def test_fused_two_nn_float_path():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(257, 64)).astype(np.float32)
    b = rng.normal(size=(513, 64)).astype(np.float32)
    d = matching.l2_distance_matrix(jnp.asarray(a), jnp.asarray(b))
    d1_ref, d2_ref, i1_ref = matching.two_nn(d)
    d1, d2, i1 = two_nn_fused(jnp.asarray(a), jnp.asarray(b), interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1_ref))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_two_nn_valid_mask():
    """Columns masked by valid_b never win, matching the XLA mask path."""
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, size=(100, 128)).astype(np.uint8)
    b = rng.integers(0, 256, size=(600, 128)).astype(np.uint8)
    valid_b = jnp.asarray(np.arange(600) < 350)
    d = matching.l2_distance_matrix(jnp.asarray(a), jnp.asarray(b))
    d1_ref, d2_ref, i1_ref = matching.two_nn(d, valid_b)
    d1, d2, i1 = two_nn_fused(jnp.asarray(a), jnp.asarray(b), valid_b,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1_ref))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_ref), rtol=1e-5)
    assert np.all(np.asarray(i1) < 350)


def test_match_brute_force_fused_contract(monkeypatch):
    """match_brute_force_fused == match_brute_force (interpret on CPU)."""
    import openmvg_tpu.ops.pallas_matching as pm

    orig = pm.two_nn_fused
    monkeypatch.setattr(
        pm, "two_nn_fused",
        lambda a, b, valid_b=None: orig(a, b, valid_b, interpret=True))
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(200, 128)).astype(np.uint8)
    b = rng.integers(0, 256, size=(400, 128)).astype(np.uint8)
    va = jnp.asarray(np.arange(200) < 150)
    vb = jnp.asarray(np.arange(400) < 333)
    ref = matching.match_brute_force(jnp.asarray(a), jnp.asarray(b), va, vb)
    got = matching.match_brute_force_fused(jnp.asarray(a), jnp.asarray(b),
                                           va, vb)
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    keep = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(got.idx_b)[keep],
                                  np.asarray(ref.idx_b)[keep])
