"""Pallas fused 2-NN kernel parity test (interpret mode on CPU)."""

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
