"""Correctness of the fused Pallas S-matvec (ops/pallas_smatvec.py)
against the staged reference computation, in interpreter mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmvg_tpu.ops import pallas_smatvec


@pytest.mark.skipif(pallas_smatvec.pl is None, reason="pallas unavailable")
def test_fused_s_matvec_matches_staged():
    rng = np.random.default_rng(0)
    P, I, L, R = 5, 2, 16, 4
    nrow = rng.integers(1, 3, L)            # 1-2 rows per point
    L1 = 32                                  # pow2 padded row count
    assert nrow.sum() <= L1
    row_point = np.full(L1, L, np.int32)
    groups = np.full((L, 2), L1, np.int32)   # sentinel = real row count
    r = 0
    for l in range(L):
        for k in range(nrow[l]):
            row_point[r] = l
            groups[l, k] = r
            r += 1
    n_real_rows = r
    O = L1 * R

    obs_pose = rng.integers(0, P, O).astype(np.int32)
    obs_intr = rng.integers(0, I, O).astype(np.int32)
    jp = rng.normal(size=(O, 12)).astype(np.float32)
    ji = rng.normal(size=(O, 16)).astype(np.float32)
    jx = rng.normal(size=(O, 6)).astype(np.float32)
    # slots on padding rows carry zero Jacobians (obs_w = 0 contract)
    pad_slots = np.repeat(row_point == L, R)
    jp[pad_slots] = 0
    ji[pad_slots] = 0
    jx[pad_slots] = 0
    vp = rng.normal(size=(P, 6)).astype(np.float32)
    vi = rng.normal(size=(I, 8)).astype(np.float32)
    A = rng.normal(size=(L, 3, 3)).astype(np.float32)
    hpp_inv = np.linalg.inv(
        np.einsum("lij,lkj->lik", A, A) + 3 * np.eye(3, dtype=np.float32))
    hpp_inv = hpp_inv.astype(np.float32)

    # staged reference
    u = (np.einsum("ok,ok->o", jp[:, 0:6], vp[obs_pose])
         + np.einsum("ok,ok->o", ji[:, 0:8], vi[obs_intr]),
         np.einsum("ok,ok->o", jp[:, 6:12], vp[obs_pose])
         + np.einsum("ok,ok->o", ji[:, 8:16], vi[obs_intr]))
    w_slot = jx[:, 0:3] * u[0][:, None] + jx[:, 3:6] * u[1][:, None]
    slot_point = np.repeat(row_point, R)
    w = np.zeros((L, 3), np.float32)
    np.add.at(w, np.clip(slot_point, 0, L - 1),
              np.where((slot_point < L)[:, None], w_slot, 0))
    y = np.einsum("lij,lj->li", hpp_inv, w)
    y_slot = np.where((slot_point < L)[:, None],
                      y[np.clip(slot_point, 0, L - 1)], 0)
    e0 = u[0] - np.sum(jx[:, 0:3] * y_slot, 1)
    e1 = u[1] - np.sum(jx[:, 3:6] * y_slot, 1)
    pe = jp[:, 0:6] * e0[:, None] + jp[:, 6:12] * e1[:, None]
    ie = ji[:, 0:8] * e0[:, None] + ji[:, 8:16] * e1[:, None]
    sp_ref = np.zeros((P, 6), np.float32)
    np.add.at(sp_ref, obs_pose, pe)
    si_ref = np.zeros((I, 8), np.float32)
    np.add.at(si_ref, obs_intr, ie)

    rows = pallas_smatvec.plan(O, R, P, I, jnp.float32)
    assert rows is not None
    # groups sentinel points past the REAL rows; rows beyond n_real_rows
    # are zero by the padding contract so any sentinel >= n_real_rows
    # lands on zeros — mirror build_pt_obs exactly
    groups[groups == L1] = n_real_rows
    packed = pallas_smatvec.pack_slots(
        jnp.asarray(jp), jnp.asarray(ji), jnp.asarray(jx),
        jnp.asarray(obs_pose), jnp.asarray(obs_intr))
    sp, si = pallas_smatvec.s_matvec_halves(
        packed, jnp.asarray(vp), jnp.asarray(vi),
        jnp.asarray(hpp_inv), jnp.asarray(row_point), jnp.asarray(groups),
        R=R, rows=rows, interpret=True)
    np.testing.assert_allclose(np.asarray(sp), sp_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(si), si_ref, rtol=2e-4, atol=2e-4)
