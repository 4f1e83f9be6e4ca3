"""Synthetic multi-view test scenes — the NViewDataSet analogue.

Reference parity: multiview/test_data_sets.{hpp,cpp} NRealisticCamerasRing —
cameras on a ring of radius r looking at a 3D point cloud near the origin,
yielding exact K/R/t/X and projections.  Used by solver unit tests and the
end-to-end engine tests (sfm/pipelines/pipelines_test.hpp).
"""

from typing import NamedTuple

import numpy as np


class NViewScene(NamedTuple):
    K: np.ndarray      # (V, 3, 3)
    R: np.ndarray      # (V, 3, 3) world->cam
    t: np.ndarray      # (V, 3)
    C: np.ndarray      # (V, 3) camera centers
    X: np.ndarray      # (P, 3) world points
    x: np.ndarray      # (V, P, 2) pixel projections
    visible: np.ndarray  # (V, P) bool (in front + in image)

    @property
    def n_views(self):
        return self.R.shape[0]

    @property
    def n_points(self):
        return self.X.shape[0]


def _look_at(center, target, up=(0.0, 1e-6, 1.0)):
    """World->camera R with +z forward toward target (right-handed,
    y roughly down to mimic image coords)."""
    z = np.asarray(target, float) - center
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, float), z)
    if np.linalg.norm(x) < 1e-9:
        x = np.cross([1.0, 0.0, 0.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def ring_scene(n_views=12, n_points=100, focal=1000.0, width=1000, height=1000,
               radius=2.0, seed=0, jitter=0.0):
    """Cameras on a ring of `radius` viewing a unit point cloud at origin
    (test_data_sets.cpp NRealisticCamerasRing)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-0.5, 0.5, size=(n_points, 3))
    K = np.zeros((n_views, 3, 3))
    K[:] = np.array([[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1]])
    R = np.zeros((n_views, 3, 3))
    t = np.zeros((n_views, 3))
    C = np.zeros((n_views, 3))
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        C[i] = [radius * np.cos(theta), 0.2 * np.sin(theta * 2), radius * np.sin(theta)]
        R[i] = _look_at(C[i], [0.0, 0.0, 0.0])
        t[i] = -R[i] @ C[i]
    Xc = np.einsum("vij,pj->vpi", R, X) + t[:, None, :]
    proj = Xc[..., :2] / Xc[..., 2:3]
    x = np.einsum("vij,vpj->vpi", K[:, :2, :2], proj) + K[:, None, :2, 2]
    if jitter > 0:
        x = x + rng.normal(scale=jitter, size=x.shape)
    visible = (
        (Xc[..., 2] > 0)
        & (x[..., 0] >= 0) & (x[..., 0] < width)
        & (x[..., 1] >= 0) & (x[..., 1] < height)
    )
    return NViewScene(K=K, R=R, t=t, C=C, X=X, x=x, visible=visible)


def bearings_of(scene, view, idx=None):
    """Unit bearings of pixel observations for a pinhole view."""
    x = scene.x[view] if idx is None else scene.x[view][idx]
    K = scene.K[view]
    p = (x - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    b = np.concatenate([p, np.ones_like(p[:, :1])], axis=1)
    return b / np.linalg.norm(b, axis=1, keepdims=True)


def render_blob_dataset(out_dir, n_views=6, n_points=400, size=320,
                        focal=400.0, seed=0, arc_step=0.12, flatten=0.4):
    """Render a synthetic image dataset + Strecha-format ground truth.

    Random Gaussian intensity blobs seen from a camera arc (arc_step
    radians between consecutive views — n_views * arc_step ~ 2pi gives a
    full ring for the GLOBAL-engine benchmark) — texture-rich enough for
    SIFT, with exact GT for the evalQuality protocol
    (main_evalQuality.cpp).  Writes out_dir/images/img_*.png and
    out_dir/gt/img_*.png.camera; returns (imgdir, gtdir, Rs, Cs, K).

    Shared by the CLI pipeline tests and the end-to-end benchmarks
    (bench.py e2e sections).  Blobs splat into local windows (the former
    full-image mask per point was ~2 s/view at 1024^2).
    """
    import os

    from openmvg_tpu.io.gt_loaders import write_strecha_camera
    from openmvg_tpu.io.image import write_image

    rng = np.random.default_rng(seed)
    if flatten == "ball":
        # view-isotropic ball shell for full-ring datasets: a slab seen
        # edge-on from ring angles ~90 deg collapses to a blob line and
        # breaks matching there (measured round 4, views 72-79 of 100)
        d = rng.normal(size=(n_points, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        X = d * rng.uniform(0.35, 0.9, (n_points, 1))
    else:
        # flatten < 1 squeezes the cloud toward the z=0 plane
        # (frontal-arc datasets)
        X = rng.uniform(-0.9, 0.9, size=(n_points, 3))
        X[:, 2] *= flatten
    intens = rng.uniform(0.3, 1.0, n_points)
    radii = rng.uniform(1.2, 2.8, n_points)

    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]])
    imgdir = os.path.join(out_dir, "images")
    gtdir = os.path.join(out_dir, "gt")
    os.makedirs(imgdir, exist_ok=True)
    os.makedirs(gtdir, exist_ok=True)
    Rs, Cs = [], []
    W = 17  # blob window half-extent (covers 4*r at r<=4)
    win = np.arange(-W, W + 1, dtype=np.float32)
    for v in range(n_views):
        theta = (v - n_views / 2) * arc_step
        C = np.array([3.0 * np.sin(theta), 0.3 * np.sin(2 * theta),
                      -3.0 * np.cos(theta)])
        R = _look_at(C, [0.0, 0.0, 0.0])
        Rs.append(R)
        Cs.append(C)
        Xc = (X - C) @ R.T
        z = Xc[:, 2]
        uv = (Xc[:, :2] / np.where(np.abs(z) < 1e-9, 1e-9, z)[:, None]) \
            * focal + size / 2
        PAD = W + 6
        img = np.zeros((size + 2 * PAD, size + 2 * PAD), np.float32)
        ok = (z > 0.5) & (uv[:, 0] > -5) & (uv[:, 0] < size + 5) \
            & (uv[:, 1] > -5) & (uv[:, 1] < size + 5)
        r_all = np.clip(radii * focal / (np.maximum(z, 0.5) * 130.0) * 40.0,
                        1.0, 4.0)
        for p in np.nonzero(ok)[0]:
            u, v2 = uv[p]
            iu, iv = int(round(u)), int(round(v2))
            gy = np.exp(-((win + iv - v2) ** 2) / (2 * r_all[p] ** 2))
            gx = np.exp(-((win + iu - u) ** 2) / (2 * r_all[p] ** 2))
            patch = intens[p] * np.outer(gy, gx)
            img[iv + PAD - W: iv + PAD + W + 1,
                iu + PAD - W: iu + PAD + W + 1] += patch
        img = np.clip(img[PAD: PAD + size, PAD: PAD + size], 0, 1)
        name = f"img_{v:02d}.png"
        write_image(os.path.join(imgdir, name), img)
        write_strecha_camera(os.path.join(gtdir, name + ".camera"),
                             K, R, C, (size, size))
    return imgdir, gtdir, np.stack(Rs), np.stack(Cs), K


def render_textured_sphere_dataset(out_dir, n_views=100, size=1024,
                                   focal=None, seed=0, radius=1.4,
                                   cam_radius=3.0, n_waves=96,
                                   freq_hi=400.0, arc_step=None):
    """Ray-cast a procedurally textured sphere from a camera ring —
    the realistic-scale SfM benchmark dataset.

    Gaussian-blob imagery is poor SIFT texture (isolated blobs are
    self-similar, the ratio test drowns in ambiguity — measured round 4:
    <100 usable matches/pair at 1024^2); instead each pixel's ray is
    intersected with a sphere and shaded by a sum of random 3D
    sinusoids evaluated AT THE 3D HIT POINT, giving dense, unique,
    exactly multi-view-consistent texture at all scales.  Writes
    Strecha-format GT like render_blob_dataset; returns
    (imgdir, gtdir, Rs, Cs, K).
    """
    import os

    from openmvg_tpu.io.gt_loaders import write_strecha_camera
    from openmvg_tpu.io.image import write_image

    rng = np.random.default_rng(seed)
    focal = focal or size * 1.2
    # log-spaced spatial frequencies; amplitudes ~ 1/freq (natural-image
    # spectrum) so SIFT finds structure at every octave
    freqs = np.exp(rng.uniform(np.log(3.0), np.log(freq_hi), n_waves))
    dirs = rng.normal(size=(n_waves, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    kvecs = dirs * freqs[:, None]
    phases = rng.uniform(0, 2 * np.pi, n_waves)
    # shallow spectral falloff + unit-RMS normalization: keeps enough
    # high-frequency contrast for SIFT to find thousands of extrema per
    # 1024^2 view (natural-image feature density), not hundreds
    amps = freqs ** -0.25
    amps /= np.sqrt(np.sum(amps * amps) / 2.0)  # sum of sines -> RMS 1
    amps *= 0.42  # 0.5 +- ~3 sigma stays inside [0, 1] before clipping

    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]])
    imgdir = os.path.join(out_dir, "images")
    gtdir = os.path.join(out_dir, "gt")
    os.makedirs(imgdir, exist_ok=True)
    os.makedirs(gtdir, exist_ok=True)

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) + 0.5
    ray_cam = np.stack([(xx - size / 2) / focal, (yy - size / 2) / focal,
                        np.ones_like(xx)], axis=-1)  # (H, W, 3)

    step = arc_step if arc_step is not None else 2 * np.pi / n_views
    Rs, Cs = [], []
    for v in range(n_views):
        theta = (v - n_views / 2) * step
        C = np.array([cam_radius * np.sin(theta),
                      0.3 * np.sin(2 * theta),
                      -cam_radius * np.cos(theta)])
        R = _look_at(C, [0.0, 0.0, 0.0])
        Rs.append(R)
        Cs.append(C)
        d = ray_cam @ R  # world ray dirs (rows of R = cam axes in world)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # |C + t d|^2 = radius^2
        b = d @ C
        disc = b * b - (C @ C - radius * radius)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        P = C + t[..., None] * d  # (H, W, 3)
        tex = np.zeros(P.shape[:2])
        for a, k, ph in zip(amps, kvecs, phases):
            tex += a * np.sin(P @ k + ph)
        img = np.where(hit, 0.5 + tex, 0.0).astype(np.float32)
        img = np.clip(img, 0, 1)
        name = f"img_{v:02d}.png"
        write_image(os.path.join(imgdir, name), img)
        write_strecha_camera(os.path.join(gtdir, name + ".camera"),
                             K, R, C, (size, size))
    return imgdir, gtdir, np.stack(Rs), np.stack(Cs), K


def big_ba_problem(n_poses=256, n_points=300_000, obs_per_point=14, seed=0,
                   noise_px=0.5, noise_X=0.01, dtype=None):
    """Geometrically consistent large BA problem built obs-table-first
    (no dense (V, P) visibility matrix at this scale): cameras on a ring
    of radius 3 looking at the origin, each point observed from
    obs_per_point poses inside an angular window.  Returns
    (ba.BAProblem, n_obs).  BASELINE config-5 scale fixture shared by
    tests/test_big_scene.py and bench.py."""
    import jax
    import jax.numpy as jnp

    from openmvg_tpu.geometry import so3
    from openmvg_tpu.sfm import ba

    rng = np.random.default_rng(seed)
    theta = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    C = np.stack([3 * np.cos(theta), 3 * np.sin(theta),
                  0.2 * np.sin(3 * theta)], 1)
    R = np.stack([_look_at(c, [0.0, 0.0, 0.0]) for c in C])
    X = rng.uniform(-1, 1, (n_points, 3)) * [1.0, 1.0, 0.4]

    base = rng.integers(0, n_poses, n_points)
    offs = rng.integers(0, 32, (n_points, obs_per_point))
    pose_id = ((base[:, None] + offs) % n_poses).reshape(-1)
    point_id = np.repeat(np.arange(n_points), obs_per_point)

    f, cx, cy = 1000.0, 500.0, 500.0
    Xc = np.einsum("oij,oj->oi", R[pose_id], X[point_id] - C[pose_id])
    x = Xc[:, :2] / Xc[:, 2:] * f + [cx, cy]
    x = x + rng.normal(scale=noise_px, size=x.shape)

    rotvec = np.asarray(so3.logmap(jnp.asarray(R)))
    t = -np.einsum("nij,nj->ni", R, C)
    O = len(pose_id)
    dt = dtype or jnp.float32
    X0 = X + rng.normal(scale=noise_X, size=X.shape)
    (pose_id, intr_id, point_id, x, obs_w, pt_table) = \
        ba.point_major_layout(pose_id.astype(np.int32),
                              np.zeros(O, np.int32),
                              point_id.astype(np.int32), x, np.ones(O),
                              n_points, row_pad=1024)
    prob = ba.BAProblem(
        obs_pose=jnp.asarray(pose_id, jnp.int32),
        obs_intr=jnp.asarray(intr_id, jnp.int32),
        obs_point=jnp.asarray(point_id, jnp.int32),
        obs_x=jnp.asarray(x, dt),
        obs_w=jnp.asarray(obs_w, dt),
        rotvec=jnp.asarray(rotvec, dt),
        t=jnp.asarray(t, dt),
        intr_kind=jnp.asarray([1], jnp.int32),
        intr_wh=jnp.asarray([[1000, 1000]], dt),
        intr_params=jnp.asarray([[f, cx, cy, 0, 0, 0, 0, 0]], dt),
        X=jnp.asarray(X0, dt),
        mask_pose=jnp.ones((n_poses, 6), dt),
        mask_intr=jnp.zeros((1, 8), dt),
        mask_X=jnp.ones(n_points, dt),
        prior_C=jnp.zeros((n_poses, 3), dt),
        prior_w=jnp.zeros((n_poses, 3), dt),
        pt_obs=jax.tree_util.tree_map(jnp.asarray, pt_table),
    )
    return prob, O
