"""Reconstruction quality evaluation against ground truth.

Reference parity: software/SfM/main_evalQuality.cpp +
tools_precisionEvaluationToGt.hpp:21-60 — 7DoF similarity alignment
(FindRTS + refinement) of estimated camera centers onto GT, then
per-camera position error (GT units) and rotation angular error stats.
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry import so3
from openmvg_tpu.geometry.similarity import find_rts


def evaluate_against_gt(scene_est, scene_gt, match_by="filename") -> Dict:
    """Align est -> gt and report position/rotation error statistics.

    Views are matched by filename stem (or by index if match_by='index').
    """
    if match_by == "filename":
        stems_gt = {_stem(n): i for i, n in enumerate(scene_gt.view_filename)}
        pairs = []
        for i, n in enumerate(scene_est.view_filename):
            j = stems_gt.get(_stem(n))
            if j is not None:
                pairs.append((i, j))
    else:
        n = min(scene_est.n_views, scene_gt.n_views)
        pairs = [(i, i) for i in range(n)]

    est_idx, gt_idx = [], []
    for i, j in pairs:
        pe = scene_est.view_pose[i]
        pg = scene_gt.view_pose[j]
        if (pe >= 0 and pe < scene_est.n_poses and scene_est.pose_valid[pe]
                and pg >= 0 and scene_gt.pose_valid[pg]):
            est_idx.append(pe)
            gt_idx.append(pg)
    if len(est_idx) < 3:
        return dict(n_common=len(est_idx), ok=False)

    C_est = scene_est.pose_C[est_idx]
    C_gt = scene_gt.pose_C[gt_idx]
    sim = find_rts(jnp.asarray(C_est[None]), jnp.asarray(C_gt[None]))
    C_al = np.asarray(sim.apply(jnp.asarray(C_est[None])))[0]
    pos_err = np.linalg.norm(C_al - C_gt, axis=1)

    # rotation error: R_gt vs R_est aligned by the similarity rotation
    R_sim = np.asarray(sim.R)[0]
    R_al = np.einsum("nij,jk->nik", scene_est.pose_R[est_idx], R_sim.T)
    ang = np.asarray(so3.relative_rotation_angle_deg(
        jnp.asarray(R_al), jnp.asarray(scene_gt.pose_R[gt_idx])))

    return dict(
        ok=True,
        n_common=len(est_idx),
        position_error_mean=float(pos_err.mean()),
        position_error_median=float(np.median(pos_err)),
        position_error_max=float(pos_err.max()),
        position_rmse=float(np.sqrt((pos_err ** 2).mean())),
        rotation_error_mean_deg=float(ang.mean()),
        rotation_error_median_deg=float(np.median(ang)),
        scale=float(np.asarray(sim.scale)[0]),
        per_camera=dict(
            pose=[int(p) for p in est_idx],
            position_error=[float(e) for e in pos_err],
            rotation_error_deg=[float(a) for a in ang],
        ),
    )


def export_eval_html(stats: Dict, path: str, title="GT evaluation"):
    """Per-camera error table + histogram HTML report
    (tools_precisionEvaluationToGt.hpp exportToHtml analogue)."""
    from openmvg_tpu.utils.report import _svg_histogram

    pc = stats.get("per_camera", {})
    pos = pc.get("position_error", [])
    rot = pc.get("rotation_error_deg", [])
    rows = "".join(
        f"<tr><td>{i}</td><td>{p:.6f}</td><td>{r:.4f}</td></tr>"
        for i, (p, r) in enumerate(zip(pos, rot)))
    summary = "".join(
        f"<li>{k}: {v}</li>" for k, v in stats.items()
        if not isinstance(v, dict))
    html = f"""<!DOCTYPE html><html><head><title>{title}</title></head><body>
<h1>{title}</h1>
<ul>{summary}</ul>
{_svg_histogram(pos, title="camera position error") if pos else ""}
{_svg_histogram(rot, title="camera rotation error (deg)") if rot else ""}
<table border="1"><tr><th>#</th><th>position err</th><th>rotation err (deg)</th></tr>
{rows}</table>
</body></html>"""
    with open(path, "w") as f:
        f.write(html)
    return True


def _stem(name):
    import os

    return os.path.splitext(os.path.basename(name))[0]
