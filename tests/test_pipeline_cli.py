"""Full-pipeline integration test through the CLI on rendered synthetic
images — the tutorial_demo.py analogue without network access: render a
random blob cloud from a camera arc, then init -> features -> pairs ->
matches -> filter -> sfm -> export -> eval (vs synthetic Strecha GT)."""

import os

import numpy as np
import pytest

from openmvg_tpu import cli
from openmvg_tpu.io.gt_loaders import write_strecha_camera
from openmvg_tpu.io.image import write_image

pytestmark = pytest.mark.slow  # full CLI pipeline e2e


from openmvg_tpu.utils.synthetic import render_blob_dataset


def render_scene(tmp, n_views=6, n_points=400, size=320, focal=400.0, seed=0):
    """Random intensity blob cloud seen from a small camera arc
    (moved to openmvg_tpu.utils.synthetic.render_blob_dataset so the
    e2e benchmark shares the renderer)."""
    return render_blob_dataset(tmp, n_views=n_views, n_points=n_points,
                               size=size, focal=focal, seed=seed)


@pytest.mark.slow
def test_full_cli_pipeline(tmp_path):
    tmp = str(tmp_path)
    imgdir, gtdir, Rs, Cs, K = render_scene(tmp)
    out = os.path.join(tmp, "out")
    match_dir = os.path.join(tmp, "matches")
    os.makedirs(match_dir, exist_ok=True)

    assert cli.main(["init", "-i", imgdir, "-o", out,
                     "-f", str(K[0, 0]), "-c", "1"]) == 0
    sfm_data = os.path.join(out, "sfm_data.json")
    assert cli.main(["features", "-i", sfm_data, "-o", match_dir,
                     "-p", "HIGH"]) == 0
    pairs = os.path.join(match_dir, "pairs.txt")
    assert cli.main(["pairs", "-i", sfm_data, "-o", pairs]) == 0
    putative = os.path.join(match_dir, "matches.putative.bin")
    assert cli.main(["matches", "-i", sfm_data, "-o", putative,
                     "-p", pairs, "-r", "0.9"]) == 0
    filtered = os.path.join(match_dir, "matches.f.bin")
    assert cli.main(["filter", "-i", sfm_data, "-m", putative,
                     "-o", filtered]) == 0
    recon = os.path.join(tmp, "recon")
    # the dataset provides the EXACT focal/pp, and a 6-view short arc is
    # focal/depth (bas-relief) ambiguous: under ADJUST_ALL the global
    # cost minimum genuinely sits at a wrong focal (measured round 5:
    # f64 exact BA drives f 400 -> 145, ATE 0.13) — the same would
    # happen to the reference's ceres on this data.  Hold intrinsics
    # like a calibrated reference run (main_SfM.cpp -f NONE).
    assert cli.main(["sfm", "-i", sfm_data, "-m", match_dir,
                     "-M", filtered, "-o", recon,
                     "-f", "ADJUST_NONE"]) == 0

    # evaluate against GT
    from openmvg_tpu.io.gt_loaders import load_strecha_gt
    from openmvg_tpu.io.sfm_data import load_sfm_data
    from openmvg_tpu.sfm.eval_quality import evaluate_against_gt

    est = load_sfm_data(os.path.join(recon, "sfm_data.json"))
    gt = load_strecha_gt(gtdir)
    stats = evaluate_against_gt(est, gt)
    assert stats["ok"], stats
    assert stats["n_common"] >= 5
    # arc radius is 3.0; require ATE < 2% of it (measured round 5 with
    # held intrinsics: 0.0155)
    assert stats["position_rmse"] < 0.06, stats
    # absolute rotation gauge is weakly constrained by a near-1D camera
    # arc (roll about the arc axis is free under the position-only 7DoF
    # alignment the reference protocol uses, main_evalQuality.cpp:36-96);
    # check it loosely (measured round 5: 4.9 deg) and check the
    # gauge-free relative rotations tightly instead
    assert stats["rotation_error_median_deg"] < 8.0, stats
    from openmvg_tpu.geometry import so3
    import jax.numpy as jnp

    for (i, j) in [(0, 1), (0, 5), (2, 4)]:
        Rr_est = est.pose_R[est.view_pose[j]] @ est.pose_R[est.view_pose[i]].T
        Rr_gt = Rs[j] @ Rs[i].T
        err = float(so3.relative_rotation_angle_deg(
            jnp.asarray(Rr_est), jnp.asarray(Rr_gt)))
        assert err < 2.0, (i, j, err)

    # exporters smoke
    assert cli.main(["export", "-i", os.path.join(recon, "sfm_data.json"),
                     "-o", os.path.join(tmp, "model.nvm"), "-f", "nvm"]) == 0
    assert cli.main(["export", "-i", os.path.join(recon, "sfm_data.json"),
                     "-o", os.path.join(tmp, "colmap"), "-f", "colmap"]) == 0
    assert cli.main(["eval", "-i", os.path.join(recon, "sfm_data.json"),
                     "-g", gtdir]) == 0
