"""Measure the ACTUAL run-to-run drift of the e2e fixture's post-train
artifacts, to set the golden bands in tests/test_pipeline_e2e.py from
measurement instead of guesswork (round-4 VERDICT item 3: "Nobody has
measured the *actual* run-to-run drift to justify 0.5").

Method: run the synthetic-scene pipeline (the exact configuration
``tests/test_pipeline_e2e.py`` uses, on the 8-virtual-device CPU
backend the goldens were recorded on) N times in fresh subprocesses,
then report

- pairwise run-to-run max relative diff of every post-train eval-loss
  artifact (loss_e0001/e0002 per-pair + mean entries),
- pairwise run-to-run max RMSE of the final depth maps,
- the same two numbers for each run vs the committed goldens.

The post-train bands in test_golden_parity should be the measured
vs-golden numbers x a safety margin; the run-to-run numbers tell
whether the drift is seeded-determinism noise (expect ~0 on one
backend) or real.

Usage: python tools/band_drift.py [--runs 3] [--keep]
Prints one JSON document.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
from os.path import join as pjoin

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, pjoin(REPO, "tests"))
sys.path.insert(0, pjoin(REPO, "tools"))

GOLDEN_DIR = pjoin(REPO, "tests", "golden", "e2e")

_CHILD = r"""
import os, sys, shutil
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["CDTPU_NO_FETCH"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
repo, out = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))
import synthetic
work = os.path.join(out, "work")
os.makedirs(work, exist_ok=True)
synthetic.build_e2e_dataset(work)
initial_depth_dir, ft_out_dir, frames = synthetic.run_e2e_pipeline(work)
os.makedirs(os.path.join(out, "eval"), exist_ok=True)
for name in os.listdir(os.path.join(ft_out_dir, "eval")):
    if name.startswith("loss") and name.endswith(".json"):
        shutil.copy2(os.path.join(ft_out_dir, "eval", name),
                     os.path.join(out, "eval", name))
shutil.copytree(os.path.join(ft_out_dir, "depth"),
                os.path.join(out, "final_depth"))
shutil.copytree(os.path.join(initial_depth_dir, "depth"),
                os.path.join(out, "initial_depth"))
shutil.rmtree(work)
print("child done:", out)
"""


def run_once(out_dir: str) -> None:
    env = dict(os.environ)
    # isolate from the test suite's persistent compile cache decision:
    # reuse it (fast) — executables are deterministic for a fixed key
    subprocess.run(
        [sys.executable, "-c", _CHILD, REPO, out_dir],
        check=True, cwd=REPO, env=env, timeout=3600)


def eval_spread(dir_a: str, dir_b: str):
    import compare_artifacts as ca

    e = ca.compare_eval_losses(pjoin(dir_a, "eval"), pjoin(dir_b, "eval"))
    pre, post = 0.0, 0.0
    for name, entries in e.items():
        is_pre = "_e0000_" in name or name == "loss_e0000.json"
        worst = max(v["rel_diff"] for v in entries.values())
        if is_pre:
            pre = max(pre, worst)
        else:
            post = max(post, worst)
    return pre, post


def depth_spread(dir_a: str, dir_b: str, sub: str):
    import compare_artifacts as ca

    d = ca.compare_depth_dirs(pjoin(dir_a, sub), pjoin(dir_b, sub))
    return d["rmse_max"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    base = tempfile.mkdtemp(prefix="cdtpu_drift_")
    runs = []
    for i in range(args.runs):
        out = pjoin(base, f"run{i}")
        os.makedirs(out)
        print(f"[band_drift] run {i} ...", flush=True)
        run_once(out)
        runs.append(out)

    report = {"runs": args.runs, "pairwise": [], "vs_golden": []}
    for i in range(len(runs)):
        for j in range(i + 1, len(runs)):
            pre, post = eval_spread(runs[i], runs[j])
            report["pairwise"].append({
                "pair": [i, j],
                "eval_pre_rel": pre,
                "eval_post_rel": post,
                "final_depth_rmse": depth_spread(
                    runs[i], runs[j], "final_depth"),
                "initial_depth_rmse": depth_spread(
                    runs[i], runs[j], "initial_depth"),
            })
    if os.path.isdir(GOLDEN_DIR):
        for i, r in enumerate(runs):
            pre, post = eval_spread(GOLDEN_DIR, r)
            report["vs_golden"].append({
                "run": i,
                "eval_pre_rel": pre,
                "eval_post_rel": post,
                "final_depth_rmse": depth_spread(
                    GOLDEN_DIR, r, "final_depth"),
                "initial_depth_rmse": depth_spread(
                    GOLDEN_DIR, r, "initial_depth"),
            })

    def worst(key, rows):
        return max((r[key] for r in rows), default=0.0)

    report["summary"] = {
        "run_to_run": {
            k: worst(k, report["pairwise"])
            for k in ("eval_pre_rel", "eval_post_rel",
                      "final_depth_rmse", "initial_depth_rmse")
        },
        "vs_golden": {
            k: worst(k, report["vs_golden"])
            for k in ("eval_pre_rel", "eval_post_rel",
                      "final_depth_rmse", "initial_depth_rmse")
        },
    }
    print(json.dumps(report, indent=1))
    if not args.keep:
        shutil.rmtree(base)
    else:
        print("kept:", base)


if __name__ == "__main__":
    main()
