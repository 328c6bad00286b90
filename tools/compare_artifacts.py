"""Accuracy-parity harness: diff two pipeline artifact trees.

The BASELINE north star is disparity within 1% RMSE of the reference.
This tool delivers the verdict whenever reference artifacts (e.g. the
demo's expected-results fixture, reference README.md:70-71) or a
reference run directory are available:

    python tools/compare_artifacts.py DIR_A DIR_B [--rmse-threshold 0.01]

Where DIR_A / DIR_B are either

  * ``depth/`` directories of ``frame_XXXXXX.raw`` inverse-depth dumps,
  * fine-tune output dirs containing ``depth/`` and/or ``eval/``
    (``loss_e*.json`` files are diffed per pair when both sides have
    them).

Also: ``python tools/compare_artifacts.py --fetch-checkpoints`` tries to
download the released pretrained weights (mc/midas2/monodepth2) through
the reference's URLs into ``checkpoints/`` so a real-weights parity run
can be performed; in offline environments this prints a documented skip.

Exit codes: 0 = parity, 1 = out of band, 2 = SKIP (no comparable
artifacts found) — distinct so CI wiring can't silently "pass" when the
inputs are missing.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from consistent_depth_tpu.io import image_io  # noqa: E402


def _depth_dir(path: str) -> str:
    sub = os.path.join(path, "depth")
    return sub if os.path.isdir(sub) else path


def relative_rmse(a: np.ndarray, b: np.ndarray) -> float:
    """RMSE of (a - b) normalized by the RMS of b, over finite pixels."""
    m = np.isfinite(a) & np.isfinite(b)
    if not m.any():
        return float("nan")
    diff = a[m] - b[m]
    denom = np.sqrt(np.mean(np.square(b[m])))
    return float(np.sqrt(np.mean(np.square(diff))) / max(denom, 1e-12))


def compare_depth_dirs(dir_a: str, dir_b: str) -> dict:
    names_a = {os.path.basename(f)
               for f in glob.glob(os.path.join(dir_a, "frame_*.raw"))}
    names_b = {os.path.basename(f)
               for f in glob.glob(os.path.join(dir_b, "frame_*.raw"))}
    common = sorted(names_a & names_b)
    per_frame = {}
    for name in common:
        a = image_io.load_raw_float32_image(os.path.join(dir_a, name))
        b = image_io.load_raw_float32_image(os.path.join(dir_b, name))
        if a.shape != b.shape:
            per_frame[name] = float("nan")
            continue
        per_frame[name] = relative_rmse(a, b)
    vals = np.array([v for v in per_frame.values() if np.isfinite(v)])
    return {
        "frames_compared": len(common),
        "frames_only_a": sorted(names_a - names_b),
        "frames_only_b": sorted(names_b - names_a),
        "rmse_mean": float(vals.mean()) if len(vals) else None,
        "rmse_max": float(vals.max()) if len(vals) else None,
        "per_frame": per_frame,
    }


def compare_eval_losses(dir_a: str, dir_b: str) -> dict:
    """Diff matching eval/loss_e*.json files (mean sub-losses)."""
    out = {}
    files_a = {os.path.basename(f)
               for f in glob.glob(os.path.join(dir_a, "loss_*.json"))}
    files_b = {os.path.basename(f)
               for f in glob.glob(os.path.join(dir_b, "loss_*.json"))}
    for name in sorted(files_a & files_b):
        with open(os.path.join(dir_a, name)) as f:
            la = json.load(f)
        with open(os.path.join(dir_b, name)) as f:
            lb = json.load(f)
        entry = {}
        for key in set(la.get("mean", {})) & set(lb.get("mean", {})):
            va, vb = la["mean"][key], lb["mean"][key]
            entry[key] = {
                "a": va, "b": vb,
                "rel_diff": abs(va - vb) / max(abs(vb), 1e-12),
            }
        out[name] = entry
    return out


def fetch_checkpoints() -> int:
    from consistent_depth_tpu.utils import url_helpers

    ok = True
    for name in ("mc", "midas2", "monodepth2"):
        try:
            path = url_helpers.fetch_model(name)
            print(f"[{name}] available at {path}")
        except RuntimeError as e:
            ok = False
            print(f"[{name}] SKIP: {e}")
    if not ok:
        print("Some checkpoints unavailable (offline environment). "
              "Place them under checkpoints/ manually and rerun.")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dirs", nargs="*",
                    help="two artifact dirs to compare (ours, reference)")
    ap.add_argument("--rmse-threshold", type=float, default=0.01,
                    help="parity band for disparity relative RMSE")
    ap.add_argument("--fetch-checkpoints", action="store_true",
                    help="try to download the released pretrained weights")
    ap.add_argument("--json", action="store_true",
                    help="print the full report as JSON")
    args = ap.parse_args(argv)

    if args.fetch_checkpoints:
        return fetch_checkpoints()
    if len(args.dirs) != 2:
        ap.error("expected exactly two artifact directories")

    dir_a, dir_b = args.dirs
    report = {}

    da, db = _depth_dir(dir_a), _depth_dir(dir_b)
    if (glob.glob(os.path.join(da, "frame_*.raw"))
            and glob.glob(os.path.join(db, "frame_*.raw"))):
        report["depth"] = compare_depth_dirs(da, db)

    ea, eb = os.path.join(dir_a, "eval"), os.path.join(dir_b, "eval")
    if os.path.isdir(ea) and os.path.isdir(eb):
        report["eval_losses"] = compare_eval_losses(ea, eb)

    if not report:
        print("SKIP: no comparable artifacts found "
              "(need depth/*.raw or eval/loss_*.json on both sides).")
        return 2

    if args.json:
        print(json.dumps(report, indent=2))

    code = 0
    if "depth" in report:
        d = report["depth"]
        print(f"depth: {d['frames_compared']} frames, "
              f"relative RMSE mean={d['rmse_mean']}, max={d['rmse_max']}")
        if d["rmse_mean"] is None or d["rmse_mean"] > args.rmse_threshold:
            print(f"VERDICT: FAIL (> {args.rmse_threshold:.2%} band)")
            code = 1
        else:
            print(f"VERDICT: PASS (within {args.rmse_threshold:.2%})")
    for name, entry in report.get("eval_losses", {}).items():
        for key, v in entry.items():
            print(f"eval {name} {key}: a={v['a']:.6f} b={v['b']:.6f} "
                  f"rel_diff={v['rel_diff']:.4f}")
    return code


if __name__ == "__main__":
    sys.exit(main())
