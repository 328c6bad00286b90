"""Regenerate the committed golden e2e artifacts (tests/golden/e2e).

Runs the synthetic-scene pipeline once — the exact configuration
``tests/test_pipeline_e2e.py`` uses — on the CPU backend (the platform
the test suite runs on) and copies the regression-gated artifacts into
the golden tree:

    tests/golden/e2e/
      manifest.json        provenance: jax version, date, pipeline args
      initial_depth/       frame_*.raw — random-init forward inference
      final_depth/         frame_*.raw — after 2 fine-tune epochs
      eval/                loss_e*.json — pre-training + per-epoch
      scales.csv           calibration scales

Run after an INTENTIONAL numerics change and commit the result; the
suite's ``test_golden_parity`` diffs every run against these offline
(the stand-in for the reference's expected-results fixture, reference
README.md:70-71, until pretrained weights are available here).

Usage: python tools/make_golden.py [--out tests/golden/e2e]
"""

import argparse
import datetime
import glob
import json
import os
import shutil
import sys
import tempfile
from os.path import join as pjoin

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, pjoin(REPO, "tests"))

# goldens are pinned to the EXACT device configuration the test suite
# runs under (tests/conftest.py): the CPU backend with 8 virtual
# devices. The device count is load-bearing — the fine-tune engine
# scales the global batch by device count (like the reference scales
# by GPU count), so batch composition, and with it batch-stat BN and
# the eval-loss means, differ between a 1-device and an 8-device run.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=pjoin(REPO, "tests", "golden", "e2e"))
    args = ap.parse_args(argv)

    import synthetic  # noqa: E402 (tests/ on path)

    work = tempfile.mkdtemp(prefix="cdtpu_golden_")
    print(f"building synthetic dataset + running pipeline in {work} ...")
    synthetic.build_e2e_dataset(work)
    initial_depth_dir, ft_out_dir, frames = synthetic.run_e2e_pipeline(work)
    range_dir = os.path.dirname(ft_out_dir)

    out = args.out
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)

    shutil.copytree(pjoin(initial_depth_dir, "depth"),
                    pjoin(out, "initial_depth"))
    shutil.copytree(pjoin(ft_out_dir, "depth"), pjoin(out, "final_depth"))
    os.makedirs(pjoin(out, "eval"))
    for f in sorted(glob.glob(pjoin(ft_out_dir, "eval", "loss_*.json"))):
        shutil.copy(f, pjoin(out, "eval", os.path.basename(f)))
    shutil.copy(pjoin(range_dir, "scales.csv"), pjoin(out, "scales.csv"))

    manifest = {
        "generated": datetime.date.today().isoformat(),
        "jax_version": jax.__version__,
        "platform": jax.devices()[0].platform,
        "n_devices": jax.device_count(),
        "pipeline_args": synthetic.E2E_PIPELINE_ARGS,
        "frames": frames,
    }
    with open(pjoin(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
        f.write("\n")

    n_raw = len(glob.glob(pjoin(out, "*", "*.raw")))
    n_json = len(glob.glob(pjoin(out, "eval", "*.json")))
    print(f"golden tree written to {out}: {n_raw} depth maps, "
          f"{n_json} eval files")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
