"""CLI entry (reference: main.py).

    python -m consistent_depth_tpu.cli.main --video_file v.mp4 --path d ...
"""

import os


def _enable_persistent_jit_cache():
    """XLA executables persist across processes (verified to work on the
    tunneled TPU platform: hourglass init 27 s -> 6 s on the second
    run; the demo's ~165 s epoch-0 train/eval compile is paid once per
    machine instead of once per video). Opt out with
    CDTPU_JIT_CACHE=off, relocate with CDTPU_JIT_CACHE=<dir>."""
    loc = os.environ.get("CDTPU_JIT_CACHE", "")
    if loc.lower() == "off":
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        loc or os.path.join(
            os.path.expanduser("~"), ".cache", "consistent_depth_tpu",
            "jit"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(args=None):
    _enable_persistent_jit_cache()

    from ..pipeline.process import DatasetProcessor
    from .params import Video3dParamsParser

    params = Video3dParamsParser().parse(args)
    return DatasetProcessor().process(params)


if __name__ == "__main__":
    main()
