"""Persistent XLA executable cache shared by every entry point.

Compiling the demo's train/eval epoch programs costs ~165 s on this
host; the cache pays it once per machine instead of once per process
(verified on the tunneled TPU platform: hourglass init 27 s -> 6 s on a
second run). Opt out with CDTPU_JIT_CACHE=off, relocate with
CDTPU_JIT_CACHE=<dir>.
"""

import os


def enable_persistent_jit_cache() -> None:
    loc = os.environ.get("CDTPU_JIT_CACHE", "")
    if loc.lower() == "off":
        return
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            loc or os.path.join(
                os.path.expanduser("~"), ".cache", "consistent_depth_tpu",
                "jit"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without the flags
        pass
