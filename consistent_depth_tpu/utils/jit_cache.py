"""Persistent XLA executable cache shared by every entry point.

Compiling the demo's train/eval epoch programs costs ~165 s on this
host; the cache pays it once per machine instead of once per process
(verified on the tunneled TPU platform: hourglass init 27 s -> 6 s on a
second run). Opt out with CDTPU_JIT_CACHE=off, relocate with
CDTPU_JIT_CACHE=<dir>.

The default directory is scoped by a host fingerprint: XLA's cache key
does not cover the host CPU's feature set, so an XLA:CPU AOT
executable compiled on one machine can be loaded — with a SIGILL
warning — on another that shares the same home directory. Keying the
directory on the CPU flags keeps each machine's cache to itself.
"""

import hashlib
import os


def _host_fingerprint() -> str:
    """Short stable id for this machine's instruction set.

    Covers the feature flags AND the CPU model identity: LLVM derives
    tuning pseudo-features (e.g. ``prefer-no-scatter`` on some server
    parts) from the detected microarchitecture, so two hosts with
    identical cpuinfo flags can still produce mutually-foreign XLA:CPU
    AOT executables."""
    tokens = [os.uname().machine]
    try:
        model = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "vendor_id", "cpu family",
                                    "model", "stepping", "CPU part",
                                    "CPU implementer")):
                    model += line.strip() + ";"
                elif line.startswith(("flags", "Features")):
                    # flags end the identity block on x86; one block is
                    # enough (all cores identical for our purposes)
                    tokens.append(
                        " ".join(sorted(line.split(":", 1)[1].split())))
                    break
        tokens.append(model)
    except OSError:
        import platform

        tokens.append(platform.processor())
    return hashlib.sha1("|".join(tokens).encode()).hexdigest()[:10]


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
                "jit-" + _host_fingerprint()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without the flags
        pass
