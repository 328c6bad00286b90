"""AOT-compile the production multi-chip programs for a REAL TPU
topology with the real TPU compiler — no pod required — and report the
compiler's cost/memory analysis plus an HLO collective audit at demo
shapes.

Why this exists: the only multi-chip validation this environment can
*execute* is the 8-virtual-device CPU mesh (tests/conftest.py,
``__graft_entry__.dryrun_multichip``), which proves SPMD semantics but
says nothing about what the real TPU compiler does with the program.
This tool closes that gap with ``jax.experimental.topologies``: it
builds a device-less ``v5e:2x4`` (v5e-8) topology description, lowers
the engine's actual train-epoch / eval-epoch / train-step programs at
the reference-demo shapes (244 frames, 224x384, 715 hierarchical2
pairs, global batch 4*n_chips — reference hot loop
/root/reference/depth_fine_tuning.py:261-304), compiles them with the
real TPU toolchain, and reports:

- per-chip HBM footprint (arguments + outputs + temps + code) — proof
  the replicated device-resident dataset plan fits a 16 GB v5e chip;
- compiler cost analysis (FLOPs, bytes accessed, optimal seconds);
- a collective audit straight from the optimized HLO: every
  all-reduce / all-gather / reduce-scatter / collective-permute with
  shapes and bytes — proof the 8-way program moves one gradient
  all-reduce (~21 MB) plus a small metrics gather per step and nothing
  else over ICI.

Usage (any host with libtpu, no TPU attached needed):
    python tools/topology_bench.py [--topology v5e:2x4] [--tiny]

Prints one JSON document.
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

# Demo-scale workload constants (mirror bench.py)
N_FRAMES = 244
H, W = 224, 384
N_PAIRS = 715            # hierarchical2 one-way pairs over 244 frames
BATCH_PER_CHIP = 4
HBM_PER_CHIP_BYTES = 16 * 1024**3   # v5e: 16 GiB HBM per chip


def build_topology(name: str):
    from jax.experimental import topologies

    return topologies.get_topology_desc(platform="tpu", topology_name=name)


def abstract_inputs(engine, n_chips, n_frames, h, w, n_pairs, steps):
    """ShapeDtypeStructs for (state, data, idx, valid, capture)."""
    from consistent_depth_tpu.training.engine import TrainState

    def build_state(variables):
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=engine.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    state = jax.eval_shape(build_state, engine.model.variables)
    f32, i32 = jnp.float32, jnp.int32
    sds = jax.ShapeDtypeStruct
    data = {
        "frames": sds((n_frames, h, w, 3), f32),
        "pair_slots": sds((n_pairs, 2), i32),
        "pair_ids": sds((n_pairs, 2), i32),
        "flows": sds((n_pairs, 2, h, w, 2), f32),
        "masks": sds((n_pairs, 2, h, w), f32),
        "intrinsics": sds((n_pairs, 2, 4), f32),
        "extrinsics": sds((n_pairs, 2, 3, 4), f32),
    }
    batch = BATCH_PER_CHIP * n_chips
    idx = sds((steps, batch), i32)
    valid = sds((steps, batch), f32)
    cap = sds((steps,), i32)
    return state, data, idx, valid, cap


_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
# Sync form:   %all-reduce.1 = f32[5406467]{0} all-reduce(...)
# Async form:  %ag = (f32[4,8], f32[32,8]) all-gather-start(...)
#              ... all-gather-done(%ag)   <- counted via the start only
_OP_RE = re.compile(r"\s(" + "|".join(_COLLECTIVES) + r")(-start)?\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


_CHANNEL_RE = re.compile(r"channel_id=(\d+)")


def _shape_bytes(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


_COMPUTATION_RE = re.compile(r"^(?:ENTRY )?(%\S+) \(")
_WHILE_RE = re.compile(r" while\(.*?\), condition=(%[^\s,]+), body=(%[^\s,]+)")
_CONST_RE = re.compile(r"(%\S+) = s32\S* constant\((\d+)\)")
# operands may print bare (%name) or typed (s32[] %name) depending on
# the HLO print options — accept both
_COMPARE_RE = re.compile(
    r"ROOT %\S+ = pred\S* compare\((?:[a-z0-9]+\[[^\]]*\]\S* )?(%[^\s,]+),"
    r" (?:[a-z0-9]+\[[^\]]*\]\S* )?(%[^\s)]+)\),"
    r" direction=(LT|LE|GT|GE)")
# non-loop call edges whose callee runs (at least) once per caller
# execution: fusions, async wrappers (calls=%comp), and conditional
# branches (branch_computations={%a, %b}) — a collective living only
# inside one of these must still inherit the surrounding loop's
# multiplier
_CALLS_RE = re.compile(r"calls=(%[^\s,)}]+)")
_BRANCHES_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_TO_APPLY_RE = re.compile(r"to_apply=(%[^\s,)}]+)")


def _loop_multipliers(lines):
    """Map computation name -> how many times it executes per program
    run, from the ``while`` nesting structure of optimized HLO.

    XLA sinks collectives into loop bodies (observed: the scanned
    inception families' gradient all-reduces run once per scan
    iteration), so a static byte count over the text undercounts the
    traffic a single program execution moves. Trip counts come from
    each while's condition computation (``ROOT compare(iter, constant),
    direction=LT``); an unparseable condition conservatively counts 1.
    Multipliers propagate through non-loop call edges too (``calls=``
    fusion/async computations, ``branch_computations=`` conditionals,
    ``to_apply=``) so a collective whose only occurrence is inside a
    fusion called from a loop body still counts trip-count times."""
    comp_of_line, comp = [], None
    comp_lines = {}
    for line in lines:
        m = _COMPUTATION_RE.match(line)
        if m:
            comp = m.group(1)
        comp_of_line.append(comp)
        comp_lines.setdefault(comp, []).append(line)

    # trip count of each condition computation
    trips = {}
    for name, body in comp_lines.items():
        consts, cmp_m = {}, None
        for line in body:
            cm = _CONST_RE.search(line)
            if cm:
                consts[cm.group(1)] = int(cm.group(2))
            rm = _COMPARE_RE.search(line)
            if rm:
                cmp_m = rm
        if cmp_m is None:
            continue
        a, b, direction = cmp_m.groups()
        bound = consts.get(b, consts.get(a))
        if bound is not None:
            trips[name] = bound + (1 if direction in ("LE", "GE") else 0)

    # callee computation -> (calling computation, per-call multiplier).
    # While bodies get the loop trip count; fusion/async/conditional
    # callees run once per caller execution (trip 1). A computation
    # called from several sites keeps the LARGEST-multiplier caller
    # (conservative: the audit wants an upper bound on traffic).
    parent = {}

    def add_edge(callee, caller, trip):
        if callee == caller:
            return
        old = parent.get(callee)
        if old is None or trip > old[1]:
            parent[callee] = (caller, trip)

    for i, line in enumerate(lines):
        caller = comp_of_line[i]
        if caller is None:
            continue
        wm = _WHILE_RE.search(line)
        if wm and "=" in line[:wm.start()]:
            cond, body = wm.groups()
            parent[body] = (caller, trips.get(cond, 1))
            continue
        for m in _CALLS_RE.finditer(line):
            add_edge(m.group(1), caller, 1)
        for m in _TO_APPLY_RE.finditer(line):
            add_edge(m.group(1), caller, 1)
        bm = _BRANCHES_RE.search(line)
        if bm:
            for branch in bm.group(1).split(","):
                branch = branch.strip()
                if branch.startswith("%"):
                    add_edge(branch, caller, 1)

    mult = {}

    def resolve(name, seen=()):
        if name in mult:
            return mult[name]
        if name not in parent or name in seen:
            return 1
        up, trip = parent[name]
        m = resolve(up, seen + (name,)) * trip
        mult[name] = m
        return m

    return {name: resolve(name) for name in comp_lines if name}, comp_of_line


def audit_collectives(hlo_text: str):
    """Count LOGICAL collectives in optimized HLO, with per-op bytes.

    Instructions sharing a channel_id are ONE collective: XLA's async
    collective-fusion pass threads a single all-gather/all-reduce
    through many fusion computations to overlap it with compute, which
    duplicates the instruction textually (observed: one capture-buffer
    all-gather appearing 199x across async_collective_fusion.* bodies).
    Variadic (tuple) collectives sum their element shapes — the flat
    gradient all-reduce moves ~181 conv-grad tensors in one channel.

    Two byte totals per op: ``bytes`` counts each logical collective
    once (static text), ``bytes_runtime`` weights collectives inside
    ``while`` bodies by the loop trip count — the traffic one program
    execution actually moves (XLA sinks the scanned inception families'
    gradient all-reduces into the scan loop; for the epoch programs the
    outer steps-scan multiplies in as well, so their runtime figure is
    per-epoch, not per-step)."""
    lines = hlo_text.splitlines()
    mults, comp_of_line = _loop_multipliers(lines)
    seen_channels = {}
    out = {}
    for lineno, line in enumerate(lines):
        m = _OP_RE.search(line)
        if m is None:
            continue
        eq = line.find("=")
        if eq < 0 or eq > m.start():
            continue
        op = m.group(1)
        mult = mults.get(comp_of_line[lineno], 1)
        ch = _CHANNEL_RE.search(line)
        key = (op, ch.group(1)) if ch else (op, f"line{lineno}")
        if key in seen_channels:
            # async duplicates of one channel can appear in several
            # computations; the loop the collective really lives in is
            # the deepest one — keep the max multiplier
            rec, nbytes, prev = seen_channels[key]
            if mult > prev:
                rec["bytes_runtime"] += nbytes * (mult - prev)
                seen_channels[key] = (rec, nbytes, mult)
            continue
        shapes = _SHAPE_RE.findall(line[:m.start()])
        if not shapes:
            continue
        # async start ops in the older tuple form carry (operands...,
        # results...) with the halves shape-identical (an all-reduce's
        # result shape equals its operand shape) — count one half only,
        # never both. The all-gather start form (shard, result) has
        # differing halves and is handled by the max-size rule below.
        if m.group(2) and len(shapes) % 2 == 0 and len(shapes) >= 2:
            half = len(shapes) // 2
            if shapes[:half] == shapes[half:]:
                shapes = shapes[half:]
        sizes = [_shape_bytes(d, s) for d, s in shapes]
        if op == "all-gather" and len(sizes) >= 2 and max(sizes) > min(sizes):
            # async start tuple = (local shard, gathered result):
            # count only the full-size result(s)
            full = max(sizes)
            nbytes = sum(s for s in sizes if s == full)
            label = [f"{d}[{s}]" for (d, s), b in zip(shapes, sizes)
                     if b == full][0]
        else:
            nbytes = sum(sizes)
            d, s = max(zip(shapes, sizes), key=lambda t: t[1])[0]
            label = f"{d}[{s}]" + (f" (+{len(sizes) - 1} tensors)"
                                   if len(sizes) > 1 else "")
        rec = out.setdefault(
            op, {"count": 0, "bytes": 0, "bytes_runtime": 0, "shapes": {}})
        rec["count"] += 1
        rec["bytes"] += nbytes
        rec["bytes_runtime"] += nbytes * mult
        rec["shapes"][label] = rec["shapes"].get(label, 0) + 1
        seen_channels[key] = (rec, nbytes, mult)
    # keep only the 5 most frequent shapes per op to bound output
    for rec in out.values():
        top = sorted(rec["shapes"].items(), key=lambda kv: -kv[1])[:5]
        rec["shapes"] = dict(top)
    return out


def analyze(compiled, compile_s):
    ma = compiled.memory_analysis()
    hbm = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
           - ma.alias_size_in_bytes)
    row = {
        "compile_s": round(compile_s, 1),
        "hbm_per_chip_gib": round(hbm / 1024**3, 3),
        "hbm_headroom_pct": round(100 * (1 - hbm / HBM_PER_CHIP_BYTES), 1),
        "argument_gib": round(ma.argument_size_in_bytes / 1024**3, 3),
        "temp_gib": round(ma.temp_size_in_bytes / 1024**3, 3),
        "output_gib": round(ma.output_size_in_bytes / 1024**3, 3),
        "donated_alias_gib": round(ma.alias_size_in_bytes / 1024**3, 3),
        "code_mib": round(ma.generated_code_size_in_bytes / 1024**2, 1),
    }
    try:
        # NOTE: XLA's cost analysis counts a while-loop (lax.scan) body
        # ONCE, so for the epoch programs "flops_per_exec", "hbm bytes
        # accessed", and the collective counts/bytes below are all
        # per-STEP (per scan iteration), not per epoch execution —
        # which is why train_epoch reports the same totals as
        # train_step.
        ca = compiled.cost_analysis()
        if ca:
            if ca.get("flops"):
                row["flops_per_exec"] = float(ca["flops"])
            if ca.get("bytes accessed"):
                row["hbm_bytes_accessed"] = float(ca["bytes accessed"])
            if ca.get("optimal_seconds", 0) > 0:  # negative = no estimate
                row["compiler_optimal_s"] = float(ca["optimal_seconds"])
    except Exception:
        pass
    try:
        row["collectives"] = audit_collectives(
            compiled.as_text())
    except Exception as e:  # pragma: no cover
        row["collectives_error"] = str(e)[:200]
    return row


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOPOLOGY_JSON = os.path.join(REPO, "TOPOLOGY_v5e8.json")


def check_against_committed(report: dict, committed: dict,
                            band: float = 0.25):
    """Regression gate for the committed audit (TOPOLOGY_v5e8.json):
    every freshly-compiled program must keep positive HBM headroom and
    its collective traffic within ``band`` of the committed bytes. A
    violation means the multi-chip program's memory or communication
    profile changed and the committed audit (and the v5e-8 projection
    built on it) silently rotted. A committed program absent from the
    fresh report is also a violation (a renamed or dropped program must
    not pass the gate silently). Returns a list of violations."""
    bad = []
    old_progs = committed.get("programs", {})
    for name in old_progs:
        if name not in report["programs"]:
            bad.append(f"{name}: in the committed audit but missing "
                       "from this run (renamed/dropped program, or a "
                       "narrowed --programs list)")
    for name, row in report["programs"].items():
        if row.get("hbm_headroom_pct", -1) <= 0:
            bad.append(f"{name}: HBM headroom "
                       f"{row.get('hbm_headroom_pct')}% <= 0")
        if name not in old_progs:
            continue
        for op in ("all-reduce", "all-gather"):
            new_rec = row.get("collectives", {}).get(op, {})
            old_rec = old_progs[name].get("collectives", {}).get(op, {})
            # loop-weighted traffic is the stable semantics (static text
            # bytes shift whenever the compiler re-decides loop sinking);
            # compare it when both sides carry it
            if "bytes_runtime" in new_rec and "bytes_runtime" in old_rec:
                new_b = new_rec["bytes_runtime"]
                old_b = old_rec["bytes_runtime"]
            else:
                new_b = new_rec.get("bytes", 0)
                old_b = old_rec.get("bytes", 0)
            if old_b == 0 and new_b == 0:
                continue
            ref = max(old_b, 1)
            if abs(new_b - old_b) / ref > band:
                bad.append(
                    f"{name}: {op} bytes {new_b} vs committed {old_b} "
                    f"(> {band:.0%} drift)")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4",
                    help="TPU topology name (default v5e:2x4 = v5e-8)")
    ap.add_argument("--tiny", action="store_true",
                    help="32x32 shapes (CI-speed sanity run)")
    ap.add_argument("--programs", default="train_epoch,eval_epoch,train_step")
    ap.add_argument("--dump-hlo", default="",
                    help="directory to write each program's optimized HLO")
    ap.add_argument("--check", action="store_true",
                    help="compare the fresh audit against the committed "
                         "TOPOLOGY_v5e8.json bands (exit 1 on drift)")
    ap.add_argument("--update", action="store_true",
                    help="write the fresh audit back into "
                         "TOPOLOGY_v5e8.json (programs/shapes keys; the "
                         "projection key is preserved)")
    args = ap.parse_args()

    # array math (model init) stays on host CPU; only the AOT lowering
    # targets the TPU topology
    jax.config.update("jax_platforms", "cpu")

    topo = build_topology(args.topology)
    devices = np.asarray(topo.devices)
    n_chips = devices.size
    from consistent_depth_tpu.parallel.mesh import DATA_AXIS

    mesh = Mesh(devices, (DATA_AXIS,))

    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.training import TrainingEngine, create_optimizer

    engine = TrainingEngine(
        MannequinChallengeModel(checkpoint="", seed=0),
        create_optimizer("Adam", 4e-4),
        LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
        mesh=mesh, precision="bf16")

    if args.tiny:
        n_frames, h, w, n_pairs = 4, 32, 32, max(8, n_chips)
    else:
        n_frames, h, w, n_pairs = N_FRAMES, H, W, N_PAIRS
    batch = BATCH_PER_CHIP * n_chips
    steps = int(np.ceil(n_pairs / batch))
    state, data, idx, valid, cap = abstract_inputs(
        engine, n_chips, n_frames, h, w, n_pairs, steps)
    eval_args = (state, data, idx, valid)
    if engine.eval_dedup:  # dedup eval takes the frame-chunk index array
        fsteps = max(1, -(-n_frames // (2 * batch)))
        eval_args += (jax.ShapeDtypeStruct(
            (fsteps, batch, 2), jnp.int32),)

    report = {
        "topology": args.topology,
        "n_chips": n_chips,
        "device_kind": str(devices.flat[0].device_kind),
        "shapes": {"frames": [n_frames, h, w, 3], "pairs": n_pairs,
                   "global_batch": batch, "steps_per_epoch": steps},
        "programs": {},
    }
    progs = {
        "train_epoch": (engine._train_epoch, (state, data, idx, valid, cap)),
        "eval_epoch": (engine._eval_epoch, eval_args),
        "train_step": (engine._train_step,
                       (state, data,
                        jax.ShapeDtypeStruct((batch,), jnp.int32),
                        jax.ShapeDtypeStruct((batch,), jnp.float32))),
    }
    for name in args.programs.split(","):
        fn, fargs = progs[name]
        t0 = time.perf_counter()
        compiled = fn.lower(*fargs).compile()
        report["programs"][name] = analyze(
            compiled, time.perf_counter() - t0)
        # incremental progress on stderr: a failed later program must not
        # lose an earlier multi-minute compile's analysis
        print(f"[topology] {name}: "
              + json.dumps(report["programs"][name]), file=sys.stderr)
        if args.dump_hlo:
            os.makedirs(args.dump_hlo, exist_ok=True)
            with open(os.path.join(args.dump_hlo, name + ".hlo"), "w") as f:
                f.write(compiled.as_text())

    print(json.dumps(report, indent=1))

    if (args.check or args.update) and args.tiny:
        print("[topology] --check/--update ignored under --tiny "
              "(committed audit is demo-shape)", file=sys.stderr)
        return
    if args.check:
        if not os.path.isfile(TOPOLOGY_JSON):
            # a gate with no baseline must FAIL, not vacuously pass
            print(f"[topology] CHECK FAILED: committed audit "
                  f"{TOPOLOGY_JSON} is missing", file=sys.stderr)
            sys.exit(1)
        with open(TOPOLOGY_JSON) as f:
            committed = json.load(f)
        bad = check_against_committed(report, committed)
        if bad:
            print("[topology] CHECK FAILED:\n  " + "\n  ".join(bad),
                  file=sys.stderr)
            if not args.update:
                sys.exit(1)
        else:
            print("[topology] check vs committed audit: OK",
                  file=sys.stderr)
    if args.update:
        committed = {}
        if os.path.isfile(TOPOLOGY_JSON):
            with open(TOPOLOGY_JSON) as f:
                committed = json.load(f)
        stale = sorted(set(committed.get("programs", {}))
                       - set(report["programs"]))
        if stale:
            # partial --programs runs must not silently mix audits:
            # the kept rows were measured under different code/shapes
            print("[topology] WARNING: keeping committed entries not "
                  f"re-measured by this run: {', '.join(stale)} — "
                  "topology/shapes keys now reflect THIS run only",
                  file=sys.stderr)
        for key in ("topology", "n_chips", "device_kind", "shapes"):
            committed[key] = report[key]
        committed.setdefault("programs", {}).update(report["programs"])
        with open(TOPOLOGY_JSON, "w") as f:
            json.dump(committed, f, indent=1)
        print(f"[topology] wrote {TOPOLOGY_JSON}", file=sys.stderr)


if __name__ == "__main__":
    main()
