"""AOT-compile the 8-way data-parallel train step for a REAL v5e-8 TPU
topology (``jax.experimental.topologies`` — no TPU hardware required)
and assert the compiled program's collective structure.

This is the multi-chip gate the virtual CPU mesh cannot provide: the
CPU mesh executes the SPMD program but compiles it with XLA:CPU; this
test runs the actual TPU compiler for a v5e:2x4 slice and checks that

- the program compiles at all (partitioning valid on real hardware);
- the gradient all-reduce exists and moves at least the full parameter
  footprint (bf16 grads under the production policy);
- nothing unexpected (all-to-all, host transfers) crosses the mesh;
- the per-chip HBM footprint is sane.

The demo-shape version of this audit is ``tools/topology_bench.py``.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# (the AOT-compile test below is marked slow individually; the
# committed-audit invariant check is fast and runs in the default suite)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "topology_bench", os.path.join(REPO_ROOT, "tools/topology_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow  # one real-TPU-compiler compile (~2 min)
def test_v5e8_train_step_compiles_with_grad_allreduce():
    tb = _load_tool()
    try:
        topo = tb.build_topology("v5e:2x4")
    except Exception as e:  # no libtpu / unsupported platform
        pytest.skip(f"TPU AOT topology unavailable: {e}")

    from jax.sharding import Mesh
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.parallel.mesh import DATA_AXIS
    from consistent_depth_tpu.training import (
        TrainingEngine, create_optimizer,
    )

    devices = np.asarray(topo.devices)
    assert devices.size == 8
    mesh = Mesh(devices, (DATA_AXIS,))
    engine = TrainingEngine(
        MannequinChallengeModel(checkpoint="", seed=0),
        create_optimizer("Adam", 4e-4), LossWeights(),
        mesh=mesh, precision="bf16")

    n_chips = devices.size
    batch = 4 * n_chips
    state, data, _, _, _ = tb.abstract_inputs(
        engine, n_chips, n_frames=4, h=32, w=32, n_pairs=batch, steps=1)
    compiled = engine._train_step.lower(
        state, data,
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.float32)).compile()

    audit = tb.audit_collectives(compiled.as_text())
    assert "all-reduce" in audit, audit
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(engine.model.variables["params"]))
    # the gradient all-reduce moves every parameter's gradient (bf16)
    # plus the BN batch-stat reductions; anything less means part of
    # the batch-sharded backward silently went un-reduced. Runtime
    # (loop-weighted) bytes: XLA sinks the scanned inception families'
    # grad all-reduces into the scan loop, so the static text total
    # undercounts what one step moves.
    assert audit["all-reduce"]["bytes_runtime"] >= 2 * n_params, (
        audit["all-reduce"], n_params)
    assert "all-to-all" not in audit, audit

    ma = compiled.memory_analysis()
    hbm = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    assert hbm < 2 * 1024**3  # tiny shapes: way under a 16 GiB chip


def test_collective_audit_parser():
    """The HLO audit must group async-fused duplicates by channel_id and
    sum variadic tuple shapes (pure parser test, no compile)."""
    tb = _load_tool()
    hlo = """
ENTRY %main () -> f32[] {
  %ag.1 = f16[8,32]{1,0} all-gather(%p0), channel_id=7, dimensions={1}
  %ag.2 = f16[8,32]{1,0} all-gather(%p1), channel_id=7, dimensions={1}
  %ar.1 = (bf16[100]{0}, bf16[50]{0}) all-reduce(%a, %b), channel_id=9
  %ar.2 = f32[10]{0} all-reduce(%c), channel_id=11
  %ags = (f32[4,8]{1,0}, f32[32,8]{1,0}) all-gather-start(%d), channel_id=12
  %agd = f32[32,8]{1,0} all-gather-done(%ags)
}
"""
    audit = tb.audit_collectives(hlo)
    # channel 7 counted once; channel 12 counts the gathered result only
    assert audit["all-gather"]["count"] == 2
    assert audit["all-gather"]["bytes"] == 8 * 32 * 2 + 32 * 8 * 4
    # variadic tuple all-reduce sums its elements
    assert audit["all-reduce"]["count"] == 2
    assert audit["all-reduce"]["bytes"] == (100 + 50) * 2 + 10 * 4
    # no loops in this fixture: runtime == static
    assert audit["all-reduce"]["bytes_runtime"] == audit["all-reduce"]["bytes"]


def test_collective_audit_loop_weighting():
    """Collectives inside while bodies count trip-count times in
    bytes_runtime (XLA sinks scanned-family gradient all-reduces into
    the scan loop); nesting multiplies; async duplicates of one channel
    take the deepest loop's multiplier."""
    tb = _load_tool()
    hlo = """
%cond.outer (p0: (s32[])) -> pred[] {
  %constant.1 = s32[]{:T(128)} constant(3)
  %gte.1 = s32[]{:T(128)} get-tuple-element(%p0), index=0
  ROOT %lt.1 = pred[]{:T(512)} compare(%gte.1, %constant.1), direction=LT
}

%cond.inner (p1: (s32[])) -> pred[] {
  %constant.2 = s32[]{:T(128)} constant(2)
  %gte.2 = s32[]{:T(128)} get-tuple-element(%p1), index=0
  ROOT %lt.2 = pred[]{:T(512)} compare(%gte.2, %constant.2), direction=LT
}

%body.inner (p2: (s32[])) -> (s32[]) {
  %ar.in = bf16[100]{0} all-reduce(%x), channel_id=21
  %ar.dup = bf16[100]{0} all-reduce(%x), channel_id=21
}

%body.outer (p3: (s32[])) -> (s32[]) {
  %ar.mid = f32[10]{0} all-reduce(%y), channel_id=22
  %while.in = (s32[]) while(%t0), condition=%cond.inner, body=%body.inner
}

ENTRY %main () -> f32[] {
  %ar.top = f32[7]{0} all-reduce(%z), channel_id=23
  %while.out = (s32[]) while(%t1), condition=%cond.outer, body=%body.outer
}
"""
    audit = tb.audit_collectives(hlo)
    ar = audit["all-reduce"]
    assert ar["count"] == 3  # channel 21 deduped
    assert ar["bytes"] == 100 * 2 + 10 * 4 + 7 * 4
    # runtime: ch21 x (3*2), ch22 x 3, ch23 x 1
    assert ar["bytes_runtime"] == 100 * 2 * 6 + 10 * 4 * 3 + 7 * 4


def test_collective_audit_call_edge_inherits_loop_multiplier():
    """A collective whose only occurrence is inside a fusion/async
    computation (calls=) or a conditional branch invoked FROM a loop
    body must inherit the loop's trip count."""
    tb = _load_tool()
    hlo = """
%cond (p0: (s32[])) -> pred[] {
  %constant.1 = s32[]{:T(128)} constant(4)
  %gte.1 = s32[]{:T(128)} get-tuple-element(%p0), index=0
  ROOT %lt.1 = pred[]{:T(512)} compare(%gte.1, %constant.1), direction=LT
}

%async_wrapped (p1: bf16[50]) -> bf16[50] {
  %ar.in = bf16[50]{0} all-reduce(%x), channel_id=31
}

%branch_a (p2: f32[5]) -> f32[5] {
  %ar.a = f32[5]{0} all-reduce(%y), channel_id=32
}

%branch_b (p3: f32[5]) -> f32[5] {
  %noop = f32[5]{0} copy(%y)
}

%body (p4: (s32[])) -> (s32[]) {
  %start = bf16[50]{0} fusion(%x), kind=kOutput, calls=%async_wrapped
  %condc = f32[5]{0} conditional(%p, %y, %y), branch_computations={%branch_a, %branch_b}
}

ENTRY %main () -> f32[] {
  %while.1 = (s32[]) while(%t), condition=%cond, body=%body
}
"""
    ar = tb.audit_collectives(hlo)["all-reduce"]
    assert ar["count"] == 2
    assert ar["bytes"] == 50 * 2 + 5 * 4
    # both in-fusion and in-branch collectives run 4x (the loop trips)
    assert ar["bytes_runtime"] == (50 * 2 + 5 * 4) * 4


def test_trip_count_parses_typed_compare_operands():
    """The while-condition compare may print operands typed
    (``compare(s32[] %a, s32[] %b)``) depending on HLO print options;
    the trip-count parser must handle both forms."""
    tb = _load_tool()
    hlo = """
%cond (p0: (s32[])) -> pred[] {
  %constant.9 = s32[]{:T(128)} constant(5)
  %gte.9 = s32[]{:T(128)} get-tuple-element(%p0), index=0
  ROOT %lt.9 = pred[]{:T(512)} compare(s32[]{:T(128)} %gte.9, s32[]{:T(128)} %constant.9), direction=LT
}

%body (p1: (s32[])) -> (s32[]) {
  %ar.t = f32[10]{0} all-reduce(%y), channel_id=41
}

ENTRY %main () -> f32[] {
  %while.9 = (s32[]) while(%t), condition=%cond, body=%body
}
"""
    ar = tb.audit_collectives(hlo)["all-reduce"]
    assert ar["bytes"] == 40
    assert ar["bytes_runtime"] == 40 * 5


def test_committed_audit_invariants():
    """Fast gate on the committed demo-shape audit (TOPOLOGY_v5e8.json):
    the numbers the v5e-8 projection is built on must keep positive HBM
    headroom and a gradient all-reduce in a sane band of the parameter
    footprint. The audit itself is refreshed with
    ``python tools/topology_bench.py --update --check`` (run each round;
    --check fails on >25% collective-byte drift vs this file)."""
    import json

    path = os.path.join(REPO_ROOT, "TOPOLOGY_v5e8.json")
    assert os.path.isfile(path), "TOPOLOGY_v5e8.json missing"
    with open(path) as f:
        topo = json.load(f)

    progs = topo["programs"]
    assert {"train_step", "train_epoch", "eval_epoch"} <= set(progs)
    for name, row in progs.items():
        assert row["hbm_headroom_pct"] > 0, (name, row["hbm_headroom_pct"])
        # generated-code ceiling: code bytes scale with conv INSTANCES
        # (XLA does not dedup — PERF.md cold-compile bisect); a jump
        # past this means an unrolled-conv regression, not noise
        assert row["code_mib"] < 320, (name, row["code_mib"])

    # the train step's gradient all-reduce: >= bf16 param footprint
    # (anything smaller means un-reduced gradients), <= 5x (the s2d
    # expanded-layout inflation is measured at 3.0x — see PERF.md)
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )

    model = MannequinChallengeModel(checkpoint="", seed=0)
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(model.variables["params"]))
    ar = progs["train_step"]["collectives"]["all-reduce"]["bytes"]
    assert 2 * n_params <= ar <= 10 * n_params, (ar, n_params)

    # the projection must exist and beat the north star on its own
    # conservative (serialized) number
    proj = topo["projection"]
    assert proj["beats_north_star"] is True
    assert proj["v5e8_serialized"]["total_s"] < proj["north_star_s"]


def test_check_against_committed_logic():
    """Unit test of the --check drift gate (no compile)."""
    tb = _load_tool()
    committed = {"programs": {"train_step": {
        "hbm_headroom_pct": 60.0,
        "collectives": {"all-reduce": {"bytes": 100}}}}}

    ok_report = {"programs": {"train_step": {
        "hbm_headroom_pct": 55.0,
        "collectives": {"all-reduce": {"bytes": 110}}}}}
    assert tb.check_against_committed(ok_report, committed) == []

    drift = {"programs": {"train_step": {
        "hbm_headroom_pct": 55.0,
        "collectives": {"all-reduce": {"bytes": 200}}}}}
    bad = tb.check_against_committed(drift, committed)
    assert len(bad) == 1 and "all-reduce" in bad[0]

    oom = {"programs": {"train_step": {
        "hbm_headroom_pct": -3.0,
        "collectives": {"all-reduce": {"bytes": 100}}}}}
    bad = tb.check_against_committed(oom, committed)
    assert len(bad) == 1 and "headroom" in bad[0]

    # a new program absent from the committed audit: headroom still
    # checked, no byte band to compare against — but a committed
    # program MISSING from the fresh report is a violation (renamed/
    # dropped programs must not pass the gate silently)
    new_prog = {"programs": {"extra": {
        "hbm_headroom_pct": 10.0, "collectives": {}}}}
    bad = tb.check_against_committed(new_prog, committed)
    assert len(bad) == 1 and "train_step" in bad[0] and "missing" in bad[0]

    both = {"programs": {
        "train_step": ok_report["programs"]["train_step"],
        "extra": new_prog["programs"]["extra"]}}
    assert tb.check_against_committed(both, committed) == []

    # when both sides carry loop-weighted bytes, the gate compares
    # those (static bytes shift with compiler loop-sinking decisions)
    committed_rt = {"programs": {"train_step": {
        "hbm_headroom_pct": 60.0,
        "collectives": {"all-reduce": {"bytes": 100, "bytes_runtime": 400}}}}}
    runtime_ok = {"programs": {"train_step": {
        "hbm_headroom_pct": 55.0,
        # static bytes halved (would trip the 25% band) but runtime
        # traffic unchanged -> no violation
        "collectives": {"all-reduce": {"bytes": 50, "bytes_runtime": 410}}}}}
    assert tb.check_against_committed(runtime_ok, committed_rt) == []
    runtime_drift = {"programs": {"train_step": {
        "hbm_headroom_pct": 55.0,
        "collectives": {"all-reduce": {"bytes": 100, "bytes_runtime": 900}}}}}
    bad = tb.check_against_committed(runtime_drift, committed_rt)
    assert len(bad) == 1 and "all-reduce" in bad[0]
