"""The jit-compiled training engine.

Reference equivalent: the body of DepthFineTuner.fine_tune's loop
(depth_fine_tuning.py:261-304). TPU-first redesign:

- ONE compiled ``train_step(state, data, idx, valid)``: device-side
  batch gather -> backbone forward (train-mode BN) -> geometric
  consistency loss -> grads -> Adam update, with donated state;
- the reference's host-side NaN-skip (depth_fine_tuning.py:278-280)
  becomes a masked update: non-finite loss keeps params/opt state
  (batch-stat updates still apply, matching torch where the forward
  has already run before the check);
- under a mesh, the batch axis is sharded over ``data`` and XLA
  inserts the psum gradient all-reduce (replicated-out sharding).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.base import DepthModel
from ..ops.losses import LossWeights, joint_loss
from ..parallel.mesh import DATA_AXIS


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def gather_batch(data: Dict[str, jnp.ndarray], idx: jnp.ndarray):
    """Device-side assembly of a pair batch from the resident dataset."""
    slots = data["pair_slots"][idx]          # (B, 2)
    batch = {
        "images": data["frames"][slots],     # (B, 2, H, W, 3)
        "flows": data["flows"][idx],
        "masks": data["masks"][idx],
        "intrinsics": data["intrinsics"][idx],
        "extrinsics": data["extrinsics"][idx],
        "pair_ids": data["pair_ids"][idx],
    }
    if "scales" in data:
        batch["scales"] = data["scales"][idx]
    return batch


class TrainingEngine:
    """Owns the compiled train/eval/infer steps for one backbone."""

    # static capacity of the per-epoch depth-capture buffer (one slot
    # per display-freq TensorBoard image-grid event)
    CAPTURE_SLOTS = 8

    def __init__(
        self,
        model: DepthModel,
        optimizer: optax.GradientTransformation,
        weights: LossWeights,
        mesh: Optional[Mesh] = None,
        params_init: Any = None,
        precision: str = "f32",
        eval_dedup: Optional[bool] = None,
    ):
        # backbone conv compute dtype (params stay f32, BN statistics
        # and the geometric loss stay f32 either way). Set explicitly in
        # both cases: the policy is process-global and must not leak
        # from a previously constructed engine.
        from ..models import layers
        from ..ops import resample

        layers.set_compute_dtype(
            jnp.bfloat16 if precision == "bf16" else None)
        # matmul-splat loss backward rides the same precision policy
        # (exact scatter in f32/parity mode — see ops/resample.py)
        resample.set_splat_enabled(precision == "bf16")
        self.model = model
        # flatten: the optimizer runs on ONE raveled parameter vector
        # instead of ~350 tree leaves. Runtime-neutral on TPU (measured,
        # tools/opt_bench.py: 0.64 -> 0.42 ms) but it collapses the
        # update tail from ~10^3 tiny per-leaf HLO kernels to a handful
        # of vector ops, which is what keeps XLA:CPU compile time of the
        # train step inside the multi-chip dryrun's window on small
        # hosts (see PERF.md "Compile-time pathology").
        self.optimizer = optax.flatten(optimizer)
        self.weights = weights
        self.mesh = mesh
        # clone of the pretrained params for ParameterLoss (reference:
        # depth_fine_tuning.py:223-224); only materialized when needed
        self.params_init = params_init
        if weights.lambda_parameter > 0 and params_init is None:
            self.params_init = jax.tree_util.tree_map(
                jnp.copy, model.variables["params"])

        # Deduplicated eval: each unique frame's depth is computed ONCE
        # per eval pass instead of once per pair side (the hierarchical2
        # pair set references every frame ~6x), and the per-pair losses
        # join against the resulting depth buffer. The reference's
        # validation loop re-runs the backbone per pair with BN running
        # stats drifting batch-to-batch (torch train()-mode forward,
        # depth_fine_tuning.py:246-257), so the per-pair losses differ
        # from paired eval at BN-batch-composition level — MEASURED at
        # demo scale (tools/dedup_deviation.py, 244 frames/715 pairs,
        # bf16): mean loss rel 7.7e-5 at random init / 1e-6 after 3
        # epochs, per-pair disparity deltas p95 < 0.9%. Not bitwise,
        # hence the same gating as the other approximate TPU paths: on
        # under the bf16 production policy, off (exact paired eval) for
        # f32/parity runs.
        self.eval_dedup = (precision == "bf16") if eval_dedup is None \
            else eval_dedup
        self._train_step = self._compile(self._train_step_impl, donate=True)
        self._eval_step = self._compile(self._eval_step_impl, donate=False)
        self._train_epoch = self._compile(
            self._train_epoch_impl, donate=True, batch_rank=2, n_repl_extra=1)
        if self.eval_dedup:
            self._eval_epoch = self._compile(
                self._eval_epoch_dedup_impl, donate=False, batch_rank=2,
                extra_specs=(P(None, DATA_AXIS, None),))
        else:
            self._eval_epoch = self._compile(
                self._eval_epoch_impl, donate=False, batch_rank=2)
        self._infer = None

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        # copy: train_step donates its input state, and the model's own
        # variable buffers must survive repeated init_state calls.
        # One jitted program: eager per-leaf copies + optax zeros pay a
        # per-op compile/RPC on the tunneled TPU.
        def _build(variables):
            params = jax.tree_util.tree_map(jnp.copy, variables["params"])
            return TrainState(
                params=params,
                batch_stats=jax.tree_util.tree_map(
                    jnp.copy, variables.get("batch_stats", {})),
                opt_state=self.optimizer.init(params),
                step=jnp.zeros((), jnp.int32),
            )

        state = jax.jit(_build)(self.model.variables)
        if self.mesh is not None:
            state = jax.device_put(
                state, NamedSharding(self.mesh, P()))
        return state

    def put_data(self, data: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Transfer the dataset to HBM (replicated across the mesh)."""
        put = (
            functools.partial(
                jax.device_put, device=NamedSharding(self.mesh, P()))
            if self.mesh is not None else jnp.asarray
        )
        return {k: put(v) for k, v in data.items() if v is not None}

    # ------------------------------------------------------------------
    def _compile(self, fn: Callable, donate: bool, batch_rank: int = 1,
                 n_repl_extra: int = 0, extra_specs: Tuple = ()):
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=(0,) if donate else ())
        repl = NamedSharding(self.mesh, P())
        # batch axis sharded over "data"; for epoch-level calls the
        # index arrays are (steps, batch) with the batch axis sharded
        spec = P(*([None] * (batch_rank - 1)), DATA_AXIS)
        batch_s = NamedSharding(self.mesh, spec)
        return jax.jit(
            fn,
            in_shardings=(repl, repl, batch_s, batch_s)
            + (repl,) * n_repl_extra
            + tuple(NamedSharding(self.mesh, s) for s in extra_specs),
            out_shardings=(repl, repl) if donate else repl,
            donate_argnums=(0,) if donate else (),
        )

    def _forward(self, params, batch_stats, images, scales, train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        depth, mutated = self.model.apply(
            variables, images, scales=scales, train=train)
        new_stats = mutated.get("batch_stats", batch_stats) if train else batch_stats
        return depth, new_stats

    def _loss(self, params, batch_stats, batch, valid, train: bool):
        depth, new_stats = self._forward(
            params, batch_stats, batch["images"], batch.get("scales"), train)
        loss, batch_losses = joint_loss(
            depth,
            batch["intrinsics"], batch["extrinsics"],
            batch["flows"], batch["masks"],
            self.weights,
            params=params, params_init=self.params_init,
            valid=valid,
        )
        return loss, (batch_losses, new_stats, depth)

    def _train_step_impl(self, state: TrainState, data, idx, valid):
        new_state, metrics, _ = self._train_core(state, data, idx, valid)
        return new_state, metrics

    def _train_core(self, state: TrainState, data, idx, valid):
        batch = gather_batch(data, idx)
        (loss, (batch_losses, new_stats, depth)), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state.params, state.batch_stats, batch, valid, True)

        updates, new_opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)

        # skip on non-finite loss (reference: depth_fine_tuning.py:278-280)
        # AND on non-finite gradients — a finite loss can still carry
        # 0*inf gradients through the 1/z backward at degenerate depths,
        # which would silently poison the params.
        #
        # Everything here works on ONE raveled vector: a per-leaf
        # isfinite tree-reduce + per-leaf selects is the same math but
        # ~10^3 extra HLO kernels, which alone blew XLA:CPU compile of
        # this program past 8 minutes (PERF.md "Compile-time pathology").
        flat_g, _ = jax.flatten_util.ravel_pytree(grads)
        ok = jnp.isfinite(loss) & jnp.all(jnp.isfinite(flat_g))
        # masked apply: skipped step adds exactly 0 to every param (a
        # select, NOT a multiply — 0 * NaN-update would poison params);
        # the optimizer state reverts via selects on its few flat leaves
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + jnp.where(ok, u, jnp.zeros((), u.dtype)),
            state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=_tree_where(ok, new_opt_state, state.opt_state),
            step=state.step + 1,
        )
        metrics = {"loss": loss, "skipped_nan": ~ok, **batch_losses}
        return new_state, metrics, depth

    def _train_epoch_impl(self, state: TrainState, data, idx, valid,
                          capture_slot):
        """A whole epoch as one lax.scan over steps — removes per-step
        dispatch latency and host round-trips entirely.

        Args:
            idx, valid: (steps, batch)
            capture_slot: (steps,) int32; where >= 0, the step's
                predicted depths are stored into slot ``capture_slot[s]``
                of the returned ``captured_depth`` buffer. This is how
                display-frequency TensorBoard image grids get the
                *training* forward's prediction without paying an extra
                eval forward (reference logs the train prediction too,
                depth_fine_tuning.py:290-293). Capacity is the static
                ``CAPTURE_SLOTS``; slots beyond it are dropped.
        """
        n_cap = self.CAPTURE_SLOTS

        def body(carry, step_inputs):
            state, cap = carry
            step_idx, step_valid, slot = step_inputs
            new_state, metrics, depth = self._train_core(
                state, data, step_idx, step_valid)
            j = jnp.clip(slot, 0, cap.shape[0] - 1)
            hit = (slot >= 0) & (slot < cap.shape[0])
            cap = cap.at[j].set(
                jnp.where(hit, depth.astype(cap.dtype), cap[j]))
            return (new_state, cap), metrics

        B = idx.shape[1]
        H, W = data["frames"].shape[1:3]
        # TB image grids only — f16 halves the fetch under bf16
        from ..models.layers import compute_dtype

        cap_dt = (jnp.float16 if compute_dtype() == jnp.bfloat16
                  else jnp.float32)
        cap0 = jnp.zeros((n_cap, B, 2, H, W), cap_dt)
        (state, cap), metrics = jax.lax.scan(
            body, (state, cap0), (idx, valid, capture_slot))
        metrics["captured_depth"] = cap
        return state, metrics

    def _eval_epoch_impl(self, state: TrainState, data, idx, valid):
        """The eval pass as one lax.scan device program (TPU redesign of
        the reference's per-pair host loop, depth_fine_tuning.py:312-406).

        Per-frame depths are scattered into a single (num_frames, H, W)
        buffer on device with the reference's first-seen-wins semantics,
        so the host fetches each frame's depth exactly once instead of
        once per pair side.
        """
        n_frames, H, W = data["frames"].shape[:3]
        # under the bf16 policy the predictions carry ~4e-3 relative
        # compute noise, so the host-bound depth buffer travels as f16
        # (1e-3 mantissa, half the tunnel bytes); f32 runs keep f32
        from ..models.layers import compute_dtype

        buf_dt = (jnp.float16 if compute_dtype() == jnp.bfloat16
                  else jnp.float32)
        buf0 = jnp.zeros((n_frames, H, W), buf_dt)
        seen0 = jnp.zeros((n_frames,), jnp.bool_)

        def body(carry, step_inputs):
            state, buf, seen = carry
            step_idx, step_valid = step_inputs
            new_state, m = self._eval_step_impl(
                state, data, step_idx, step_valid)
            depth = m.pop("depth")                      # (B, 2, H, W)
            flat = depth.astype(buf_dt).reshape((-1, H, W))
            slots = data["pair_slots"][step_idx].reshape(-1)
            ok = jnp.repeat(step_valid > 0, 2)

            def write(i, bs):
                b, s = bs
                t = slots[i]
                take = ok[i] & ~s[t]
                b = b.at[t].set(jnp.where(take, flat[i], b[t]))
                s = s.at[t].set(s[t] | ok[i])
                return b, s

            buf, seen = jax.lax.fori_loop(
                0, flat.shape[0], write, (buf, seen))
            return (new_state, buf, seen), m

        (state, buf, seen), metrics = jax.lax.scan(
            body, (state, buf0, seen0), (idx, valid))
        metrics["depth_frames"] = buf
        metrics["frames_seen"] = seen
        return state, metrics

    def _eval_epoch_dedup_impl(self, state: TrainState, data, idx, valid,
                               frame_idx):
        """Deduplicated eval pass: forward each unique frame ONCE, then
        join every pair's loss against the resulting depth buffer.

        The reference validation loop (depth_fine_tuning.py:312-341)
        forwards both frames of every pair, so a frame in k pairs is
        forwarded k times per pass (~6x for hierarchical2); the depths
        only differ through BN running-stat drift between batches. This
        pass restructures that as:

        phase 1: scan over ``frame_idx`` chunks — train-mode forward
            (BN stats thread through, as in paired eval), depths written
            into an (n_frames+1, H, W) f32 buffer (row n_frames is the
            dump slot for chunk padding);
        phase 2: scan over the pair batches — depths gathered from the
            buffer, geometric loss only (the 5 ms chain), no forward.

        At demo scale this cuts eval forwards 179 batches -> 31.

        Contract deviations vs the paired eval (both harmless for
        consumers that gate on ``frames_seen``, as ``process_eval``
        does): (a) ``depth_frames`` rows for frames referenced by no
        valid pair carry real depths here (paired eval leaves them
        zero, first-seen-wins); (b) BN running stats are updated from
        every resident frame — including frames in no pair and the
        clamped padding duplicates — not only pair frames.

        Args:
            idx, valid: (steps, batch) pair batches, as in
                ``_eval_epoch_impl``
            frame_idx: (fsteps, batch, 2) int32 frame slots; padding
                entries point at slot ``n_frames`` (the dump row)
        """
        n_frames, H, W = data["frames"].shape[:3]
        from ..models.layers import compute_dtype

        out_dt = (jnp.float16 if compute_dtype() == jnp.bfloat16
                  else jnp.float32)

        # per-frame scales recovered from the per-pair (P, 2) array —
        # scales are a per-frame quantity (scales.csv), the pair array
        # just gathers them, so the scatter is consistent by
        # construction; frames in no pair keep 1.0
        frame_scales = None
        if "scales" in data:
            frame_scales = jnp.ones((n_frames + 1,), jnp.float32)
            frame_scales = frame_scales.at[
                data["pair_slots"].reshape(-1)
            ].set(data["scales"].reshape(-1).astype(jnp.float32))

        buf0 = jnp.zeros((n_frames + 1, H, W), jnp.float32)

        def fwd_body(carry, slots):
            st, buf = carry
            # padding slots point at the dump row n_frames, one past the
            # frames array — clamp the image gather explicitly (the raw
            # slots still route the scatter to the dump row below)
            images = data["frames"][
                jnp.minimum(slots, n_frames - 1)]         # (B, 2, H, W, 3)
            scales = (frame_scales[slots]
                      if frame_scales is not None else None)
            depth, new_stats = self._forward(
                st.params, st.batch_stats, images, scales, train=True)
            flat = depth.astype(jnp.float32).reshape((-1, H, W))
            buf = buf.at[slots.reshape(-1)].set(flat)
            return (st._replace(batch_stats=new_stats), buf), None

        (state, buf), _ = jax.lax.scan(fwd_body, (state, buf0), frame_idx)

        def loss_body(carry, step_inputs):
            step_idx, step_valid = step_inputs
            depth = buf[data["pair_slots"][step_idx]]     # (B, 2, H, W)
            loss, batch_losses = joint_loss(
                depth,
                data["intrinsics"][step_idx], data["extrinsics"][step_idx],
                data["flows"][step_idx], data["masks"][step_idx],
                self.weights,
                params=carry.params, params_init=self.params_init,
                valid=step_valid,
            )
            return carry, {
                "loss": loss, "pair_ids": data["pair_ids"][step_idx],
                **batch_losses,
            }

        state, metrics = jax.lax.scan(loss_body, state, (idx, valid))

        # frames_seen: frames referenced by any VALID pair (matches the
        # paired eval's artifact contract — padding rows never surface)
        slots = data["pair_slots"][idx].reshape(-1)       # (steps*B*2,)
        ok = jnp.repeat((valid > 0).reshape(-1), 2)
        seen = jnp.zeros((n_frames + 1,), jnp.bool_).at[
            jnp.where(ok, slots, n_frames)
        ].set(True)[:n_frames]
        metrics["depth_frames"] = buf[:n_frames].astype(out_dt)
        metrics["frames_seen"] = seen
        return state, metrics

    def _eval_step_impl(self, state: TrainState, data, idx, valid):
        """Validation pass: train-mode BN with running-stat updates but
        no gradient step (matches torch no_grad in train() mode —
        reference depth_fine_tuning.py:246-257, 312-341)."""
        batch = gather_batch(data, idx)
        loss, (batch_losses, new_stats, depth) = self._loss(
            state.params, state.batch_stats, batch, valid, True)
        new_state = state._replace(batch_stats=new_stats)
        return new_state, {
            "loss": loss, "depth": depth, "pair_ids": batch["pair_ids"],
            **batch_losses,
        }

    # ------------------------------------------------------------------
    def train_step(self, state, data, idx, valid):
        return self._train_step(state, data, jnp.asarray(idx), jnp.asarray(valid))

    def train_epoch(self, state, data, idx, valid, capture_slot=None):
        """Run all steps of an epoch in one device program.

        Args:
            idx, valid: (steps, batch) arrays
            capture_slot: optional (steps,) int32, -1 = no capture (see
                ``_train_epoch_impl``)
        Returns:
            (state, metrics stacked over steps; ``captured_depth`` holds
            the requested steps' training predictions)
        """
        idx = jnp.asarray(idx)
        if capture_slot is None:
            capture_slot = jnp.full((idx.shape[0],), -1, jnp.int32)
        return self._train_epoch(
            state, data, idx, jnp.asarray(valid),
            jnp.asarray(capture_slot, jnp.int32))

    def eval_step(self, state, data, idx, valid):
        return self._eval_step(state, data, jnp.asarray(idx), jnp.asarray(valid))

    def eval_epoch(self, state, data, idx, valid):
        """Run the whole eval pass in one device program.

        Args:
            idx, valid: (steps, batch) arrays
        Returns:
            (state, metrics) where metrics carries per-step losses plus
            ``depth_frames`` (num_frames, H, W) / ``frames_seen``.
        """
        if not self.eval_dedup:
            return self._eval_epoch(
                state, data, jnp.asarray(idx), jnp.asarray(valid))
        # frame-forward chunks for the dedup pass: every resident frame
        # once, shaped like the pair batches (B, 2) so the backbone
        # program matches the train step's conv shapes; padding points
        # at the dump row n_frames
        n_frames = data["frames"].shape[0]
        idx = jnp.asarray(idx)
        per = 2 * idx.shape[1]
        fsteps = max(1, -(-n_frames // per))
        fslots = np.full((fsteps * per,), n_frames, np.int32)
        fslots[:n_frames] = np.arange(n_frames, dtype=np.int32)
        frame_idx = fslots.reshape(fsteps, idx.shape[1], 2)
        return self._eval_epoch(
            state, data, idx, jnp.asarray(valid), jnp.asarray(frame_idx))

    def infer(self, state: TrainState, images: jnp.ndarray,
              scales: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Eval-mode inference (save_depth path; BN uses running stats
        — reference depth_fine_tuning.py:182-196)."""
        if self._infer is None:
            def _infer_impl(params, batch_stats, images, scales):
                depth, _ = self._forward(
                    params, batch_stats, images, scales, train=False)
                return depth
            self._infer = jax.jit(_infer_impl)
        return self._infer(state.params, state.batch_stats, images, scales)

    def variables_of(self, state: TrainState) -> Dict[str, Any]:
        out = {"params": state.params}
        if state.batch_stats:
            out["batch_stats"] = state.batch_stats
        return out
