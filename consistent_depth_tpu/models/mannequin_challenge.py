"""MannequinChallenge backbone adapter (reference:
monodepth/mannequin_challenge_model.py). Default backbone ("mc")."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .base import DepthModel, FlaxVars
from .hourglass import HourglassModel


class MannequinChallengeModel(DepthModel):
    align = 16
    learning_rate = 0.0004
    lambda_view_baseline = 0.1

    default_checkpoint = "checkpoints/mc.pth"
    checkpoint_url_key = "mc"

    def __init__(self, variables=None, checkpoint=None, seed: int = 0):
        if checkpoint is None:
            checkpoint = self._default_checkpoint_path()
        super().__init__(variables=variables, checkpoint=checkpoint, seed=seed)

    def _make_module(self):
        return HourglassModel()

    def _init_variables(self, seed: int) -> FlaxVars:
        # one jitted program: eager init pays a per-op compile+RPC on
        # the tunneled TPU (~minutes for hundreds of tiny param ops)
        return jax.jit(lambda rng: self.module.init(
            rng, jnp.zeros((1, 16, 16, 3)), train=False))(
                jax.random.PRNGKey(seed))

    def estimate_depth_pure(
        self, variables: FlaxVars, images: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, FlaxVars]:
        B, N, H, W, C = images.shape
        x = images.reshape(B * N, H, W, C)
        if train:
            (pred, _conf), mutated = self.module.apply(
                variables, x, train=True, mutable=["batch_stats"])
        else:
            pred, _conf = self.module.apply(variables, x, train=False)
            mutated = {}
        # netG predicts log-depth; exp -> depth
        # (reference: mannequin_challenge_model.py:60-67)
        depth = jnp.exp(pred[..., 0]).reshape(B, N, H, W)
        return depth, mutated
