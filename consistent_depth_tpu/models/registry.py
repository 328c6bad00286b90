"""Backbone registry (reference: monodepth/depth_model_registry.py)."""

from __future__ import annotations

from typing import List, Type

from .base import DepthModel


def get_depth_model_list() -> List[str]:
    return ["mc", "midas2", "monodepth2"]


def get_depth_model(type: str) -> Type[DepthModel]:  # noqa: A002
    if type == "mc":
        from .mannequin_challenge import MannequinChallengeModel
        return MannequinChallengeModel
    elif type == "midas2":
        from .midas_v2 import MidasV2Model
        return MidasV2Model
    elif type == "monodepth2":
        from .monodepth2 import Monodepth2Model
        return Monodepth2Model
    raise ValueError(f"Unsupported model type '{type}'.")


def create_depth_model(type: str, **kwargs) -> DepthModel:  # noqa: A002
    return get_depth_model(type)(**kwargs)
