"""CLI flag surface (reference: params.py) — identical flags, presets,
and model-default resolution."""

from __future__ import annotations

import argparse

from ..models.registry import get_depth_model, get_depth_model_list
from ..pipeline.colmap_processor import COLMAPParams
from ..pipeline.make_video import MakeVideoParams
from ..pipeline.scale_calibration import ScaleCalibrationParams
from ..training.fine_tuning import DepthFineTuningParams
from ..utils import frame_range, frame_sampling


class Video3dParamsParser:
    def __init__(self):
        self.parser = argparse.ArgumentParser()
        self.initialized = False

    def initialize(self):
        self.parser.add_argument(
            "--op", choices=["all", "extract_frames"], default="all")
        self.parser.add_argument(
            "--path", type=str,
            help="Directory where all inputs (except the video) and "
                 "outputs are stored.")
        self.parser.add_argument(
            "--video_file", type=str,
            help="Path to the input video. Ignored if color_full and "
                 "frames.txt already exist.")
        self.parser.add_argument(
            "--configure", choices=["default", "kitti"], default="default")

        self.add_video_args()
        self.add_flow_args()
        self.add_calibration_args()
        self.add_fine_tuning_args()
        self.add_make_video_args()
        self.initialized = True

    def add_video_args(self):
        self.parser.add_argument(
            "--size", type=int, default=384,
            help="Long dimension of the output depth maps.")
        self.parser.add_argument(
            "--align", type=int, default=0,
            help="Alignment multiple of the depth size; <=0 resolves to "
                 "the model requirement.")

    def add_flow_args(self):
        self.parser.add_argument(
            "--flow_ops", nargs="*",
            choices=frame_sampling.SamplePairsMode.names(),
            default=["hierarchical2"],
            help="Frame-pair sampling mode(s) for optical flow.")
        self.parser.add_argument(
            "--flow_checkpoint", choices=["FlowNet2", "FlowNet2-KITTI"],
            default="FlowNet2")
        self.parser.add_argument("--overlap_ratio", type=float, default=0.2)

    def add_calibration_args(self):
        COLMAPParams.add_arguments(self.parser)
        ScaleCalibrationParams.add_arguments(self.parser)

    def add_fine_tuning_args(self):
        DepthFineTuningParams.add_arguments(self.parser)
        self.parser.add_argument(
            "--model_type", type=str, choices=get_depth_model_list(),
            default="mc")
        self.parser.add_argument(
            "--frame_range", default="",
            type=frame_range.parse_frame_range,
            help="Range of depth frames to fine-tune, e.g. 0,2-10,21-40.")

    def add_make_video_args(self):
        self.parser.add_argument("--make_video", action="store_true")
        MakeVideoParams.add_arguments(self.parser)

    def print(self):
        print("------------ Parameters -------------")
        for k, v in sorted(vars(self.params).items()):
            if isinstance(v, frame_range.NamedOptionalSet):
                print(f"{k}: '{v.name}'")
            else:
                print(f"{k}: {v}")
        print("-------------------------------------")

    def parse(self, args=None, namespace=None):
        if not self.initialized:
            self.initialize()
        self.params = self.parser.parse_args(args, namespace=namespace)

        if self.params.configure == "kitti":
            self.params.flow_checkpoint = "FlowNet2-KITTI"
            self.params.model_type = "monodepth2"
            self.params.overlap_ratio = 0.5
            if "matcher" in self.params:
                self.params.matcher = "sequential"

        model = get_depth_model(self.params.model_type)
        if self.params.align <= 0:
            self.params.align = model.align
        if self.params.learning_rate <= 0:
            self.params.learning_rate = model.learning_rate
        if self.params.lambda_view_baseline < 0:
            self.params.lambda_view_baseline = model.lambda_view_baseline

        self.print()
        return self.params
