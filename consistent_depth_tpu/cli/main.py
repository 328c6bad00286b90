"""CLI entry (reference: main.py).

    python -m consistent_depth_tpu.cli.main --video_file v.mp4 --path d ...
"""

from ..utils.jit_cache import enable_persistent_jit_cache


def main(args=None):
    enable_persistent_jit_cache()

    from ..pipeline.process import DatasetProcessor
    from .params import Video3dParamsParser

    params = Video3dParamsParser().parse(args)
    return DatasetProcessor().process(params)


if __name__ == "__main__":
    main()
