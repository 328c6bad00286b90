from .registry import get_depth_model, get_depth_model_list, create_depth_model  # noqa: F401
