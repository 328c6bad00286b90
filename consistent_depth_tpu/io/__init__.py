from . import image_io, colmap_io, metadata_io  # noqa: F401
