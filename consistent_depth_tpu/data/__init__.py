from .video_dataset import VideoPairDataset, VideoFrameDataset, PairBatchIterator  # noqa: F401
