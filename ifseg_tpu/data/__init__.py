from .file_dataset import FileDataset
from .segmentation_dataset import SegmentationDataset
from .iterators import EpochBatchIterator

__all__ = ["FileDataset", "SegmentationDataset", "EpochBatchIterator"]
