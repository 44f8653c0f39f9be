from .dummy_seg import dummy_seg_batch, DummySegTask

__all__ = ["dummy_seg_batch", "DummySegTask"]
