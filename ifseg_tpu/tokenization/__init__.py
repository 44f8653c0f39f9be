from .gpt2_bpe import GPT2BPE
from .dictionary import Dictionary, build_seg_dictionary

__all__ = ["GPT2BPE", "Dictionary", "build_seg_dictionary"]
