from .search import (
    BeamSearch,
    DiverseBeamSearch,
    DiverseSiblingsSearch,
    LengthConstrainedBeamSearch,
    PrefixConstrainedBeamSearch,
    Sampling,
)
from .sequence_generator import SequenceGenerator

__all__ = [
    "BeamSearch",
    "Sampling",
    "DiverseBeamSearch",
    "DiverseSiblingsSearch",
    "LengthConstrainedBeamSearch",
    "PrefixConstrainedBeamSearch",
    "SequenceGenerator",
]
from .trie import ConstraintTrie, PackedTrie, trie_advance, trie_token_mask
from .lexical import PackedConstraints, pack_constraints
