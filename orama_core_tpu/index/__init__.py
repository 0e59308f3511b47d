from .term_dict import TermDict
from .string_index import (
    CommittedStringIndex,
    GlobalInfo,
    ResolvedQuery,
    UncommittedStringIndex,
)
from .number_index import CommittedNumberIndex, UncommittedNumberIndex
from .bool_index import CommittedBoolIndex, UncommittedBoolIndex
from .vector_index import CommittedVectorIndex, UncommittedVectorIndex

__all__ = [
    "TermDict",
    "CommittedStringIndex",
    "GlobalInfo",
    "ResolvedQuery",
    "UncommittedStringIndex",
    "CommittedNumberIndex",
    "UncommittedNumberIndex",
    "CommittedBoolIndex",
    "UncommittedBoolIndex",
    "CommittedVectorIndex",
    "UncommittedVectorIndex",
]
