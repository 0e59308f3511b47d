from .term_dict import TermDict
from .string_index import (
    CommittedStringIndex,
    GlobalInfo,
    UncommittedStringIndex,
)
from .number_index import CommittedNumberIndex, UncommittedNumberIndex
from .keyword_index import CommittedKeywordIndex, UncommittedKeywordIndex
from .bool_index import CommittedBoolIndex, UncommittedBoolIndex
from .vector_index import CommittedVectorIndex, UncommittedVectorIndex

__all__ = [
    "TermDict",
    "CommittedStringIndex",
    "GlobalInfo",
    "UncommittedStringIndex",
    "CommittedNumberIndex",
    "UncommittedNumberIndex",
    "CommittedKeywordIndex",
    "UncommittedKeywordIndex",
    "CommittedBoolIndex",
    "UncommittedBoolIndex",
    "CommittedVectorIndex",
    "UncommittedVectorIndex",
]
