import numpy as np

from .file_utils import (
    atomic_write_bytes,
    atomic_write_json,
    atomic_write_npz,
    ensure_dir,
    read_json,
    read_npz,
)


def round_up(x: int, step: int) -> int:
    if step <= 0:
        return x
    return ((x + step - 1) // step) * step


def bucket_pad(n: int, steps) -> int:
    """Smallest bucket >= n from ``steps``; multiples of the last step after.

    Bucketed padding keeps device-call shapes from a small static set so XLA
    recompiles are bounded (SURVEY.md §7 "dynamic shapes")."""
    for s in steps:
        if n <= s:
            return s
    last = steps[-1]
    return round_up(n, last)


def flatten_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of [s, s+len) ranges.

    flatten_ranges([2, 10], [3, 2]) -> [2, 3, 4, 10, 11]
    """
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    shifts = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    return shifts + np.arange(total, dtype=np.int64)


__all__ = [
    "atomic_write_bytes",
    "atomic_write_json",
    "atomic_write_npz",
    "ensure_dir",
    "read_json",
    "read_npz",
    "round_up",
    "bucket_pad",
    "flatten_ranges",
]
