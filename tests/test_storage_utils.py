import numpy as np

from orama_core_tpu.engine.document_storage import DocumentStorage
from orama_core_tpu.utils import bucket_pad, flatten_ranges, round_up


def test_document_storage_commit_and_segments(tmp_path):
    ds = DocumentStorage(str(tmp_path))
    for i in range(5):
        ds.add_document(i, {"id": str(i), "n": i})
    assert ds.uncommitted_count() == 5
    ds.commit()
    assert ds.uncommitted_count() == 0
    assert ds.count_committed() == 5
    assert ds.get(3)["n"] == 3

    # second generation appends a new segment
    ds.add_document(5, {"id": "5", "n": 5})
    ds.commit()
    assert ds.count_committed() == 6

    # reload from disk
    ds2 = DocumentStorage(str(tmp_path))
    assert ds2.get(0)["n"] == 0
    assert ds2.get(5)["n"] == 5
    assert ds2.get(99) is None


def test_document_storage_delete_before_and_after_commit(tmp_path):
    ds = DocumentStorage(str(tmp_path))
    ds.add_document(0, {"id": "0"})
    ds.add_document(1, {"id": "1"})
    ds.delete_documents([0])          # uncommitted delete
    assert ds.get(0) is None
    ds.commit()
    ds.delete_documents([1])          # committed delete
    assert ds.get(1) is None
    ds.commit()
    ds2 = DocumentStorage(str(tmp_path))
    assert ds2.get(0) is None and ds2.get(1) is None


def test_document_storage_upsert_latest_wins(tmp_path):
    ds = DocumentStorage(str(tmp_path))
    ds.add_document(0, {"v": 1})
    ds.commit()
    ds.add_document(0, {"v": 2})
    assert ds.get(0)["v"] == 2
    ds.commit()
    assert DocumentStorage(str(tmp_path)).get(0)["v"] == 2


def test_bucket_pad_ladder():
    steps = (1024, 16384)
    assert bucket_pad(1, steps) == 1024
    assert bucket_pad(1024, steps) == 1024
    assert bucket_pad(1025, steps) == 16384
    assert bucket_pad(20000, steps) == 32768  # multiples of last step after
    assert round_up(7, 4) == 8


def test_flatten_ranges():
    out = flatten_ranges(np.asarray([2, 10]), np.asarray([3, 2]))
    assert out.tolist() == [2, 3, 4, 10, 11]
    assert flatten_ranges(np.asarray([]), np.asarray([])).tolist() == []
    assert flatten_ranges(np.asarray([5]), np.asarray([0])).tolist() == []
