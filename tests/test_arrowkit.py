"""list_column_to_matrix: zero-copy fast path + fallbacks."""

import numpy as np
import pyarrow as pa

from hepcrawl_ray.ops.knn import list_column_to_matrix


def test_uniform_lists_zero_copy_path():
    col = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                   type=pa.list_(pa.float32()))
    m = list_column_to_matrix(col)
    assert m.shape == (3, 2) and m.dtype == np.float64
    assert m[2, 1] == 6.0


def test_sliced_array_respects_offsets():
    col = pa.array([[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]],
                   type=pa.list_(pa.float64()))
    m = list_column_to_matrix(col.slice(1, 2))
    assert m.tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_null_element_takes_fallback():
    col = pa.array([[1.0, None], [3.0, 4.0]], type=pa.list_(pa.float64()))
    m = list_column_to_matrix(col)  # must not raise ArrowInvalid
    assert m.shape == (2, 2)
    assert np.isnan(m[0, 1]) and m[1, 1] == 4.0


def test_ragged_lists_raise():
    import pytest

    col = pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError):  # no rectangular matrix exists
        list_column_to_matrix(col)


def test_chunked_input():
    ch = pa.chunked_array([pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
                           pa.array([[3.0, 4.0]], pa.list_(pa.float64()))])
    m = list_column_to_matrix(ch)
    assert m.tolist() == [[1.0, 2.0], [3.0, 4.0]]
