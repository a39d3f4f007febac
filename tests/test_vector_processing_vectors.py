"""mapping/mapping_vectors_test.go conformance: TestProcessVector
(1019-1104), TestNormalizeVector (1105-1129), TestNormalizeMultiVectors
(1130-1245 core cases)."""

import numpy as np
import pytest

from bleve_ray.index.vectors import (
    normalize_multi_vector,
    normalize_vector,
    process_vector,
)


class Obj:  # stand-in for Go's struct{}{}
    pass


PROCESS_CASES = [
    # (value, dims, valid, expected)
    # flat numeric
    ([1, 2.2, 3], 3, True, [1, np.float32(2.2), 3]),
    ([1, 2.2, 3], 2, False, None),
    ([1, 2.2, 3], 4, False, None),
    # flat imposters
    ([1, 2, "three"], 3, False, None),
    ([1, None, 3], 3, False, None),
    ([None, 1], 2, False, None),
    ([1, 2, Obj()], 3, False, None),
    ([True, False, True], 3, False, None),  # bools are not numeric
    # non-sequence
    (None, 1, False, None),
    (Obj(), 1, False, None),
    (1, 1, False, None),
    ([], 1, False, None),  # empty slice (processVector len==0 check)
    # nested numeric
    ([[1, 2, 3], [4, 5, 6]], 3, True, [1, 2, 3, 4, 5, 6]),
    ([[1, 2, 3]], 3, True, [1, 2, 3]),
    ([[1, 2, 3]], 4, False, None),
    ([[1, 2, 3]], 2, False, None),
    # nested imposters
    ([[1, 2, 3], [4, 5]], 3, False, None),
    ([[1, 2, 3], [4, 5, 6, 7]], 3, False, None),
    ([[1, 2, "three"], [4, 5, 6]], 3, False, None),
    ([[1, 2, None], [4, 5, 6]], 3, False, None),
    ([[1, 2, 3], None], 3, False, None),
    ([None, [1, 2, 3]], 3, False, None),
    ([[1, 2, 3], Obj()], 3, False, None),
    ([[1, 2, 3], 4], 3, False, None),
]


@pytest.mark.parametrize("value,dims,valid,want", PROCESS_CASES,
                         ids=[f"{i}" for i in range(len(PROCESS_CASES))])
def test_process_vector(value, dims, valid, want):
    got, ok = process_vector(value, dims)
    assert ok == valid
    if valid:
        assert got == pytest.approx([float(np.float32(x)) for x in want])


NORM_CASES = [
    ([1, 2, 3, 4, 5],
     [0.13483998, 0.26967996, 0.40451995, 0.5393599, 0.67419994]),
    ([1, 0, 0, 0, 0], [1, 0, 0, 0, 0]),
    ([0.182574183, 0.365148365, 0.547722578, 0.730296731],
     [0.18257418, 0.36514837, 0.5477226, 0.73029673]),
    ([1] * 8, [0.35355338] * 8),
    ([0], [0]),  # zero norm passes through
]


@pytest.mark.parametrize("vec,want", NORM_CASES)
def test_normalize_vector(vec, want):
    got = normalize_vector(np.asarray(vec, dtype=np.float32))
    np.testing.assert_allclose(got, np.asarray(want, dtype=np.float32),
                               rtol=1e-6)


MULTI_CASES = [
    ([1, 0, 0], 3, [1, 0, 0]),
    ([3, 0, 0], 3, [1, 0, 0]),
    ([3, 0, 0, 0, 4, 0], 3, [1, 0, 0, 0, 1, 0]),
    ([3, 0, 0, 0, 4, 0, 0, 0, 5], 3, [1, 0, 0, 0, 1, 0, 0, 0, 1]),
    # length not a multiple of dims -> unchanged
    ([3, 0, 0, 4], 3, [3, 0, 0, 4]),
    ([], 3, []),
    ([3, 4], 0, [3, 4]),
]


@pytest.mark.parametrize("vec,dims,want", MULTI_CASES)
def test_normalize_multi_vector(vec, dims, want):
    got = normalize_multi_vector(np.asarray(vec, dtype=np.float32), dims)
    np.testing.assert_allclose(got, np.asarray(want, dtype=np.float32),
                               rtol=1e-6)


def test_normalize_does_not_mutate_input():
    v = np.asarray([3.0, 4.0], dtype=np.float32)
    normalize_vector(v)
    normalize_multi_vector(v, 2)
    np.testing.assert_array_equal(v, [3, 4])
