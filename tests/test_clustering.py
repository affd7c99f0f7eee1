"""Curve math + sort-compaction clustering tests.

The numpy-level tests pin the space-filling-curve properties that the
file-skipping benefit rests on; the Spark-level tests live with the
lake tests (tests/test_paimon_import.py::test_sort_compact_lake)."""

import itertools

import numpy as np
import pytest

from paimon_python_spark.operators.clustering import (
    hilbert_indices,
    zorder_indices,
)


def test_zorder_known_values():
    # classic 2-D Morton: (x=0b11, y=0b01) with x most significant
    # within each bit pair -> bits x1 y1 x0 y0 = 1 0 1 1
    coords = np.array([[0b11, 0b01]], dtype=np.uint64)
    assert zorder_indices(coords, 2)[0] == 0b1011
    # monotone per column: growing x with y fixed grows z
    xs = np.array([[x, 2] for x in range(4)], dtype=np.uint64)
    z = zorder_indices(xs, 2)
    assert (np.diff(z.astype(np.int64)) > 0).all()


@pytest.mark.parametrize("d,bits", [(2, 4), (3, 3), (4, 2)])
def test_zorder_bijection(d, bits):
    grid = np.array(list(itertools.product(range(1 << bits), repeat=d)), dtype=np.uint64)
    z = zorder_indices(grid, bits)
    assert len(set(z.tolist())) == len(grid)
    assert z.max() == (1 << (d * bits)) - 1


@pytest.mark.parametrize("d,bits", [(2, 4), (2, 5), (3, 3), (4, 2)])
def test_hilbert_bijection_and_adjacency(d, bits):
    """THE Hilbert property: sorted by index, consecutive grid points
    are Manhattan-distance-1 neighbors. A z-order curve fails this
    (its diagonal jumps), so this also distinguishes the two."""
    grid = np.array(list(itertools.product(range(1 << bits), repeat=d)), dtype=np.uint64)
    h = hilbert_indices(grid, bits)
    assert len(set(h.tolist())) == len(grid), "not a bijection"
    assert h.max() == (1 << (d * bits)) - 1
    order = np.argsort(h)
    walk = grid[order].astype(np.int64)
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert (steps == 1).all(), "curve jumps between non-neighbors"


def test_hilbert_1d_identity():
    x = np.arange(16, dtype=np.uint64).reshape(-1, 1)
    assert (hilbert_indices(x, 4) == x[:, 0]).all()


def test_zorder_is_not_hilbert():
    """Z-order genuinely jumps between non-neighbors (the diagonal
    seams) — the adjacency test above is what tells the curves apart,
    so pin that it WOULD fail for z-order."""
    bits = 3
    grid = np.array(list(itertools.product(range(1 << bits), repeat=2)), dtype=np.uint64)
    z = zorder_indices(grid, bits)
    order = np.argsort(z)
    walk = grid[order].astype(np.int64)
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert (steps > 1).any()
