"""Dihedral isometry semantics (parity with /root/reference/image/transform.h)."""
import numpy as np
import pytest

from fractencode_tpu.core.transform import (
    NUM_TRANSFORMS,
    TransformType,
    all_permutation_tables,
    map_xy,
    mapped_size,
    permutation_table,
)

# The reference's 8x8 coefficient table (transform.h:32-41):
# x' = a*x + b*y + c*(w-1) + d*(h-1); y' = e*x + f*y + g*(w-1) + h_*(h-1)
_REF_COEFFS = [
    (1, 0, 0, 0, 0, 1, 0, 0),
    (0, 1, 0, 0, -1, 0, 1, 0),
    (-1, 0, 1, 0, 0, -1, 0, 1),
    (0, -1, 0, 1, 1, 0, 0, 0),
    (1, 0, 0, 0, 0, -1, 0, 1),
    (0, 1, 0, 0, 1, 0, 0, 0),
    (-1, 0, 1, 0, 0, 1, 0, 0),
    (0, -1, 0, 1, -1, 0, 1, 0),
]


@pytest.mark.parametrize("t", list(TransformType))
def test_map_matches_reference_coefficients(t):
    for w, h in [(4, 4), (8, 8), (16, 16), (5, 5)]:
        a, b, c, d, e, f, g, h_ = _REF_COEFFS[int(t)]
        for x in range(w):
            for y in range(h):
                ex = a * x + b * y + c * (w - 1) + d * (h - 1)
                ey = e * x + f * y + g * (w - 1) + h_ * (h - 1)
                assert map_xy(t, x, y, w, h) == (ex, ey), (t, x, y)


@pytest.mark.parametrize("t", list(TransformType))
def test_permutation_is_bijective(t):
    for n in (2, 4, 8, 16):
        p = permutation_table(n, t)
        assert sorted(p.tolist()) == list(range(n * n))


def test_permutation_semantics():
    n = 4
    block = np.arange(n * n, dtype=np.int32).reshape(n, n)
    for t in TransformType:
        bt = block.reshape(-1)[permutation_table(n, t)].reshape(n, n)
        for y in range(n):
            for x in range(n):
                mx, my = map_xy(t, x, y, n, n)
                assert bt[y, x] == block[my, mx]


def test_rotation_composition():
    n = 8
    block = np.arange(n * n).reshape(n, n)
    apply = lambda b, t: b.reshape(-1)[permutation_table(n, t)].reshape(n, n)
    r90 = apply(block, TransformType.ROT90)
    r180_via = apply(r90, TransformType.ROT90)
    assert np.array_equal(r180_via, apply(block, TransformType.ROT180))


def test_mapped_size():
    assert mapped_size(TransformType.ROT90, 4, 8) == (8, 4)
    assert mapped_size(TransformType.ID, 4, 8) == (4, 8)
    assert mapped_size(TransformType.FLIP, 4, 8) == (4, 8)
    assert mapped_size(TransformType.FLIP_ROT270, 4, 8) == (8, 4)


def test_all_tables_shape():
    assert all_permutation_tables(4).shape == (NUM_TRANSFORMS, 16)
