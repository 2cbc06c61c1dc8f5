"""Brightness-block classifier parity.

The Lenna-coordinate goldens are transcribed from the reference test fixture
(/root/reference/tests/ClassifierTest.cpp:24-41); they pin the full pipeline
(YUV conversion -> quadrant sums -> 24-condition class logic).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fractencode_tpu.core.classify import classify_from_quadrants
from fractencode_tpu.core.grid import Grid
from fractencode_tpu.core.stats import quadrant_sums


def scalar_reference_category(a1, a2, a3, a4):
    """Direct transcription of BrightnessBlocksClassifier2::getCategory
    (Classifier2.cpp:8-53), used as oracle for fuzzing."""
    g = lambda u, v: u > v
    conds = [
        (0, g(a1, a2) and g(a2, a3) and g(a3, a4)),
        (0, g(a3, a1) and g(a1, a4) and g(a4, a2)),
        (0, g(a4, a3) and g(a3, a2) and g(a2, a1)),
        (0, g(a2, a4) and g(a4, a1) and g(a1, a3)),
        (1, g(a1, a3) and g(a3, a2) and g(a2, a4)),
        (1, g(a2, a1) and g(a1, a4) and g(a4, a3)),
        (1, g(a4, a2) and g(a2, a3) and g(a3, a1)),
        (1, g(a3, a4) and g(a4, a1) and g(a1, a2)),
        (2, g(a1, a4) and g(a4, a3) and g(a3, a2)),
        (2, g(a4, a1) and g(a1, a2) and g(a2, a3)),
        (2, g(a3, a2) and g(a2, a4) and g(a4, a1)),
        (2, g(a2, a3) and g(a3, a1) and g(a1, a4)),
        (3, g(a1, a2) and g(a2, a4) and g(a4, a3)),
        (3, g(a3, a1) and g(a1, a2) and g(a2, a4)),
        (3, g(a4, a3) and g(a3, a1) and g(a1, a2)),
        (3, g(a2, a4) and g(a4, a3) and g(a3, a1)),
        (4, g(a2, a1) and g(a1, a3) and g(a3, a4)),
        (4, g(a1, a3) and g(a3, a4) and g(a4, a2)),
        (4, g(a3, a4) and g(a4, a2) and g(a2, a1)),
        (4, g(a4, a2) and g(a2, a1) and g(a1, a3)),
        (5, g(a1, a4) and g(a4, a2) and g(a2, a3)),
        (5, g(a4, a1) and g(a1, a3) and g(a3, a4)),
        (5, g(a2, a3) and g(a3, a4) and g(a4, a1)),
        (5, g(a3, a2) and g(a2, a1) and g(a1, a4)),
    ]
    for cls, hit in conds:
        if hit:
            return cls
    return -1


def test_fuzz_against_scalar_oracle(rng):
    quads = rng.integers(0, 100, size=(2000, 4)).astype(np.int32)
    got = np.asarray(classify_from_quadrants(quads))
    for i in range(quads.shape[0]):
        assert got[i] == scalar_reference_category(*quads[i].tolist()), quads[i]


def test_all_permutations_covered():
    """23 of the 24 strict orders map to a class; the order a4>a1>a3>a2 hits
    the reference's unreachable cyclic condition and yields -1."""
    import itertools

    unresolved = []
    for perm in itertools.permutations([40, 30, 20, 10]):
        cls = scalar_reference_category(*perm)
        got = int(np.asarray(classify_from_quadrants(np.array([perm], dtype=np.int32)))[0])
        assert got == cls
        if cls == -1:
            unresolved.append(perm)
    assert unresolved == [(30, 10, 20, 40)]  # a4>a1>a3>a2


def test_ties_give_minus_one():
    quads = np.array([[5, 5, 5, 5], [1, 1, 2, 3], [9, 9, 1, 1]], dtype=np.int32)
    got = np.asarray(classify_from_quadrants(quads))
    assert got.tolist() == [-1, -1, -1]


# (block_size, x, y, expected_class) from ClassifierTest.cpp:24-41
LENNA_GOLDENS = [
    (2, 204, 78, 0), (2, 242, 242, 1), (2, 6, 6, 2), (2, 82, 226, 3),
    (2, 418, 486, 4), (2, 384, 250, 5), (2, 136, 40, -1),
    (4, 416, 336, 5), (4, 440, 336, 0), (4, 448, 336, 1), (4, 504, 336, 2),
    (4, 316, 340, 3), (4, 336, 340, 4), (4, 400, 340, -1),
    (8, 184, 96, 0), (8, 192, 96, 1), (8, 264, 96, 2), (8, 368, 96, 3),
    (8, 400, 96, 4), (8, 440, 96, 5), (8, 472, 96, -1),
    (16, 320, 224, 4), (16, 80, 240, 5), (16, 416, 256, -1), (16, 464, 256, 0),
    (16, 0, 272, 1), (16, 96, 272, 2), (16, 112, 272, 3),
    (32, 384, 224, -1), (32, 448, 224, 0), (32, 0, 256, 1), (32, 96, 256, 2),
    (32, 160, 256, 3), (32, 288, 256, 4), (32, 64, 320, 5),
    (64, 64, 0, 0), (64, 192, 64, 1), (64, 448, 128, 2), (64, 256, 192, 3),
    (64, 256, 256, 4), (64, 128, 320, 5),
]


def test_lenna_goldens(lenna_y):
    img = np.asarray(lenna_y)
    for size, x, y, expected in LENNA_GOLDENS:
        block = img[y : y + size, x : x + size].astype(np.int64)
        h = size // 2
        quads = np.array(
            [[
                block[:h, :h].sum(),
                block[:h, h:].sum(),
                block[h:, :h].sum(),
                block[h:, h:].sum(),
            ]],
            dtype=np.int64,
        )
        got = int(np.asarray(classify_from_quadrants(quads))[0])
        assert got == expected, (size, x, y, got, expected)


def test_classify_grid_matches_manual(lenna_y):
    from fractencode_tpu.core.classify import classify_grid

    img = np.asarray(lenna_y)[:64, :64]
    g = Grid(width=64, height=64, block_size=16, step=8)
    got = np.asarray(classify_grid(img, g))
    q = np.asarray(quadrant_sums(img, g))
    expect = [scalar_reference_category(*row.tolist()) for row in q]
    assert got.tolist() == expect


def test_code_table_matches_condition_chains(rng):
    """The 12-bit order-code lookup must equal the direct 24-chain
    transcription on exhaustive small inputs (incl. ties)."""
    import itertools

    from fractencode_tpu.core.classify import (
        _classify_from_quadrants_conditions,
        classify_from_quadrants,
    )

    # all 4^4 = 256 tie-rich quadrant patterns + random large values
    small = np.array(list(itertools.product(range(4), repeat=4)), np.int32)
    big = rng.integers(0, 2**20, size=(2048, 4)).astype(np.int32)
    for quads in (small, big):
        a = _classify_from_quadrants_conditions(jnp.asarray(quads))
        b = classify_from_quadrants(jnp.asarray(quads))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
