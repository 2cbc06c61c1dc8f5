"""Brightness-block classification (Fisher-style), vectorized.

The reference classifies one block at a time from its four quadrant sums via
24 hand-written inequality chains mapping to 6 classes, or -1 when no chain
holds (``/root/reference/encode/Classifier2.cpp:8-53``).  Here the whole
grid's classes are computed at once on the VPU from the [N, 4] quadrant-sum
tensor.

Faithfulness note: the 24 conditions are replicated *verbatim as inequality
triples*, including the reference's unreachable class-5 condition
``a4>a1 && a1>a3 && a3>a4`` (``Classifier2.cpp:48``), which is cyclic and can
never hold — so the descending order a4>a1>a3>a2 yields class -1 in both
implementations.  Every consistent condition determines a unique strict total
order, so at most one condition can match and evaluation order is irrelevant.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["classify_from_quadrants", "NUM_CLASSES", "classify_grid"]

NUM_CLASSES = 6

# (class, ((i, j), (k, l), (m, n))) meaning a_i > a_j && a_k > a_l && a_m > a_n,
# 1-based quadrant indices, transcribed from Classifier2.cpp:22-50.
_CONDITIONS = [
    (0, ((1, 2), (2, 3), (3, 4))),
    (0, ((3, 1), (1, 4), (4, 2))),
    (0, ((4, 3), (3, 2), (2, 1))),
    (0, ((2, 4), (4, 1), (1, 3))),
    (1, ((1, 3), (3, 2), (2, 4))),
    (1, ((2, 1), (1, 4), (4, 3))),
    (1, ((4, 2), (2, 3), (3, 1))),
    (1, ((3, 4), (4, 1), (1, 2))),
    (2, ((1, 4), (4, 3), (3, 2))),
    (2, ((4, 1), (1, 2), (2, 3))),
    (2, ((3, 2), (2, 4), (4, 1))),
    (2, ((2, 3), (3, 1), (1, 4))),
    (3, ((1, 2), (2, 4), (4, 3))),
    (3, ((3, 1), (1, 2), (2, 4))),
    (3, ((4, 3), (3, 1), (1, 2))),
    (3, ((2, 4), (4, 3), (3, 1))),
    (4, ((2, 1), (1, 3), (3, 4))),
    (4, ((1, 3), (3, 4), (4, 2))),
    (4, ((3, 4), (4, 2), (2, 1))),
    (4, ((4, 2), (2, 1), (1, 3))),
    (5, ((1, 4), (4, 2), (2, 3))),
    (5, ((4, 1), (1, 3), (3, 4))),  # unreachable (cyclic), kept for parity
    (5, ((2, 3), (3, 4), (4, 1))),
    (5, ((3, 2), (2, 1), (1, 4))),
]


def classify_from_quadrants(quads: jnp.ndarray) -> jnp.ndarray:
    """[N] i32 class in {-1, 0..5} from [N, 4] quadrant sums (a1..a4)."""
    # i32 is ample: quadrant sums of a 255-valued 64x64 block reach ~1e6.
    a = quads.astype(jnp.int32) if quads.dtype != jnp.float32 else quads
    result = jnp.full(quads.shape[:-1], -1, dtype=jnp.int32)
    for cls, triple in _CONDITIONS:
        match = None
        for i, j in triple:
            cmp = a[..., i - 1] > a[..., j - 1]
            match = cmp if match is None else (match & cmp)
        result = jnp.where(match, jnp.int32(cls), result)
    return result


def classify_grid(plane, grid, ii=None) -> jnp.ndarray:
    """[num_items] classes for every block of a grid over a u8 plane.

    Equivalent of preclassifying every grid item at partition-build time
    (``Classifier2.cpp:64-68``).
    """
    from .stats import quadrant_sums

    return classify_from_quadrants(quadrant_sums(plane, grid, ii=ii))
