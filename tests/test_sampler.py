"""Golden tests for isometry-aware 2x2-average sampling.

Cases transcribed from the reference's ground-truth fixtures
(/root/reference/tests/ImageSamplerTest.cpp:9-48) — these pin down the exact
edge-clamp + isometry + 4-tap-average semantics.
"""
import numpy as np
import pytest

from fractencode_tpu.core.sampler import sample_block, tap_table
from fractencode_tpu.core.transform import TransformType

IMAGE = np.array(
    [
        [1, 1, 2, 2, 3, 3, 4, 4],
        [5, 5, 6, 6, 7, 7, 8, 8],
        [9, 9, 10, 10, 11, 11, 12, 12],
        [13, 13, 14, 14, 15, 15, 16, 16],
        [17, 17, 18, 18, 19, 19, 20, 20],
        [21, 21, 22, 22, 23, 23, 24, 24],
        [25, 25, 26, 26, 27, 27, 28, 28],
        [29, 29, 30, 30, 31, 31, 32, 32],
    ],
    dtype=np.uint8,
)


def sample_at(x, y, patch_size, t):
    """Reference-equivalent: sample output pixel (0, 0) of a patch at (x, y)
    downsampled to patch_size//... — reference calls sample(image, patch, 0, 0, t)
    directly, i.e. local source coordinate (0, 0).  We reproduce via the tap
    table for a target of size patch_size (identity ratio sampling uses
    source coordinate (rx * sw) // tw = 0 at rx=0, same as the direct call).
    """
    block = IMAGE[y : y + patch_size, x : x + patch_size]
    # target size = patch size reproduces srcX == rx exactly (ratio 1... but
    # clamp applies); output pixel (0,0) only needs srcX=srcY=0, which matches
    # the reference's direct sample(..., 0, 0, t) call.
    taps = tap_table(patch_size, patch_size, t)[0]
    return block.reshape(-1).astype(np.float64)[taps].sum() / 4.0


def test_sample_2x2_id():
    assert sample_at(0, 0, 2, TransformType.ID) == (1 + 1 + 5 + 5) / 4.0
    assert sample_at(1, 0, 2, TransformType.ID) == (1 + 2 + 5 + 6) / 4.0
    assert sample_at(3, 3, 2, TransformType.ID) == (14 + 15 + 18 + 19) / 4.0
    assert sample_at(3, 6, 2, TransformType.ID) == (26 + 27 + 30 + 31) / 4.0


def test_sample_4x4_transforms():
    assert sample_at(0, 0, 4, TransformType.ID) == (1 + 1 + 5 + 5) / 4.0
    assert sample_at(0, 0, 4, TransformType.ROT270) == (2 + 2 + 6 + 6) / 4.0
    assert sample_at(0, 0, 4, TransformType.FLIP) == (9 + 9 + 13 + 13) / 4.0

    assert sample_at(3, 4, 4, TransformType.ID) == (18 + 19 + 22 + 23) / 4.0
    assert sample_at(3, 4, 4, TransformType.ROT90) == (26 + 27 + 30 + 31) / 4.0
    assert sample_at(3, 4, 4, TransformType.ROT180) == (27 + 28 + 31 + 32) / 4.0
    assert sample_at(3, 4, 4, TransformType.ROT270) == (19 + 20 + 23 + 24) / 4.0
    assert sample_at(3, 4, 4, TransformType.FLIP) == (26 + 27 + 30 + 31) / 4.0


def test_sample_block_16_to_4_id():
    """16->4 sampling touches source pixels {0,1,4,5,8,9,12,13}^2."""
    block = np.arange(256, dtype=np.float64).reshape(16, 16)
    out = sample_block(block, 4, TransformType.ID)
    for ry in range(4):
        for rx in range(4):
            sx, sy = rx * 4, ry * 4
            expected = (
                block[sy, sx] + block[sy, sx + 1] + block[sy + 1, sx] + block[sy + 1, sx + 1]
            ) / 4.0
            assert out[ry, rx] == expected


def test_edge_clamp():
    """srcX == sw-1 decrements before tapping (sampler.h:32-35)."""
    taps = tap_table(3, 3, TransformType.ID)
    # output pixel (2, 2): src (2,2) == sw-1 -> clamped to (1,1)
    assert sorted(taps[8].tolist()) == [4, 5, 7, 8]


@pytest.mark.parametrize("t", list(TransformType))
def test_taps_in_bounds(t):
    for sw, tw in [(16, 4), (8, 4), (4, 2), (8, 2), (6, 3)]:
        taps = tap_table(sw, tw, t)
        assert taps.min() >= 0 and taps.max() < sw * sw
