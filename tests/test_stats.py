"""Block statistics (parity with /root/reference/image/ImageStatistics.cpp,
fixtures modeled on tests/ImageStatisticsTest.cpp)."""
import numpy as np

from fractencode_tpu.core.grid import Grid, uniform_grid
from fractencode_tpu.core.stats import (
    block_sums_nonoverlapping,
    grid_block_sums,
    integral_image,
    quadrant_sums,
)


def _row_value_image(size):
    """Pixel (x, y) = y + 1 (ImageStatisticsTest.cpp:7-18)."""
    return np.tile(np.arange(1, size + 1, dtype=np.uint8)[:, None], (1, size))


def test_block_sum_closed_form():
    for size in (2, 4, 8, 16, 32, 64):
        img = _row_value_image(size)
        g = Grid(width=size, height=size, block_size=size, step=size)
        s = np.asarray(grid_block_sums(img, g))
        expected = (size * (1 + size) // 2) * size
        assert s.tolist() == [expected]


def test_block_sum_saturation():
    """255-valued blocks must not saturate (the reference's u16 SIMD path is
    exactly at the edge: 255 * 256 = 65280)."""
    for size in (2, 4, 8, 16, 32):
        img = np.full((size, size), 255, dtype=np.uint8)
        g = Grid(width=size, height=size, block_size=size, step=size)
        assert int(np.asarray(grid_block_sums(img, g))[0]) == 255 * size * size


def test_overlapping_grid_sums(rng):
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    g = uniform_grid(32, 32, 16, 8)  # 3x3 overlapping domains
    s = np.asarray(grid_block_sums(img, g))
    ox, oy = g.origins()
    for i in range(g.num_items):
        expect = img[oy[i] : oy[i] + 16, ox[i] : ox[i] + 16].astype(np.int64).sum()
        assert s[i] == expect


def test_nonoverlapping_fast_path(rng):
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    s = np.asarray(block_sums_nonoverlapping(img, 4))
    assert s.shape == (4, 6)
    assert s[1, 2] == img[4:8, 8:12].astype(np.int64).sum()


def test_quadrant_sums(rng):
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    g = uniform_grid(16, 16, 8, 8)
    q = np.asarray(quadrant_sums(img, g))
    assert q.shape == (4, 4)
    # item 0 at (0,0) size 8: quadrants TL,TR,BL,BR (partition2.hpp:19-30)
    a = img.astype(np.int64)
    assert q[0, 0] == a[0:4, 0:4].sum()
    assert q[0, 1] == a[0:4, 4:8].sum()
    assert q[0, 2] == a[4:8, 0:4].sum()
    assert q[0, 3] == a[4:8, 4:8].sum()


def test_grid_item_count_512():
    """Default 512x512 setup: 63x63 = 3969 domains, 128x128 = 16384 ranges
    (SURVEY.md section 6)."""
    assert uniform_grid(512, 512, 16, 8).num_items == 3969
    assert uniform_grid(512, 512, 4, 4).num_items == 16384


def test_grid_origins_row_major():
    g = uniform_grid(8, 8, 4, 2)
    ox, oy = g.origins()
    assert ox.tolist() == [0, 2, 4, 0, 2, 4, 0, 2, 4]
    assert oy.tolist() == [0, 0, 0, 2, 2, 2, 4, 4, 4]


def test_integral_image(rng):
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    ii = np.asarray(integral_image(img))
    assert ii[0, 0] == 0
    assert ii[8, 8] == img.astype(np.int64).sum()
    assert ii[3, 5] == img[:3, :5].astype(np.int64).sum()
