"""plane_mse / psnr (parity with /root/reference/image/metrics.h:53-56 — the
reference accumulates squared differences into a double, so large low-PSNR
planes must not wrap a 32-bit accumulator)."""
import numpy as np

from fractencode_tpu.core.metrics import plane_mse, psnr


def test_plane_mse_exact_small():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = np.zeros((8, 8), dtype=np.uint8)
    expected = float((np.arange(64, dtype=np.int64) ** 2).sum()) / 64.0
    assert float(plane_mse(a, b)) == expected


def test_plane_mse_no_i32_overflow_2048():
    """Worst case 2048^2: sum(d^2) = 255^2 * 4.19e6 ~ 2.7e11 >> 2^31.
    A flat i32 accumulator wraps (pre-fix this returned a negative/garbage
    value); the chunked hi/lo accumulation must return exactly 255^2."""
    a = np.zeros((2048, 2048), dtype=np.uint8)
    b = np.full((2048, 2048), 255, dtype=np.uint8)
    assert float(plane_mse(a, b)) == 255.0 * 255.0


def test_plane_mse_random_matches_f64(rng=np.random.default_rng(7)):
    a = rng.integers(0, 256, (512, 512), dtype=np.uint8)
    b = rng.integers(0, 256, (512, 512), dtype=np.uint8)
    expected = float(
        ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    )
    got = float(plane_mse(a, b))
    assert abs(got - expected) <= abs(expected) * 1e-6


def test_psnr_identical_planes_large():
    a = np.full((256, 256), 100, dtype=np.uint8)
    assert float(psnr(a, a)) > 100.0
