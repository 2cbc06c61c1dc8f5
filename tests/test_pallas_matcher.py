"""Pallas fused-search kernel vs the jnp oracle (interpret mode on CPU;
the same kernel compiles for real on TPU — exercised by bench.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fractencode_tpu.core.grid import uniform_grid
from fractencode_tpu.encode.codebook import build_codebook, extract_ranges
from fractencode_tpu.encode.matcher import search, search_pallas
from fractencode_tpu.params import EncoderConfig, REFERENCE_COMPAT


def _setup(rng, n=64, cfg=None):
    cfg = cfg or EncoderConfig()
    img = rng.integers(0, 256, size=(n, n), dtype=np.uint8)
    plane = jnp.asarray(img, jnp.float32)
    dg = uniform_grid(n, n, cfg.source_size, cfg.domain_step)
    cb = build_codebook(plane, dg, cfg.target_size, cfg.num_transforms)
    ranges = extract_ranges(plane, cfg.target_size)
    sum_a = ranges.sum(axis=-1)
    sum_a2 = (ranges * ranges).sum(axis=-1)
    if cfg.use_classifier:
        from fractencode_tpu.core.classify import classify_grid

        rg = uniform_grid(n, n, cfg.target_size, cfg.target_size)
        rcls = classify_grid(jnp.asarray(img), rg)
        dcls = classify_grid(jnp.asarray(img), dg)
    else:
        rcls = dcls = None
    return ranges, sum_a, sum_a2, cb, rcls, dcls


@pytest.mark.parametrize("cfg", [
    EncoderConfig(),
    EncoderConfig(use_classifier=False),
    EncoderConfig(criterion="raw", so_mode="reference"),
    EncoderConfig(num_transforms=8),
    EncoderConfig(s_max=1.0),
    # BASELINE config 1's shape: 8x8 ranges (K=64 int8 boundary), full
    # 8-isometry search, no classifier — the ls_fast + zero-pad-tail path
    EncoderConfig(target_size=8, num_transforms=8, use_classifier=False),
])
def test_pallas_matches_oracle(rng, cfg):
    args = _setup(rng, 64, cfg)
    oracle = search(*args, cfg)
    kernel = search_pallas(*args, cfg, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(kernel.domain_idx), np.asarray(oracle.domain_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(kernel.transform), np.asarray(oracle.transform)
    )
    # Affine-mode distances involve a rounded reciprocal (inv_var_b), so the
    # two programs' fusion choices can differ by ~1 ulp; winners above are
    # exact.  Compat-mode ('raw') distances are integer-exact and covered
    # bit-for-bit by test_reference_parity.
    np.testing.assert_allclose(
        np.asarray(kernel.distance), np.asarray(oracle.distance), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(kernel.s), np.asarray(oracle.s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kernel.o), np.asarray(oracle.o), atol=1e-2)


def test_pallas_backend_end_to_end(rng):
    """encode_plane with backend='pallas' (interpreted on CPU) matches jnp."""
    from fractencode_tpu import encode_plane

    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    res_jnp = encode_plane(img, EncoderConfig(backend="jnp"))
    res_pl = encode_plane(img, EncoderConfig(backend="pallas"))
    np.testing.assert_array_equal(
        np.asarray(res_pl.domain_idx), np.asarray(res_jnp.domain_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(res_pl.transform), np.asarray(res_jnp.transform)
    )

@pytest.mark.parametrize("cfg", [
    EncoderConfig(),
    EncoderConfig(criterion="raw", so_mode="reference"),
    EncoderConfig(num_transforms=8),
])
def test_classed_kernel_matches_oracle(rng, cfg):
    """Class-blocked kernel == masked oracle, winner for winner."""
    from fractencode_tpu.encode.matcher import search_pallas_classed

    args = _setup(rng, 64, cfg)
    ranges, sum_a, sum_a2, cb, rcls, dcls = args
    oracle = search(*args, cfg)
    kernel = search_pallas_classed(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg,
                                   interpret=True)
    np.testing.assert_array_equal(
        np.asarray(kernel.valid), np.asarray(oracle.valid)
    )
    v = np.asarray(oracle.valid)
    np.testing.assert_array_equal(
        np.asarray(kernel.domain_idx)[v], np.asarray(oracle.domain_idx)[v]
    )
    np.testing.assert_array_equal(
        np.asarray(kernel.transform)[v], np.asarray(oracle.transform)[v]
    )
    # rtol: see test_pallas_matches_oracle (ulp noise in affine-mode dist)
    np.testing.assert_allclose(
        np.asarray(kernel.distance)[v], np.asarray(oracle.distance)[v], rtol=1e-5
    )


def test_classed_kernel_lenna(lenna_y):
    """Real-image class distribution (including -1 ties) on a Lenna crop."""
    from fractencode_tpu.encode.matcher import search_pallas_classed

    cfg = EncoderConfig()
    img = np.asarray(lenna_y)[:64, :64]
    plane = jnp.asarray(img, jnp.float32)
    dg = uniform_grid(64, 64, cfg.source_size, cfg.domain_step)
    cb = build_codebook(plane, dg, cfg.target_size, cfg.num_transforms)
    ranges = extract_ranges(plane, cfg.target_size)
    sum_a = ranges.sum(axis=-1)
    sum_a2 = (ranges * ranges).sum(axis=-1)
    from fractencode_tpu.core.classify import classify_grid

    rg = uniform_grid(64, 64, cfg.target_size, cfg.target_size)
    rcls = classify_grid(jnp.asarray(img), rg)
    dcls = classify_grid(jnp.asarray(img), dg)
    oracle = search(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg)
    kernel = search_pallas_classed(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg,
                                   interpret=True)
    np.testing.assert_array_equal(
        np.asarray(kernel.domain_idx), np.asarray(oracle.domain_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(kernel.transform), np.asarray(oracle.transform)
    )


def test_classed_fallback_on_pair_cap_overflow(rng, monkeypatch):
    """When the class distribution overflows the pair-list SMEM budget, the
    lax.cond fallback must run the 2-D classed kernel and produce identical
    results.  PAIR_CAP is patched tiny so the overflow branch is reachable
    on a small image (matcher re-reads it per call)."""
    from fractencode_tpu.encode import matcher as M
    from fractencode_tpu.ops import matcher_pallas as MP

    cfg = EncoderConfig()
    args = _setup(rng, 64, cfg)
    ranges, sum_a, sum_a2, cb, rcls, dcls = args
    oracle = search(*args, cfg)

    monkeypatch.setattr(MP, "PAIR_CAP", 4)  # force n_pairs > p_cap
    M.search_pallas_classed.clear_cache()
    try:
        kernel = M.search_pallas_classed(
            ranges, sum_a, sum_a2, cb, rcls, dcls, cfg, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(kernel.domain_idx), np.asarray(oracle.domain_idx)
        )
        np.testing.assert_array_equal(
            np.asarray(kernel.transform), np.asarray(oracle.transform)
        )
    finally:
        M.search_pallas_classed.clear_cache()


def test_int8_path_bit_identical_at_k64(rng):
    """K=64 (8x8 ranges) is the largest contraction where the int8 SumAB
    decomposition is exact (INT8_MAX_K); winners and distances must be
    bit-identical to the f32 kernel there."""
    cfg8 = EncoderConfig(source_size=32, target_size=8, int8_matmul=True)
    cfgf = EncoderConfig(source_size=32, target_size=8, int8_matmul=False)
    args = _setup(rng, 128, cfg8)
    ranges, sum_a, sum_a2, cb, rcls, dcls = args
    from fractencode_tpu.encode.matcher import search_pallas_classed

    k8 = search_pallas_classed(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg8,
                               interpret=True)
    kf = search_pallas_classed(ranges, sum_a, sum_a2, cb, rcls, dcls, cfgf,
                               interpret=True)
    np.testing.assert_array_equal(
        np.asarray(k8.domain_idx), np.asarray(kf.domain_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(k8.transform), np.asarray(kf.transform)
    )
    np.testing.assert_array_equal(
        np.asarray(k8.distance), np.asarray(kf.distance)
    )


def test_encode_batch_vmapped_prep_matches_single(rng):
    """The batch path (vmapped prep + lax.map'd kernel + vmapped post) must
    equal per-frame encode_plane bitwise, pallas and oracle backends."""
    from fractencode_tpu import EncoderConfig, encode_plane
    from fractencode_tpu.encode import encode_batch

    imgs = rng.integers(0, 256, size=(3, 64, 64), dtype=np.uint8)
    for backend in ("pallas", "jnp"):
        cfg = EncoderConfig(backend=backend)
        outs = encode_batch(imgs, cfg)
        for i in range(3):
            single = encode_plane(imgs[i], cfg)
            np.testing.assert_array_equal(
                np.asarray(outs[i].domain_idx), np.asarray(single.domain_idx),
                err_msg=backend,
            )
            np.testing.assert_array_equal(
                np.asarray(outs[i].transform), np.asarray(single.transform)
            )
            np.testing.assert_array_equal(
                np.asarray(outs[i].s), np.asarray(single.s)
            )
            np.testing.assert_array_equal(
                np.asarray(outs[i].valid), np.asarray(single.valid)
            )


@pytest.mark.parametrize("use_classifier", [False, True])
@pytest.mark.parametrize("threshold", [50.0, 500.0])
def test_threshold_frontier_matches_oracle(rng, threshold, use_classifier):
    """rms_threshold > 0 in the kernels (default 'ls' rank mode): the
    early-accept frontier (prefix mask + per-row freeze,
    ops.matcher_pallas._apply_frontier) must reproduce select_best's
    oracle winners bitwise — including the within-domain transform suffix
    rule (transformmatcher.h:55-56)."""
    import dataclasses

    from numpy.lib.stride_tricks import sliding_window_view

    from fractencode_tpu.encode.encoder import _encode_plane_impl

    base = rng.integers(0, 256, size=(64, 64)).astype(np.float32)
    pad = np.pad(base, 2, mode="edge")
    img = sliding_window_view(pad, (5, 5)).reshape(64, 64, 25).mean(axis=2)
    img = img.astype(np.uint8)

    cfg_o = EncoderConfig(backend="jnp", rms_threshold=threshold,
                          use_classifier=use_classifier)
    cfg_p = dataclasses.replace(cfg_o, backend="pallas")
    ro = _encode_plane_impl(jnp.asarray(img), cfg_o)
    rp = _encode_plane_impl(jnp.asarray(img), cfg_p)
    assert int((np.asarray(ro.distance) <= threshold).sum()) > 0, "vacuous"
    for f in ("domain_idx", "transform", "s", "o", "distance", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ro, f)), np.asarray(getattr(rp, f)),
            err_msg=f"threshold={threshold} cls={use_classifier} field={f}",
        )


def test_classed_statics_8k_fits_and_guard_still_fires():
    """The pair list's 12-bit col-tile field must cover 8K and 16K defaults
    (round-4 ceiling lift); sizes past the field width must still fail
    loudly (matcher_pallas._pack_pairs) instead of silently corrupting
    packed pairs."""
    from fractencode_tpu.encode.matcher import _classed_statics
    from fractencode_tpu.ops.matcher_pallas import _CT_BITS, _RT_SHIFT

    cfg = EncoderConfig()
    for side in (4096, 8192):
        d = ((side - 16) // 8 + 1) ** 2
        block_r, block_m, r_pad, m_pad, _, _, use_pairs = _classed_statics(
            (side // 4) ** 2, d * 4, cfg
        )
        assert use_pairs
        # the packed i32 must stay positive: rt occupies the top bits
        assert (r_pad // block_r) < (1 << (31 - _RT_SHIFT))
    # 16K overflows the 12-bit col-tile field: statics route to the 2-D
    # classed kernel instead of asserting (round 5)
    side = 16384
    d = ((side - 16) // 8 + 1) ** 2
    *_, use_pairs = _classed_statics((side // 4) ** 2, d * 4, cfg)
    assert not use_pairs


def test_no_pairs_route_matches_pairs(rng):
    """The 16K routing decision (2-D classed kernel, no pair list) must be
    bit-identical to the pair-list path — exercised at a small size via
    force_no_pairs so the route itself is testable on CPU."""
    from fractencode_tpu.encode.matcher import search_pallas_classed

    cfg = EncoderConfig()
    args = _setup(rng, 64, cfg)
    ranges, sum_a, sum_a2, cb, rcls, dcls = args
    a = search_pallas_classed(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg,
                              interpret=True)
    b = search_pallas_classed(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg,
                              interpret=True, force_no_pairs=True)
    for f in ("domain_idx", "transform", "distance", "s", "o", "valid"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)))
