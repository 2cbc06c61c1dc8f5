"""Multi-chip sharded encode/decode via ``shard_map``.

Replaces the reference's single-host thread pool (SURVEY.md section 2,
"Parallelism & communication inventory") with mesh sharding:

  * ``data`` axis — independent images; embarrassingly parallel (the
    multi-image batch of BASELINE config 5).
  * ``search`` axis, two strategies for one image:
      - **range sharding** (default): each device owns a contiguous slice of
        the range blocks and the full domain codebook (built locally from the
        replicated plane — compute is duplicated but tiny next to the search
        matmul).  No communication at all in the hot loop; results come back
        naturally sharded.  This is the "replicate/all_gather the codebook"
        strategy for images whose codebook fits HBM.
      - **domain sharding**: each device scores ALL ranges against a slice of
        the codebook columns and the global winner is reduced with an
        argmin-allreduce over ICI (``all_gather`` of the per-shard
        (distance, index) pairs + composite argmin).  This is the
        ring/Ulysses-style decomposition for codebooks too big to replicate
        — the communication pattern BASELINE.json's north star asks for.

Both run under one ``jax.jit`` so XLA overlaps collectives with compute.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.classify import classify_grid
from ..core.grid import uniform_grid
from ..core.stats import integral_image
from ..encode.codebook import build_codebook, extract_ranges
from ..encode.encoder import EncodeResult
from ..encode.matcher import (
    SearchResult,
    _BIG,
    search,
    search_pallas,
    search_pallas_classed,
)
from ..params import EncoderConfig
from .mesh import DATA_AXIS, SEARCH_AXIS


def _use_pallas(cfg: EncoderConfig) -> bool:
    if cfg.backend == "pallas":
        return True
    return cfg.backend == "auto" and jax.default_backend() == "tpu"

__all__ = [
    "encode_batch_sharded",
    "decode_batch_sharded",
    "encode_plane_sharded_image",
]


def _plane_search_arrays(plane, cfg: EncoderConfig, r_lo: int, r_count: int):
    """Search a contiguous slice [r_lo, r_lo + r_count) of the range blocks
    of one plane. Static slice bounds — used per search-shard."""
    h, w = plane.shape
    plane_f32 = plane.astype(jnp.float32)
    domain_grid = uniform_grid(w, h, cfg.source_size, cfg.domain_step)
    range_grid = uniform_grid(w, h, cfg.target_size, cfg.target_size)

    cb = build_codebook(plane_f32, domain_grid, cfg.target_size, cfg.num_transforms)
    ranges = jax.lax.dynamic_slice_in_dim(
        extract_ranges(plane_f32, cfg.target_size), r_lo, r_count, axis=0
    )
    sum_a = ranges.sum(axis=-1)
    sum_a2 = (ranges * ranges).sum(axis=-1)

    if cfg.use_classifier:
        ii = integral_image(plane)
        domain_classes = classify_grid(plane, domain_grid, ii=ii)
        range_classes = jax.lax.dynamic_slice_in_dim(
            classify_grid(plane, range_grid, ii=ii), r_lo, r_count, axis=0
        )
    else:
        domain_classes = None
        range_classes = None

    if _use_pallas(cfg):
        interpret = jax.default_backend() != "tpu"
        if cfg.use_classifier and range_classes is not None:
            return search_pallas_classed(
                ranges, sum_a, sum_a2, cb, range_classes, domain_classes, cfg,
                interpret=interpret,
            )
        return search_pallas(
            ranges, sum_a, sum_a2, cb, range_classes, domain_classes, cfg,
            interpret=interpret,
        )
    return search(ranges, sum_a, sum_a2, cb, range_classes, domain_classes, cfg)


def _result_tuple(res: SearchResult):
    return (res.domain_idx, res.transform, res.s, res.o, res.distance, res.valid)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "strategy"))
def _encode_batch_impl(planes, cfg: EncoderConfig, mesh: Mesh, strategy: str):
    b, h, w = planes.shape
    n_search = mesh.shape[SEARCH_AXIS]
    num_ranges = (h // cfg.target_size) * (w // cfg.target_size)
    assert num_ranges % n_search == 0, (num_ranges, n_search)
    r_per = num_ranges // n_search

    if strategy == "ranges":

        def body(planes_local):
            # planes_local: [B/nd, H, W]; this device owns range slice
            # [idx*r_per, (idx+1)*r_per) of every local image.
            idx = jax.lax.axis_index(SEARCH_AXIS)
            r_lo = idx * r_per

            def one(plane):
                return _result_tuple(_plane_search_arrays(plane, cfg, r_lo, r_per))

            if _use_pallas(cfg):
                # pallas_call (dynamic grid + scalar prefetch) doesn't vmap;
                # stream local images through the kernel sequentially — same
                # single-chip throughput pattern as encode_batch.
                return jax.lax.map(one, planes_local)
            return jax.vmap(one)(planes_local)

        out_spec = tuple([P(DATA_AXIS, SEARCH_AXIS)] * 6)
        # check_vma=False: pallas_call can't declare varying-axes metadata on
        # its outputs, so the analysis can't type the Pallas-backend body.
        outs = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None, None),),
            out_specs=out_spec,
            check_vma=False,
        )(planes)

    elif strategy == "domains":

        def body(planes_local):
            idx = jax.lax.axis_index(SEARCH_AXIS)

            def one(plane):
                plane_f32 = plane.astype(jnp.float32)
                domain_grid = uniform_grid(w, h, cfg.source_size, cfg.domain_step)
                range_grid = uniform_grid(w, h, cfg.target_size, cfg.target_size)
                d_total = domain_grid.num_items
                d_per = -(-d_total // n_search)  # padded shard size

                cb = build_codebook(
                    plane_f32, domain_grid, cfg.target_size, cfg.num_transforms
                )
                # slice the codebook along domains (pad tail shard)
                pad = d_per * n_search - d_total
                vals = jnp.pad(cb.values, ((0, pad), (0, 0), (0, 0)))
                sums = jnp.pad(cb.sum, ((0, pad), (0, 0)))
                sums2 = jnp.pad(cb.sum_sq, ((0, pad), (0, 0)), constant_values=_BIG)
                ivar = jnp.pad(cb.inv_var_or_compute(), ((0, pad), (0, 0)))
                lo = idx * d_per
                cb_shard = type(cb)(
                    values=jax.lax.dynamic_slice_in_dim(vals, lo, d_per, 0),
                    sum=jax.lax.dynamic_slice_in_dim(sums, lo, d_per, 0),
                    sum_sq=jax.lax.dynamic_slice_in_dim(sums2, lo, d_per, 0),
                    grid=domain_grid,
                    inv_var=jax.lax.dynamic_slice_in_dim(ivar, lo, d_per, 0),
                )
                ranges = extract_ranges(plane_f32, cfg.target_size)
                sum_a = ranges.sum(axis=-1)
                sum_a2 = (ranges * ranges).sum(axis=-1)
                if cfg.use_classifier:
                    ii = integral_image(plane)
                    dcls = jnp.pad(
                        classify_grid(plane, domain_grid, ii=ii),
                        (0, pad),
                        constant_values=-9,
                    )
                    dcls = jax.lax.dynamic_slice_in_dim(dcls, lo, d_per, 0)
                    rcls = classify_grid(plane, range_grid, ii=ii)
                else:
                    dcls = None
                    rcls = None
                # mask the tail shard's padded codebook columns
                local_ids = lo + jnp.arange(d_per)
                domain_mask = local_ids < d_total
                local = search(
                    ranges, sum_a, sum_a2, cb_shard, rcls, dcls, cfg,
                    domain_mask=domain_mask,
                )

                # ---- argmin-allreduce over the search axis (ICI) ----
                # gather per-shard (distance, local winner) and pick the
                # global winner with the reference tie-break (lowest global
                # domain index wins ties -> lowest shard wins ties).
                dists = jax.lax.all_gather(local.distance, SEARCH_AXIS)  # [S, R]
                winner = jnp.argmin(dists, axis=0)  # first (lowest shard) wins
                sel = lambda x: jax.lax.all_gather(x, SEARCH_AXIS)[
                    winner, jnp.arange(num_ranges)
                ]
                g_dom = sel(local.domain_idx) + winner * d_per
                return (
                    g_dom.astype(jnp.int32),
                    sel(local.transform),
                    sel(local.s),
                    sel(local.o),
                    jnp.min(dists, axis=0),
                    sel(local.valid),
                )

            return jax.vmap(one)(planes_local)

        out_spec = tuple([P(DATA_AXIS, None)] * 6)
        # check_vma=False: after the all_gather + argmin-allreduce the outputs
        # ARE replicated over 'search', but the varying-axes analysis cannot
        # prove it statically.
        outs = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None, None),),
            out_specs=out_spec,
            check_vma=False,
        )(planes)
    else:
        raise ValueError(f"unknown strategy {strategy}")

    dom, tr, s, o, dist, valid = outs
    return dom, tr, s, o, dist, valid


def encode_batch_sharded(
    planes,
    cfg: EncoderConfig,
    mesh: Mesh,
    strategy: str = "ranges",
) -> list[EncodeResult]:
    """Encode a batch of [B, H, W] u8 planes across the mesh.

    Returns one EncodeResult per image (arrays remain device-sharded until
    consumed).
    """
    planes = jnp.asarray(planes, jnp.uint8)
    b, h, w = planes.shape
    dom, tr, s, o, dist, valid = _encode_batch_impl(planes, cfg, mesh, strategy)
    return [
        EncodeResult(
            domain_idx=dom[i],
            transform=tr[i],
            s=s[i],
            o=o[i],
            distance=dist[i],
            valid=valid[i],
            width=w,
            height=h,
            source_size=cfg.source_size,
            target_size=cfg.target_size,
            domain_step=cfg.domain_step,
        )
        for i in range(b)
    ]


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _encode_sharded_image_impl(plane, cfg: EncoderConfig, mesh: Mesh):
    h, w = plane.shape
    n = mesh.shape[SEARCH_AXIS]
    hs = h // n  # rows per device
    sw = cfg.source_size
    step = cfg.domain_step
    halo = sw - step  # rows a device needs from its southern neighbour
    assert hs % step == 0 and hs % cfg.target_size == 0, (hs, step)
    assert hs >= sw, "shard must be at least one domain tall"

    domain_grid_global = uniform_grid(w, h, sw, step)
    ny_global = domain_grid_global.ny
    nx = domain_grid_global.nx
    rows_per_dev = hs // step  # domain rows anchored in each shard
    d_local = rows_per_dev * nx

    def body(plane_local):
        """plane_local: [hs, W] — this device's contiguous row band.

        Halo exchange: domains whose origin row is near the south edge read
        ``sw - step`` rows owned by the next device — fetched with a ring
        ppermute over ICI (the reference never needed this: one address
        space; SURVEY.md section 2 maps it to the 2048^2+ configs)."""
        idx = jax.lax.axis_index(SEARCH_AXIS)
        top_rows = jax.lax.ppermute(
            plane_local[:halo],
            SEARCH_AXIS,
            perm=[((i + 1) % n, i) for i in range(n)],  # south -> north
        )
        ext = jnp.concatenate([plane_local, top_rows], axis=0)  # [hs+halo, W]
        ext_f32 = ext.astype(jnp.float32)

        # local codebook over this band's domain rows (static count; the last
        # device's rows that fall off the image are masked invalid below)
        local_grid = uniform_grid(w, hs + halo, sw, step)
        assert local_grid.ny == rows_per_dev, (local_grid.ny, rows_per_dev)
        cb_local = build_codebook(ext_f32, local_grid, cfg.target_size,
                                  cfg.num_transforms)

        # replicate the codebook: all_gather over ICI; device-major concat ==
        # global row-major domain order because bands are contiguous rows
        vals = jax.lax.all_gather(cb_local.values, SEARCH_AXIS)
        sums = jax.lax.all_gather(cb_local.sum, SEARCH_AXIS)
        sums2 = jax.lax.all_gather(cb_local.sum_sq, SEARCH_AXIS)
        ivar = jax.lax.all_gather(cb_local.inv_var_or_compute(), SEARCH_AXIS)
        d_total = n * d_local
        cb = type(cb_local)(
            values=vals.reshape(d_total, *cb_local.values.shape[1:]),
            sum=sums.reshape(d_total, *cb_local.sum.shape[1:]),
            sum_sq=sums2.reshape(d_total, *cb_local.sum_sq.shape[1:]),
            grid=domain_grid_global,
            inv_var=ivar.reshape(d_total, *cb_local.sum.shape[1:]),
        )
        global_row = jnp.arange(d_total) // nx
        domain_mask = global_row < ny_global

        ranges = extract_ranges(plane_local.astype(jnp.float32), cfg.target_size)
        sum_a = ranges.sum(axis=-1)
        sum_a2 = (ranges * ranges).sum(axis=-1)

        if cfg.use_classifier:
            ii = integral_image(ext)
            dcls_local = classify_grid(ext, local_grid, ii=ii)
            dcls = jax.lax.all_gather(dcls_local, SEARCH_AXIS).reshape(d_total)
            range_grid = uniform_grid(w, hs, cfg.target_size, cfg.target_size)
            rcls = classify_grid(plane_local, range_grid,
                                 ii=integral_image(plane_local))
        else:
            dcls = None
            rcls = None

        res = search(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg,
                     domain_mask=domain_mask)
        return _result_tuple(res)

    out_spec = tuple([P(SEARCH_AXIS)] * 6)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SEARCH_AXIS, None),),
        out_specs=out_spec,
        check_vma=False,
    )(plane)


def encode_plane_sharded_image(plane, cfg: EncoderConfig, mesh: Mesh) -> EncodeResult:
    """Encode ONE large plane with the image itself sharded by rows across
    the 'search' axis: halo exchange for boundary domains + codebook
    all_gather (BASELINE config 4). Bitwise-matches the single-device encode.
    """
    plane = jnp.asarray(plane, jnp.uint8)
    h, w = plane.shape
    dom, tr, s, o, dist, valid = _encode_sharded_image_impl(plane, cfg, mesh)
    return EncodeResult(
        domain_idx=dom, transform=tr, s=s, o=o, distance=dist, valid=valid,
        width=w, height=h, source_size=cfg.source_size,
        target_size=cfg.target_size, domain_step=cfg.domain_step,
    )


@functools.partial(jax.jit, static_argnames=("mesh", "max_iterations", "epsilon",
                                             "initial_value"))
def _decode_batch_impl(dom, tr, s, o, valid, template: EncodeResult, mesh: Mesh,
                       max_iterations: int, epsilon: float, initial_value: int):
    from ..decode.decoder import _build_indices, _decode_step

    h, w = template.height, template.width

    def body(dom_l, tr_l, s_l, o_l, valid_l):
        def one(dom1, tr1, s1, o1, v1):
            res = EncodeResult(
                domain_idx=dom1, transform=tr1, s=s1, o=o1,
                distance=jnp.zeros_like(s1), valid=v1,
                width=w, height=h, source_size=template.source_size,
                target_size=template.target_size, domain_step=template.domain_step,
            )
            idx = _build_indices(res)
            ss = jnp.where(v1, s1, 0.0)
            oo = jnp.where(v1, o1, 0.0)
            init = jnp.full((h, w), initial_value, dtype=jnp.uint8)

            def cond(c):
                return (c[2] < max_iterations) & ~c[4]

            def step(c):
                img, prev, steps, _, _ = c
                nxt = _decode_step(img, idx, ss, oo, h, w, template.target_size)
                d = nxt.astype(jnp.float32) - img.astype(jnp.float32)
                mse = jnp.sum(d * d) / (h * w)
                # period-2 cycle exit; see decode.decoder.decode_plane
                cycle = jnp.all(nxt == prev)
                return nxt, img, steps + 1, mse, (mse < epsilon) | cycle

            # the carry must carry the same varying-axes as the loop body's
            # outputs (which vary over 'data' through dom1/s1/o1)
            carry0 = jax.lax.pcast(
                (init, init ^ jnp.uint8(1), jnp.int32(0),
                 jnp.float32(jnp.inf), jnp.bool_(False)),
                (DATA_AXIS,),
                to="varying",
            )
            img, _, steps, mse, _ = jax.lax.while_loop(cond, step, carry0)
            return img, steps, mse

        return jax.vmap(one)(dom_l, tr_l, s_l, o_l, valid_l)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=tuple([P(DATA_AXIS, None)] * 5),
        out_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS), P(DATA_AXIS)),
    )(dom, tr, s, o, valid)


def decode_batch_sharded(results: list[EncodeResult], mesh: Mesh,
                         max_iterations: int = 300, epsilon: float = 1e-5,
                         initial_value: int = 100):
    """Decode a batch of encodes data-parallel across the mesh.

    Returns ([B, H, W] u8 images, [B] iterations, [B] final mse).
    """
    stack = lambda f: jnp.stack([f(r) for r in results])
    return _decode_batch_impl(
        stack(lambda r: r.domain_idx),
        stack(lambda r: r.transform),
        stack(lambda r: r.s),
        stack(lambda r: r.o),
        stack(lambda r: r.valid),
        results[0],
        mesh,
        max_iterations,
        epsilon,
        initial_value,
    )
