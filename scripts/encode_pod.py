#!/usr/bin/env python
"""Pod-scale batch encode driver (BASELINE config 5).

Runs the multi-image batch encode + on-device fixed-point decode over a
(data x search) device mesh, across one or many hosts.  This is the runnable
artifact for the "multi-image batch across 2+ hosts" north-star config: the
same script is launched once per host (SPMD), brings up ``jax.distributed``,
splits the global batch with ``host_local_batch``, assembles the global
sharded array, and reports frames/s + scaling.

Single host (works anywhere, today):

    python scripts/encode_pod.py --batch 16 --size 512

Multi-host TPU pod (same command on every host; standard JAX env vars or
flags select the coordinator):

    python scripts/encode_pod.py --batch 64 --size 512 \
        --coordinator host0:1234 --num-processes 4 --process-id $ID

The encode itself is ``parallel.sharded.encode_batch_sharded`` — the mesh's
``data`` axis spans hosts (each host feeds its local slice; DCN never sees
the codebook), the ``search`` axis stays inside each host's ICI domain, which
is exactly how the strategies' collectives (all_gather / ppermute ring) are
meant to be laid out (SURVEY.md section 5).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16,
                   help="GLOBAL batch size (must divide evenly over hosts)")
    p.add_argument("--size", type=int, default=512, help="square frame size")
    p.add_argument("--image", default=None,
                   help="replicate this image as the batch (default: lenna "
                        "if present, else random frames)")
    p.add_argument("--strategy", choices=["ranges", "domains", "ring"],
                   default="ranges")
    p.add_argument("--n-data", type=int, default=None,
                   help="mesh data-axis size (default: one per host, or the "
                        "device count if that leaves no search axis)")
    p.add_argument("--reps", type=int, default=3, help="timing repetitions")
    p.add_argument("--decode", action="store_true",
                   help="also run the sharded fixed-point decode")
    # multi-host bring-up (also honours JAX_COORDINATOR_ADDRESS etc.)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--init-timeout", type=float, default=None,
                   help="seconds to wait for the coordinator before failing")
    return p


def resolve_mesh_shape(n_devices: int, n_hosts: int, n_data: int | None):
    """(n_data, n_search) for the global mesh."""
    if n_data is None:
        n_data = n_hosts if n_devices > n_hosts else n_devices
    if n_devices % n_data:
        raise ValueError(f"--n-data {n_data} does not divide {n_devices} devices")
    return n_data, n_devices // n_data


def load_frames(args, per_host: int) -> np.ndarray:
    lenna = "/root/reference/tests/input/lenna512x512.png"
    path = args.image or (lenna if os.path.exists(lenna) else None)
    if path:
        from fractencode_tpu.image import load_gray

        base = np.asarray(load_gray(path))
        reps = -(-args.size // base.shape[0])
        base = np.tile(base, (reps, reps))[: args.size, : args.size]
    else:
        base = np.random.default_rng(0).integers(
            0, 256, size=(args.size, args.size), dtype=np.uint8
        )
    return np.stack([base] * per_host)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from fractencode_tpu.parallel.distributed import (
        host_local_batch,
        initialize_multihost,
        is_multihost,
    )

    multi = (
        args.coordinator
        or args.num_processes
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if multi:
        info = initialize_multihost(args.coordinator, args.num_processes,
                                    args.process_id, args.init_timeout)
        print(f"multihost up: {info}")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fractencode_tpu.params import EncoderConfig
    from fractencode_tpu.parallel import (
        decode_batch_sharded,
        encode_batch_sharded,
        make_mesh,
    )
    from fractencode_tpu.parallel.mesh import DATA_AXIS

    n_hosts = jax.process_count()
    n_data, n_search = resolve_mesh_shape(len(jax.devices()), n_hosts, args.n_data)
    mesh = make_mesh(n_data=n_data, n_search=n_search)
    cfg = EncoderConfig()

    per_host, offset = host_local_batch(args.batch)
    local = load_frames(args, per_host)

    # assemble the global [B, H, W] array from per-host slices; on one host
    # this is a plain device_put
    sharding = NamedSharding(mesh, P(DATA_AXIS, None, None))
    if is_multihost():
        global_batch = jax.make_array_from_process_local_data(sharding, local)
    else:
        global_batch = jax.device_put(jnp.asarray(local), sharding)

    def pull_scalar(x):
        """Multihost-safe completion barrier: reduce the (possibly
        non-process-local) sharded array to a replicated scalar every
        process can fetch — ``device_get`` of a global array whose shards
        live on other hosts raises "not fully addressable"."""
        return float(jax.jit(lambda a: jnp.asarray(a, jnp.float32).sum())(x))

    # warmup (compile)
    results = encode_batch_sharded(global_batch, cfg, mesh, args.strategy)
    pull_scalar(results[0].domain_idx)

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        results = encode_batch_sharded(global_batch, cfg, mesh, args.strategy)
        pull_scalar(results[-1].domain_idx)
        pull_scalar(results[-1].s)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    frames_s = args.batch / dt
    mpix_s = frames_s * args.size * args.size / 1e6
    # deterministic cross-run checksum (same value on every process; lets a
    # 2-process run be compared against a single-process run of the same
    # config in tests/test_distributed.py)
    chk = sum(pull_scalar(r.domain_idx) + pull_scalar(r.transform)
              for r in results)
    if jax.process_index() == 0:
        print(
            f"encode: {args.batch}x{args.size}^2 strategy={args.strategy} "
            f"mesh={dict(mesh.shape)} hosts={n_hosts}: "
            f"{dt:.4f} s -> {frames_s:.2f} frames/s, {mpix_s:.1f} Mpix/s"
        )
        print(f"checksum: {chk:.0f}")

    if args.decode:
        outs, iters, mse = decode_batch_sharded(results, mesh)
        pull_scalar(iters)
        t0 = time.perf_counter()
        outs, iters, mse = decode_batch_sharded(results, mesh)
        iters_sum = pull_scalar(iters)
        out_chk = pull_scalar(outs)
        dt = time.perf_counter() - t0
        if jax.process_index() == 0:
            print(
                f"decode: {dt:.4f} s -> {args.batch / dt:.2f} frames/s "
                f"(mean iters={iters_sum / args.batch:.1f})"
            )
            print(f"decode checksum: {out_chk:.0f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
