"""Round-5 rate experiments: measure candidate conditional-entropy gains.

Questions (VERDICT r4 'Next round' #2):
  (a) flat-block short-circuit: how many items have s_q in the zero-most
      bucket, and what do their domain/transform bits cost today?
  (b) domain-index recentering against a spatial-locality prior: code
      zigzag(dom_y - pred_y), zigzag(dom_x - pred_x) where pred is the
      domain whose origin is nearest the range block, vs today's raw byte
      planes.
  (c) per-quadtree-level tables (already the case) and s_q-conditioned
      o coding.

Run on CPU (JAX_PLATFORMS=cpu) — the encode uses the jnp oracle.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np

from fractencode_tpu import EncoderConfig, encode_plane
from fractencode_tpu.codec.entropy import zigzag
from fractencode_tpu.codec.quantize import quantize
from fractencode_tpu.image import load_gray

LENNA = "/root/reference/tests/input/lenna512x512.png"


def H(vals, minlength=256):
    c = np.bincount(np.asarray(vals, np.int64), minlength=minlength).astype(float)
    p = c[c > 0] / c.sum()
    return float(-(p * np.log2(p)).sum())


def tile_to(plane, n):
    reps = -(-n // plane.shape[0])
    return np.tile(plane, (reps, reps))[:n, :n]


def analyze(res, plane, label):
    h, w = plane.shape
    ts = res.target_size
    sw = res.source_size
    step = res.domain_step
    nxr = w // ts
    nxd = (w - sw) // step + 1
    nyd = (h - sw) // step + 1

    dom = np.asarray(res.domain_idx)
    tr = np.asarray(res.transform)
    s = np.asarray(res.s, np.float64)
    # mean-centred o (the CLI/bench default packing)
    p = plane.astype(np.float64)
    o = (p.reshape(h // ts, ts, w // ts, ts).transpose(0, 2, 1, 3)
         .reshape(-1, ts * ts).mean(axis=1))
    s_min, s_max = np.percentile(s, [0.5, 99.5])
    s_q = quantize(s, float(s_min), float(s_max), 5)

    n = len(dom)
    dy = dom // nxd
    dx = dom % nxd
    # nearest-domain prior: range block (ry, rx) at pixel (ry*ts, rx*ts);
    # nearest domain origin index = clip(round(ry*ts/step)), same for x
    ridx = np.arange(n)
    ry = ridx // nxr
    rx = ridx % nxr
    py = np.clip(np.round(ry * ts / step).astype(np.int64), 0, nyd - 1)
    px = np.clip(np.round(rx * ts / step).astype(np.int64), 0, nxd - 1)

    zzy = zigzag(dy - py)
    zzx = zigzag(dx - px)

    print(f"== {label}: n={n} domains={nxd}x{nyd} ==")
    d_bits = int(nxd * nyd - 1).bit_length()
    dom64 = dom.astype(np.uint64)
    raw_planes = sum(
        H((dom64 >> (8 * j)) & 0xFF) for j in range((d_bits + 7) // 8)
    )
    print(f"  raw dom byte planes: {raw_planes:.3f} bits/item (joint H={H(dom, nxd*nyd):.3f})")
    # recentered: byte planes of zzy and zzx
    zzy_planes = sum(H((zzy.astype(np.uint64) >> (8 * j)) & 0xFF)
                     for j in range((int(zzy.max()).bit_length() + 7) // 8 or 1))
    zzx_planes = sum(H((zzx.astype(np.uint64) >> (8 * j)) & 0xFF)
                     for j in range((int(zzx.max()).bit_length() + 7) // 8 or 1))
    print(f"  recentered zz(dy)+zz(dx) byte planes: {zzy_planes + zzx_planes:.3f}"
          f"  (joint H(dy)={H(zzy, int(zzy.max())+1):.3f} H(dx)={H(zzx, int(zzx.max())+1):.3f}"
          f"  max zzy={zzy.max()} zzx={zzx.max()})")
    print(f"  s_q entropy: {H(s_q):.3f}   transform H: {H(tr, 8):.3f}")
    # s == 0 bucket: dequantized-midpoint zero requires a bucket straddle;
    # report |s| small instead
    zero_bucket = s_q == np.argmin(np.abs(
        np.asarray([(k + 0.5) for k in range(32)]) * (s_max - s_min) / 32 + s_min))
    print(f"  items in the zero-closest s bucket: {zero_bucket.mean()*100:.1f}%")
    for thr in (0.02, 0.05, 0.1):
        frac = (np.abs(s) < thr).mean()
        print(f"  |s| < {thr}: {frac*100:.1f}%")
    # conditional: H(dom bytes | zero bucket) weighted
    if zero_bucket.any() and (~zero_bucket).any():
        hz = sum(H((dom64[zero_bucket] >> (8 * j)) & 0xFF)
                 for j in range((d_bits + 7) // 8))
        hnz = sum(H((dom64[~zero_bucket] >> (8 * j)) & 0xFF)
                  for j in range((d_bits + 7) // 8))
        print(f"  dom bytes | s-zero: {hz:.2f}, | other: {hnz:.2f} "
              f"(skip-flat saves {zero_bucket.mean() * (hz + H(tr[zero_bucket], 8)):.3f} bits/item)")


def main():
    plane = np.asarray(load_gray(LENNA))
    cfg = EncoderConfig()
    res = encode_plane(plane, cfg)
    analyze(res, plane, "512^2 uniform default")

    # quadtree finest level dominates the 1024^2 rate; analyze per level
    from fractencode_tpu.encode.quadtree import QuadtreeConfig, encode_plane_quadtree

    p1024 = tile_to(plane, 1024)
    qres = encode_plane_quadtree(p1024, cfg, QuadtreeConfig())
    for lvl in qres.levels:
        acc = np.asarray(lvl.accepted)
        if acc.sum() == 0:
            continue
        sel = np.where(acc)[0]
        import dataclasses

        class FakeRes:
            pass

        fr = FakeRes()
        fr.domain_idx = np.asarray(lvl.domain_idx)[sel]
        fr.transform = np.asarray(lvl.transform)[sel]
        fr.s = np.asarray(lvl.s)[sel]
        fr.target_size = lvl.range_size
        fr.source_size = lvl.domain_size
        fr.domain_step = lvl.domain_step
        # analyze() indexes ranges by position — quadtree sel breaks the
        # row prior positions, so compute range coords from sel directly
        h, w = 1024, 1024
        ts = lvl.range_size
        nxr = w // ts
        nxd = (w - lvl.domain_size) // lvl.domain_step + 1
        nyd = (h - lvl.domain_size) // lvl.domain_step + 1
        dom = fr.domain_idx
        dy = dom // nxd
        dx = dom % nxd
        ry = sel // nxr
        rx = sel % nxr
        py = np.clip(np.round(ry * ts / lvl.domain_step).astype(np.int64), 0, nyd - 1)
        px = np.clip(np.round(rx * ts / lvl.domain_step).astype(np.int64), 0, nxd - 1)
        zzy = zigzag(dy - py)
        zzx = zigzag(dx - px)
        d_bits = int(nxd * nyd - 1).bit_length()
        dom64 = dom.astype(np.uint64)
        raw_planes = sum(H((dom64 >> (8 * j)) & 0xFF)
                         for j in range((d_bits + 7) // 8))
        zz_planes = (
            sum(H((zzy.astype(np.uint64) >> (8 * j)) & 0xFF)
                for j in range(max(1, (int(zzy.max()).bit_length() + 7) // 8)))
            + sum(H((zzx.astype(np.uint64) >> (8 * j)) & 0xFF)
                  for j in range(max(1, (int(zzx.max()).bit_length() + 7) // 8)))
        )
        print(f"qt level rs={ts}: n={len(sel)} raw dom {raw_planes:.3f} vs recentered {zz_planes:.3f} bits/item")


if __name__ == "__main__":
    main()
