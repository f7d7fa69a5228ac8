#!/usr/bin/env python
"""Per-layer Pallas-DCN cost breakdown on the current chip.

For every DCN shape in the DLA-34@512 flagship (B=64 bf16): wall time of the
full op (prep + kernel), prep alone, the derived kernel-only time, the tent
FLOP count, and implied MXU utilization — the measurement harness for kernel
perf rounds (see docs/DESIGN.md "Pallas DCN" notes).

Usage (TPU): python dev/profile_dcn.py [batch]
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.ops import pallas_dcn as P

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SHAPES = [  # (cin, cout, hw, count) in DLA-34 @ 512x512
    (512, 256, 16, 1),
    (256, 256, 32, 1),
    (256, 128, 32, 2),
    (128, 128, 64, 2),
    (128, 64, 64, 3),
    (64, 64, 128, 5),
]
DT = jnp.bfloat16
PEAK = 394e12  # v5e bf16


def timeit(fn, *args, reps=8):
    float(fn(*args))  # compile + fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(out)  # one fence; dispatches queue (axon: block_until_ready lies)
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnames=("vw",))
def full_op(x, off, m, w, vw):
    return jnp.sum(P.dcn_conv_pallas(x, off, m, w, v_window=vw).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("vw",))
def prep_only(x, off, m, w, vw):
    qy, qx, mp, xt, d = P._prepare(x, off, m, vw)
    ewt = P._tap_major_weight(w, x.dtype).T
    return (
        jnp.sum(qy[..., ::64]) + jnp.sum(qx[..., ::64]) + jnp.sum(mp[..., ::64])
        + jnp.sum(xt[..., ::64].astype(jnp.float32))
        + jnp.sum(ewt[::64].astype(jnp.float32))
    )


def main():
    rng = np.random.RandomState(0)
    tot_full = tot_kern = 0.0
    print(f"{'shape':>22} {'full ms':>8} {'prep ms':>8} {'kern ms':>8} {'tentTF':>7} {'MXU%':>6}", flush=True)
    for cin, cout, hw, cnt in SHAPES:
        x = jnp.asarray(rng.randn(B, hw, hw, cin), DT)
        off = jnp.asarray(rng.randn(B, hw, hw, 18) * 1.5, jnp.float32)
        m = jnp.asarray(rng.rand(B, hw, hw, 9), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, DT)
        tf = timeit(full_op, x, off, m, w, 3)
        tp = timeit(prep_only, x, off, m, w, 3)
        kern = max(tf - tp, 1e-9)
        p = P._pack_factor(hw)
        steps = (B // p) * hw
        tent_fl = steps * 3 * 2 * (min(hw, 8) * cin) * 128 * (3 * 128)
        conv_fl = steps * 2 * 9 * cin * cout * 128
        mxu = (tent_fl + conv_fl) / PEAK / kern * 100
        print(
            f"({cin:3d},{cout:3d},{hw:3d})x{cnt} {tf*1e3:8.2f} {tp*1e3:8.2f}"
            f" {kern*1e3:8.2f} {(tent_fl+conv_fl)/1e12:7.2f} {mxu:6.1f}",
            flush=True,
        )
        tot_full += tf * cnt
        tot_kern += kern * cnt
    print(f"TOTAL full {tot_full*1e3:.1f} ms  kern-est {tot_kern*1e3:.1f} ms (B={B})", flush=True)


if __name__ == "__main__":
    main()
