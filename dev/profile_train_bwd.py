#!/usr/bin/env python
"""Per-layer Pallas-DCN BACKWARD cost breakdown on the current chip.

For every DCN shape in the DLA-34@512 flagship: forward wall time vs the
full custom-VJP backward (`_backward_impl`: prep + dX pass + fused dq/dW
pass), the backward tent-FLOP count (~3x forward: dX spread, g3 recompute,
dh3 contraction), and implied MXU utilization — the measurement harness for
the training perf round (VERDICT r4 weak #2).

Usage (TPU): python dev/profile_train_bwd.py [batch]
Env: PALLAS_DCN_FUSED_BWD=auto|0|1 to compare fused vs split dq/dW.
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.ops import pallas_dcn as P

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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
VW = 3


def timeit(fn, *args, reps=8):
    out = fn(*args)
    float(jax.tree_util.tree_reduce(
        lambda a, b: a + b, jax.tree_util.tree_map(
            lambda t: jnp.sum(t.astype(jnp.float32)), out)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jax.tree_util.tree_reduce(
        lambda a, b: a + b, jax.tree_util.tree_map(
            lambda t: jnp.sum(t.astype(jnp.float32)), out)))
    return (time.perf_counter() - t0) / reps


@jax.jit
def fwd(x, off, m, w):
    return P.dcn_conv_pallas_ad(x, off, m, w, v_window=VW)


@jax.jit
def bwd(x, off, m, w, g):
    return P._backward_impl(x, off, m, w, g, VW, False)


def main():
    rng = np.random.RandomState(0)
    total_f = total_b = 0.0
    print(f"B={B}  dtype={DT.__name__}  vw={VW}")
    print(f"{'shape':>22} {'fwd ms':>8} {'bwd ms':>8} {'ratio':>6} "
          f"{'bwd TFLOP/s':>11} {'util':>6}")
    for cin, cout, hw, count in SHAPES:
        x = jnp.asarray(rng.randn(B, hw, hw, cin), DT)
        off = jnp.asarray(rng.randn(B, hw, hw, 18) * 0.7, DT)
        m = jnp.asarray(rng.rand(B, hw, hw, 9), DT)
        w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, DT)
        g = jnp.asarray(rng.randn(B, hw, hw, cout), DT)
        tf = timeit(fwd, x, off, m, w)
        tb = timeit(bwd, x, off, m, w, g)
        # tent flops: fwd g3 = 2*(sub*cin)*wp*3wp per row-gi; bwd does ~3x
        # (dX spread + g3 recompute + dh3) plus the cout spreads/dW dots
        wp = hw  # wp >= w, close enough at these pow2 sizes
        sub = min(2 * VW + 2, hw)
        tent = 2.0 * sub * cin * wp * 3 * wp * hw * 3 * B  # per full image
        dense = 2.0 * 9 * cin * cout * hw * hw * B
        bflops = 3 * tent + 3 * dense
        util = bflops / tb / PEAK
        print(f"{f'{cin}->{cout} @{hw}':>22} {tf*1e3:8.2f} {tb*1e3:8.2f} "
              f"{tb/tf:6.2f} {bflops/tb/1e12:11.2f} {util:6.1%}  x{count}")
        total_f += tf * count
        total_b += tb * count
    print(f"{'TOTAL (weighted)':>22} {total_f*1e3:8.2f} {total_b*1e3:8.2f} "
          f"{total_b/total_f:6.2f}")


if __name__ == "__main__":
    main()
