"""Pallas TPU kernel: modulated deformable 3x3 conv (DCNv2) forward, v2.

Replaces the reference's ``modulated_deformable_im2col`` CUDA kernels
(``/root/reference/detectron2/layers/csrc/deformable/deform_conv_cuda_kernel.cu:786-952``)
with an MXU-native formulation.  Per-pixel 2D deformable sampling is NOT
separable (the vertical sample position varies with the output column), so
bilinear interpolation is expressed as one matrix contraction per
(output row, tap-row group) plus a cheap lane-aligned vertical fold:

  1. **Horizontal tent matmul** — for the 3 taps sharing a kernel row
     (same ``ky``), one dot ``G3 = Xsub @ H3`` where
     ``H3[x, t*W + x'] = max(0, 1 - |x - Qx_t(r, x')|)`` is the bilinear
     "tent" over the *full* row (horizontal offsets are EXACT/unbounded)
     and ``Xsub`` is the ``2*vw + 2``-row vertical sub-band a tap row can
     reach, flattened row-major to ``[(row, cin), x]``.  One 128-deep MXU
     contraction replaces all horizontal gathers for 3 taps at once.
  2. **Vertical tent fold (VPU)** — the sub-band vertical tent
     (x modulation mask) has at most 2 non-zero rows per output pixel;
     it is applied as ``sub_rows`` broadcast-FMAs
     ``V3 += ty3[i] * G3[i*cin:(i+1)*cin]`` — lane-aligned, no sublane
     broadcasts, no (row, cin)-expanded weight tensor.
  3. **Weight contraction** — the folded per-tap samples are assembled
     into ``Vfull (9*cin, W)`` and contracted once with the 3x3 conv
     weight ``EW (cout, 9*cin)`` — a single MXU dot per output row.

v1 of this kernel applied the vertical tent as an MXU-sized elementwise
product (broadcast to ``(sub*cin, W)``) and folded rows inside a large
second matmul; that made it VPU-bound (the broadcast+mask touched 3x more
data than the fold needs) and 2.7x slower than this formulation.

**Lane packing**: maps narrower than 128 lanes (the 64^2 / 32^2 DLA-34
stages) pack ``P = 128 // W`` images side by side along the lane axis;
the horizontal tent is masked to same-image (x // W == x' // W) entries,
which reproduces exact zero-padding at image borders.  This keeps every
DCN in the DLAUp/IDAUp stack on the MXU instead of falling back to the
gather-based XLA path.

Semantics vs the exact op (``deform_conv.py::modulated_deform_conv``):
bit-matching zero-padded bilinear sampling whenever the *vertical* offset
|dy| <= v_window (horizontal offsets are always exact); samples whose
vertical position falls outside the band contribute zero ("drop-far"),
unlike the XLA window path which clamps.  v_window <= 3 so the band fits
8 sublanes (one f32 vreg).  Training uses ``dcn_conv_pallas_ad`` — a
``jax.custom_vjp`` whose backward is a mirror Pallas kernel (transposed
tent contractions for dX/dOffset/dMask + in-kernel dW accumulation).

Constraints (checked by ``pallas_dcn_supported``): 3x3 kernel, stride 1,
dilation 1, Cin % 16 == 0 (bf16 sublane tile; % 8 for f32), W % 128 == 0
or W in {32, 64} with the batch divisible by the packing factor.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "dcn_conv_pallas",
    "dcn_conv_pallas_ad",
    "pallas_dcn_supported",
    "V_WINDOW_DEFAULT",
]

V_WINDOW_DEFAULT = 3  # vertical offset coverage; 2*v+2 = 8 rows = one vreg


def _pick_r_blk(h: int) -> int:
    for cand in (8, 4, 2, 1):
        if h % cand == 0:
            return cand
    return 1


def _kernel(
    qy_ref,  # (1, r_blk, 3, 3*Wp) f32 — absolute vertical sample positions
    qx_ref,  # (1, r_blk, 3, 3*Wp) f32 — absolute (packed) horizontal positions
    m_ref,  # (1, r_blk, 3, 3*Wp) f32 — modulation mask
    ewt_ref,  # (9*cin, cout) — conv weight, tap-major, pre-transposed
    *rest,  # [scale_ref (1,cout) f32, shift_ref (1,cout) f32,] x_ref, o_ref, vfull
    h: int,
    wp: int,
    w_img: int,
    cin: int,
    cout: int,
    sub: int,
    v_window: int,
    r_blk: int,
    wj: int = 1,
    epilogue: bool = False,
    relu: bool = False,
    nhwc_out: bool = True,
    raw_q: bool = False,  # q refs hold RAW bf16 off_y/off_x/mask (fast prep)
):
    if epilogue:
        scale_ref, shift_ref, x_ref, o_ref, vfull = rest
    else:
        x_ref, o_ref, vfull = rest
    r0 = pl.program_id(1) * r_blk
    f32 = jnp.float32
    cdt = x_ref.dtype

    # input x-coordinate on sublanes, (tap, output pixel x') on lanes
    xiota = jax.lax.broadcasted_iota(jnp.int32, (wp, 3 * wp), 0).astype(f32)
    subiota = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0).astype(f32)
    if w_img != wp:
        # lane packing: a tent entry is valid only when the input column x
        # and the output column x' fall in the same packed image (exact
        # zero-padding at image borders)
        lane_img = (
            jax.lax.broadcasted_iota(jnp.int32, (wp, 3 * wp), 1) % wp
        ) // w_img
        same_img = (xiota.astype(jnp.int32) // w_img) == lane_img

    # bf16 models build the tents in bf16 from an integer-base constant:
    # C[x, lane] = x - nominal(lane) is integer-valued (exact in bf16 up to
    # 256) and the per-row residual delta = q - nominal is just the offset,
    # so |C - delta| carries the same ~2^-8 relative position quantization
    # the bf16 path already accepts for offsets (PARITY dev 10) — while the
    # tent build runs at twice the VPU vector throughput.  The kernel is
    # VPU-bound between MXU dots, so this is a direct win.  Cross-image
    # entries of packed maps are pre-masked INTO the constant (tent of a
    # huge |C| is exactly 0), removing the where() pass.  f32 models keep
    # the f32 build for bit-parity with the exact op.
    bf16_tent = cdt == jnp.bfloat16
    if bf16_tent:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * wp), 1)
        nominal = (lane % wp + lane // wp - 1).astype(f32)  # (1, 3wp)
        c_base = xiota - nominal
        if w_img != wp:
            c_base = jnp.where(same_img, c_base, 4096.0)
        c_base = c_base.astype(cdt)  # (wp, 3wp) integer-valued
        sub_c = subiota.astype(cdt)  # (sub, 1)

    hiprec = (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    for j in range(r_blk):
        qy_j = qy_ref[0, j]  # (3, 3*Wp)
        qx_j = qx_ref[0, j]
        m_j = m_ref[0, j]
        jj = j % wj  # column block of the row-batched sample buffer
        for g in range(3):  # tap-row groups, ky = g - 1
            a = jnp.clip(r0 + j + (g - 1) - v_window, 0, h - sub)
            xs = x_ref[0, pl.ds(a, sub)].reshape(sub * cin, wp)
            qx3 = qx_j[g : g + 1]  # (1, 3*Wp)
            if raw_q:
                # fast prep: qx3 IS off_x (bf16) — the nominal grid cancelled
                hxt = jnp.maximum(0.0, 1.0 - jnp.abs(c_base - qx3))
            elif bf16_tent:
                delta3 = (qx3 - nominal).astype(cdt)  # = off_x, small
                hxt = jnp.maximum(0.0, 1.0 - jnp.abs(c_base - delta3))
            else:
                hxt_f = jnp.maximum(0.0, 1.0 - jnp.abs(xiota - qx3))
                if w_img != wp:
                    hxt_f = jnp.where(same_img, hxt_f, 0.0)
                hxt = hxt_f.astype(cdt)
            g3 = jax.lax.dot_general(
                xs,
                hxt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,  # Mosaic requires 32-bit acc
                precision=hiprec,
            )  # [(row, c), (t, x')] f32 — the fold accumulates in f32 (a
            #    measured ~6% kernel win over astype-then-bf16-fold, and
            #    strictly more accurate)
            # vertical tent on absolute row coords (correct zero-padding),
            # modulation folded in; <=2 rows are non-zero per output pixel
            if raw_q:
                # qy3 IS off_y (bf16); the integer row base (r0+j+g-1 - a)
                # is reconstructed from scalars — f32 add then one bf16
                # round, identical to the f32-prep path's (qy - a) cast
                base = (r0 + j + (g - 1) - a).astype(f32)
                dy3 = (qy_j[g : g + 1].astype(f32) + base).astype(cdt)
                ty3 = (jnp.maximum(0.0, 1.0 - jnp.abs(sub_c - dy3)) *
                       m_j[g : g + 1]).astype(f32)  # (sub, 3*Wp)
            elif bf16_tent:
                dy3 = (qy_j[g : g + 1] - a.astype(f32)).astype(cdt)
                ty3 = (jnp.maximum(0.0, 1.0 - jnp.abs(sub_c - dy3)) *
                       m_j[g : g + 1].astype(cdt)).astype(f32)  # (sub, 3*Wp)
            else:
                rowc = subiota + a.astype(f32)  # (sub, 1)
                ty3 = (jnp.maximum(0.0, 1.0 - jnp.abs(rowc - qy_j[g : g + 1])) *
                       m_j[g : g + 1]).astype(g3.dtype)  # (sub, 3*Wp)
            v3 = g3[0:cin] * ty3[0:1]
            for i in range(1, sub):
                v3 = v3 + g3[i * cin : (i + 1) * cin] * ty3[i : i + 1]
            v3 = v3.astype(vfull.dtype)
            for t in range(3):
                k = g * 3 + t
                vfull[k * cin : (k + 1) * cin, jj * wp : (jj + 1) * wp] = (
                    v3[:, t * wp : (t + 1) * wp]
                )
        if jj != wj - 1:
            continue
        # Row-batched weight contraction: one (9*cin)-deep MXU dot per wj
        # rows instead of per row.  The per-row dot is tiny (<=10 MFLOP,
        # measured ~3% MXU utilization); batching wj rows on the lane axis
        # was a ~20% whole-kernel win at cin=64.
        if nhwc_out:
            # NHWC epilogue (cout a lane-tile multiple): contract with the
            # weight in (wj*Wp, cout) orientation so the output leaves the
            # kernel in the consumer's layout and the host-side unpack only
            # permutes untiled (batch-slot) axes — no C<->W relayout pass
            # over HBM.  Both operands contract on their sublane dim
            # (A^T B), the MXU-native form — no in-kernel relayout.
            acc = jax.lax.dot_general(
                vfull[:],
                ewt_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=hiprec,
            )  # (wj*Wp, cout)
        else:
            # narrow cout (< 128 lanes) would lane-pad the NHWC write to 2x
            # the bytes; emit (cout, wj*Wp) and let XLA transpose instead
            acc = jax.lax.dot_general(
                ewt_ref[:],
                vfull[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=hiprec,
            )  # (cout, wj*Wp)
        if epilogue:
            # fused inference tail: folded conv-bias + BatchNorm affine
            # (and ReLU) applied on the f32 accumulator before the only
            # HBM write — saves the separate elementwise pass XLA cannot
            # fuse into a custom call.  scale/shift arrive pre-shaped for
            # the output orientation: (1, cout) or (cout, 1).
            acc = acc * scale_ref[:] + shift_ref[:]
            if relu:
                acc = jnp.maximum(acc, 0.0)
        acc = acc.astype(o_ref.dtype)
        for b in range(wj):
            if nhwc_out:
                o_ref[0, j - wj + 1 + b] = acc[b * wp : (b + 1) * wp, :]
            else:
                o_ref[0, j - wj + 1 + b] = acc[:, b * wp : (b + 1) * wp]


def _pack_factor(w: int) -> int:
    return 128 // w if (w < 128 and 128 % w == 0) else 1


def _pick_wj(r_blk: int, cin: int, wp: int, itemsize: int) -> int:
    """Rows batched per weight contraction: the largest divisor of r_blk
    whose (9*cin, wj*wp) sample buffer stays under ~2.5 MB of VMEM."""
    budget = int(float(__import__('os').environ.get('DCN_WJ_BUDGET_MB', '2.5')) * 2**20)
    wj = 1
    for cand in (2, 4, 8):
        if r_blk % cand == 0 and 9 * cin * cand * wp * itemsize <= budget:
            wj = cand
    return wj


def pallas_dcn_supported(
    shape,
    kernel_size=(3, 3),
    stride=1,
    dilation=1,
    v_window=V_WINDOW_DEFAULT,
    interpret=False,
    dtype=None,
) -> bool:
    n, h, w, cin = shape
    p = _pack_factor(w)
    csub = 16 if dtype == jnp.bfloat16 else 8  # sublane tile for the reshape
    return (
        tuple(kernel_size) == (3, 3)
        and stride == 1
        and dilation == 1
        and cin % csub == 0
        and h >= 2
        and v_window <= 3  # band must fit 8 sublanes
        # Mosaic requires the innermost (lane) dim 128-tiled; narrower maps
        # pack 128 // W images along the lane axis (batch padded to P)
        and (interpret or (w % 128 == 0) or p > 1)
        # whole-image VMEM block (double-buffered by the pipeline)
        and h * cin * max(w, 128) * (2 if dtype == jnp.bfloat16 else 4) <= 2**22
    )


def _prepare(x, offset, mask, v_window):
    """Shared fwd/bwd preamble: batch padding, coordinate grids, lane
    packing.  Returns packed kernel operands + the dim bundle."""
    n, h, w, cin = x.shape
    r_blk = _pick_r_blk(h)
    sub = min(h, 2 * v_window + 2)
    p = _pack_factor(w)
    n_orig = n
    if n % p != 0:  # pad the batch to a multiple of the packing factor
        padn = p - n % p
        x = jnp.concatenate([x, jnp.zeros((padn,) + x.shape[1:], x.dtype)], 0)
        offset = jnp.concatenate(
            [offset, jnp.zeros((padn,) + offset.shape[1:], offset.dtype)], 0
        )
        mask = jnp.concatenate(
            [mask, jnp.zeros((padn,) + mask.shape[1:], mask.dtype)], 0
        )
        n = n + padn
    wp = w * p
    nb = n // p

    f32 = jnp.float32
    ry = jnp.arange(h, dtype=f32)[:, None, None]  # (H,1,1)
    cx = jnp.arange(w, dtype=f32)[None, :, None]  # (1,W,1)
    ky = jnp.repeat(jnp.arange(-1.0, 2.0, dtype=f32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1.0, 2.0, dtype=f32), 3)
    off = offset.astype(f32).reshape(n, h, w, 9, 2)
    qy = (ry[None] + ky + off[..., 0]).transpose(0, 1, 3, 2)  # (N, H, 9, W)
    qx = (cx[None] + kx + off[..., 1]).transpose(0, 1, 3, 2)
    m_t = mask.astype(f32).transpose(0, 1, 3, 2)

    def pack_q(q):  # (N, H, 9, W) -> (nb, H, 3, 3*Wp), lane = t*Wp + pk*w + x'
        q = q.reshape(nb, p, h, 3, 3, w)
        q = q.transpose(0, 2, 3, 4, 1, 5)  # (nb, H, g, t, pk, w)
        return q.reshape(nb, h, 3, 3 * wp)

    qy_p, qx_p, m_p = pack_q(qy), pack_q(qx), pack_q(m_t)
    if p > 1:
        # packed horizontal positions get a per-slot lane offset
        slot = jnp.arange(p, dtype=f32).reshape(1, 1, 1, 1, p, 1) * w
        qx_p = (
            qx_p.reshape(nb, h, 3, 3, p, w) + slot
        ).reshape(nb, h, 3, 3 * wp)

    x_t = _pack_img(x, nb, p, wp)
    dims = dict(
        n=n, n_orig=n_orig, h=h, w=w, cin=cin, wp=wp, nb=nb, p=p,
        r_blk=r_blk, sub=sub,
    )
    return qy_p, qx_p, m_p, x_t, dims


def _prepare_bf16(x, offset, mask, v_window):
    """bf16 forward fast prep: skips the f32 coordinate grids entirely.

    The bf16 kernel path only ever consumes ``q - nominal`` — which is
    exactly the RAW offset (the nominal grid, kernel-tap and packing-slot
    terms all cancel against the in-kernel ``nominal`` iota) — plus the
    modulation mask.  Since the offset conv runs in bf16 (layers.py), the
    f32 prep's grid sums were exact and rounded back to the same bf16
    values the kernel cast to anyway, so packing raw bf16 ``off_y / off_x
    / mask`` is bit-identical to ``_prepare`` + the bf16 kernel — at half
    the relayout bytes and none of the grid-add passes (measured: prep was
    ~42% of DCN time at B=64, dev/profile_dcn.py)."""
    n, h, w, cin = x.shape
    r_blk = _pick_r_blk(h)
    sub = min(h, 2 * v_window + 2)
    p = _pack_factor(w)
    n_orig = n
    if n % p != 0:  # pad the batch to a multiple of the packing factor
        padn = p - n % p
        x = jnp.concatenate([x, jnp.zeros((padn,) + x.shape[1:], x.dtype)], 0)
        offset = jnp.concatenate(
            [offset, jnp.zeros((padn,) + offset.shape[1:], offset.dtype)], 0
        )
        mask = jnp.concatenate(
            [mask, jnp.zeros((padn,) + mask.shape[1:], mask.dtype)], 0
        )
        n = n + padn
    wp = w * p
    nb = n // p

    bf = jnp.bfloat16

    def pack_raw(q):  # (N, H, W, 9) -> (nb, H, 3, 3*Wp), lane = t*Wp+pk*w+x'
        q = q.reshape(nb, p, h, w, 3, 3)
        q = q.transpose(0, 2, 4, 5, 1, 3)  # (nb, H, g, t, pk, w)
        return q.reshape(nb, h, 3, 3 * wp)

    off = offset.astype(bf).reshape(n, h, w, 9, 2)
    oy_p = pack_raw(off[..., 0])
    ox_p = pack_raw(off[..., 1])
    m_p = pack_raw(mask.astype(bf))
    x_t = _pack_img(x, nb, p, wp)
    dims = dict(
        n=n, n_orig=n_orig, h=h, w=w, cin=cin, wp=wp, nb=nb, p=p,
        r_blk=r_blk, sub=sub,
    )
    return oy_p, ox_p, m_p, x_t, dims


def _pack_img(x, nb, p, wp):
    """(N, H, W, C) NHWC -> (nb, H, C, Wp) with p images packed on lanes."""
    n, h, w, c = x.shape
    x_t = x.transpose(0, 1, 3, 2)  # (N, H, C, W)
    if p > 1:
        x_t = (
            x_t.reshape(nb, p, h, c, w).transpose(0, 2, 3, 1, 4).reshape(nb, h, c, wp)
        )
    return x_t


def _unpack_img(o_t, n, p, w):
    """(nb, H, C, Wp) -> (N, H, W, C)."""
    nb, h, c, wp = o_t.shape
    if p > 1:
        o_t = o_t.reshape(nb, h, c, p, w).transpose(0, 3, 1, 2, 4).reshape(n, h, c, w)
    return o_t.transpose(0, 1, 3, 2)


def _unpack_img_nhwc(o, n, p, w):
    """(nb, H, Wp, C) -> (N, H, W, C): only the packing-slot axis moves
    (untiled dims), the (W, C) lane/sublane layout is already final."""
    nb, h, wp, c = o.shape
    if p > 1:
        o = o.reshape(nb, h, p, w, c).transpose(0, 2, 1, 3, 4).reshape(n, h, w, c)
    return o


def _unpack_q(q, n, p, w):
    """(nb, H, 3, 3*Wp) -> (N, H, W, 9) (inverse of ``pack_q`` + transpose)."""
    nb, h, _, _ = q.shape
    q = q.reshape(nb, h, 3, 3, p, w).transpose(0, 4, 1, 2, 3, 5)
    q = q.reshape(n, h, 9, w)
    return q.transpose(0, 1, 3, 2)  # (N, H, W, 9)


def _tap_major_weight(weight, dtype):
    """(3, 3, Cin, Cout) -> EW (Cout, 9*Cin): EW[co, k*cin + c] = W[k, c, co]."""
    k9, cin, cout = 9, weight.shape[2], weight.shape[3]
    return (
        weight.reshape(k9, cin, cout).astype(dtype).transpose(2, 0, 1).reshape(cout, k9 * cin)
    )


# Trace-time log of forward-call shapes (n, h, w, cin, cout).  XLA cost
# analysis attributes zero FLOPs to Pallas custom calls, so MFU accounting
# (bench.py) replays this log to add the DCN ops' algorithmic FLOPs
# (2*9*cin*cout*H*W each, i.e. dense-3x3-conv equivalent work).
TRACE_SHAPES: list = []


def _raw_q_enabled() -> bool:
    """Debug gate: PALLAS_DCN_RAW_Q=0 forces the f32 grid prep even for
    bf16 inputs (the two are bit-identical by construction; the gate lets
    tests assert that and lets perf triage isolate the prep stage)."""
    import os

    return os.environ.get("PALLAS_DCN_RAW_Q", "1") != "0"


def _forward_impl(
    x, offset, mask, weight, v_window, interpret,
    post_scale=None, post_shift=None, post_relu=False,
):
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    TRACE_SHAPES.append((n, h, w, cin, cout))
    assert pallas_dcn_supported(
        x.shape, v_window=v_window, interpret=interpret, dtype=x.dtype
    ), (x.shape, v_window, x.dtype)
    assert offset.shape == (n, h, w, 18) and mask.shape == (n, h, w, 9)
    raw_q = x.dtype == jnp.bfloat16 and _raw_q_enabled()
    prep = _prepare_bf16 if raw_q else _prepare
    qy_p, qx_p, m_p, x_t, d = prep(x, offset, mask, v_window)
    ewt = _tap_major_weight(weight, x.dtype).T  # (9cin, cout)
    out = _forward_from_packed(
        qy_p, qx_p, m_p, x_t, ewt, d, w, cout, v_window, interpret,
        post_scale=post_scale, post_shift=post_shift, post_relu=post_relu,
        raw_q=raw_q,
    )
    return out[: d["n_orig"]]


def _forward_from_packed(
    qy_p, qx_p, m_p, x_t, ewt, d, w, cout, v_window, interpret,
    post_scale=None, post_shift=None, post_relu=False, raw_q=False,
):
    """Kernel-only forward on pre-packed operands (split out so perf
    harnesses can time the pallas_call separately from ``_prepare``)."""
    import jax

    h, cin = d["h"], d["cin"]
    wp, nb, r_blk = d["wp"], d["nb"], d["r_blk"]
    x = x_t  # packed (nb, H, cin, Wp); dtype drives the compute width
    epilogue = post_scale is not None
    # narrow cout would lane-pad the NHWC output tile (2x HBM bytes);
    # measured slower than the (cout, Wp) layout + XLA transpose
    nhwc_out = cout % 128 == 0
    wj = _pick_wj(r_blk, cin, wp, jnp.dtype(x.dtype).itemsize)

    kernel = functools.partial(
        _kernel,
        h=h,
        wp=wp,
        w_img=w,
        cin=cin,
        cout=cout,
        sub=d["sub"],
        v_window=v_window,
        r_blk=r_blk,
        wj=wj,
        epilogue=epilogue,
        relu=post_relu,
        nhwc_out=nhwc_out,
        raw_q=raw_q,
    )
    qspec = pl.BlockSpec(
        (1, r_blk, 3, 3 * wp), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    ep_operands, ep_specs = (), ()
    if epilogue:
        ep_shape = (1, cout) if nhwc_out else (cout, 1)
        ep_operands = (
            post_scale.astype(jnp.float32).reshape(ep_shape),
            post_shift.astype(jnp.float32).reshape(ep_shape),
        )
        ep_specs = (
            pl.BlockSpec(ep_shape, lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ep_shape, lambda b, r: (0, 0), memory_space=pltpu.VMEM),
        )
    out = pl.pallas_call(
        kernel,
        grid=(nb, h // r_blk),
        in_specs=[
            qspec,
            qspec,
            qspec,
            pl.BlockSpec(
                (9 * cin, cout), lambda b, r: (0, 0), memory_space=pltpu.VMEM
            ),
            *ep_specs,
            # whole packed image resident in VMEM; same block for every row
            # step, so the pipeline fetches it once per image
            pl.BlockSpec(
                (1, h, cin, wp), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, r_blk, wp, cout) if nhwc_out else (1, r_blk, cout, wp),
            lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nb, h, wp, cout) if nhwc_out else (nb, h, cout, wp), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((9 * cin, wj * wp), x.dtype),
        ],
        interpret=interpret,
    )(qy_p, qx_p, m_p, ewt, *ep_operands, x_t)
    unpack = _unpack_img_nhwc if nhwc_out else _unpack_img
    return unpack(out, d["n"], d["p"], w)


@functools.partial(
    jax.jit, static_argnames=("v_window", "interpret", "post_relu")
)
def dcn_conv_pallas(
    x: jnp.ndarray,  # (N, H, W, Cin)
    offset: jnp.ndarray,  # (N, H, W, 18) f32, (dy, dx) per tap row-major
    mask: jnp.ndarray,  # (N, H, W, 9) f32 (already sigmoided)
    weight: jnp.ndarray,  # (3, 3, Cin, Cout)
    bias=None,  # (Cout,)
    v_window: int = V_WINDOW_DEFAULT,
    interpret: bool = False,
    post_scale=None,  # (Cout,) f32 — fused epilogue: out*scale + shift
    post_shift=None,  # (Cout,) f32
    post_relu: bool = False,
) -> jnp.ndarray:
    """Full modulated-deform-conv forward (SAME padding, stride 1).

    ``post_scale``/``post_shift``/``post_relu`` fuse an inference-time
    per-channel affine + ReLU (e.g. a folded BatchNorm) into the kernel's
    HBM write; ``bias`` is folded into ``post_shift`` by the caller in that
    mode (pass bias=None)."""
    if post_scale is not None:
        return _forward_impl(
            x, offset, mask, weight, v_window, interpret,
            post_scale=post_scale, post_shift=post_shift, post_relu=post_relu,
        )
    out = _forward_impl(x, offset, mask, weight, v_window, interpret)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _row_chunk(sub: int, cin: int) -> int:
    """Rows of the vertical band processed per inner step in the backward
    kernels: bounds the (rows*cin, 3*Wp) temporaries to ~1k sublanes so the
    cin=512 DLAUp stages stay inside scoped VMEM."""
    c = max(1, 1024 // cin)
    return min(sub, c)


def _bwd_common(qx3, qy3, m3, a, xiota, subiota, same_img, w_img, wp,
                raw=None):
    """Recompute the forward tents + their position derivatives.

    With ``raw=(c_base, ibase)`` the q refs hold RAW bf16 offsets (fast
    prep): the absolute positions are reconstructed from the integer
    constants — ``dhx = c_base - off_x`` and ``dvy = (subiota - ibase) -
    off_y`` — which is bit-identical f32 math because the offsets were
    bf16-representable to begin with (the offset conv runs in bf16).
    Cross-image lanes are premasked into ``c_base`` (|dhx| ~ 4096 zeroes
    both the tent and its derivative), so the where() pass drops out."""
    f32 = jnp.float32
    if raw is not None:
        c_base, ibase = raw
        dhx = c_base - qx3.astype(f32)
        dvy = (subiota - ibase) - qy3.astype(f32)
        m3 = m3.astype(f32)
        same_img = None
    else:
        dhx = xiota - qx3
        dvy = (subiota + a.astype(f32)) - qy3
    hxt = jnp.maximum(0.0, 1.0 - jnp.abs(dhx))
    dtx = jnp.sign(dhx) * (jnp.abs(dhx) < 1.0)
    if same_img is not None:
        hxt = jnp.where(same_img, hxt, 0.0)
        dtx = jnp.where(same_img, dtx, 0.0)
    tenty = jnp.maximum(0.0, 1.0 - jnp.abs(dvy))
    ty3 = tenty * m3
    dty = jnp.sign(dvy) * (jnp.abs(dvy) < 1.0) * m3
    return hxt, dtx, ty3, tenty, dty


def _raw_c_base(wp, w_img):
    """f32 (wp, 3*Wp) integer tent-base constant for raw-offset q refs:
    C[x, lane] = x - nominal(lane), cross-image entries premasked to 4096."""
    f32 = jnp.float32
    xi = jax.lax.broadcasted_iota(jnp.int32, (wp, 3 * wp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (wp, 3 * wp), 1)
    nominal = lane % wp + lane // wp - 1
    c = (xi - nominal).astype(f32)
    if w_img != wp:
        same = (xi // w_img) == ((lane % wp) // w_img)
        c = jnp.where(same, c, 4096.0)
    return c


def _make_iotas(wp, sub, w_img):
    f32 = jnp.float32
    xiota = jax.lax.broadcasted_iota(jnp.int32, (wp, 3 * wp), 0).astype(f32)
    subiota = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0).astype(f32)
    same_img = None
    if w_img != wp:
        lane_img = (
            jax.lax.broadcasted_iota(jnp.int32, (wp, 3 * wp), 1) % wp
        ) // w_img
        same_img = (xiota.astype(jnp.int32) // w_img) == lane_img
    return xiota, subiota, same_img


def _hiprec(cdt):
    return (
        jax.lax.Precision.HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT
    )


def _dot(a, b, dims, cdt):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32, precision=_hiprec(cdt),
    )


def _dv3_of(dvfull, gi, cin):
    """Per-tap cotangent lanes: dv3[:, t*Wp:(t+1)*Wp] = dvfull row blocks."""
    return jnp.concatenate(
        [dvfull[(gi * 3 + t) * cin : (gi * 3 + t + 1) * cin, :] for t in range(3)],
        axis=1,
    )  # (cin, 3Wp)


def _bwd_dx_kernel(
    qy_ref, qx_ref, m_ref,  # (1, r_blk, 3, 3*Wp) f32
    ewt_ref,  # (9*cin, cout) — EW transposed
    g_ref,  # (1, r_blk, cout, Wp) — upstream cotangent
    dx_ref,  # out (1, H, cin, Wp) f32, block constant over the row grid dim
    *,
    h, wp, w_img, cin, cout, sub, v_window, r_blk, wj=1, raw_q=False,
):
    """dX = sum over taps of (ty * dV) contracted back through the
    horizontal tents; accumulated into the whole-image block."""
    rb = pl.program_id(1)
    r0 = rb * r_blk
    cdt = g_ref.dtype

    @pl.when(rb == 0)
    def _():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    xiota, subiota, same_img = _make_iotas(wp, sub, w_img)
    c_base = _raw_c_base(wp, w_img) if raw_q else None
    cr = _row_chunk(sub, cin)
    dvfull_blk = None
    for j in range(r_blk):
        jj = j % wj
        if jj == 0:
            # row-batched cotangent spread: one (cout)-deep MXU dot per wj
            # rows instead of per row (same win as the forward's wj batching)
            g_blk = jnp.concatenate(
                [g_ref[0, j + b].astype(cdt) for b in range(wj)], axis=1
            )  # (cout, wj*Wp)
            dvfull_blk = _dot(ewt_ref[:], g_blk, ((1,), (0,)), cdt).astype(cdt)
        dvfull = dvfull_blk[:, jj * wp : (jj + 1) * wp]
        for gi in range(3):
            a = jnp.clip(r0 + j + (gi - 1) - v_window, 0, h - sub)
            hxt, _, ty3, _, _ = _bwd_common(
                qx_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                qy_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                m_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                a, xiota, subiota, same_img, w_img, wp,
                raw=(c_base, (r0 + j + (gi - 1) - a).astype(jnp.float32))
                if raw_q else None,
            )
            hxt = hxt.astype(cdt)
            ty3 = ty3.astype(cdt)
            dv3 = _dv3_of(dvfull, gi, cin)
            for i0 in range(0, sub, cr):
                rows = min(cr, sub - i0)
                dg3 = jnp.concatenate(
                    [dv3 * ty3[i : i + 1] for i in range(i0, i0 + rows)], axis=0
                )  # (rows*cin, 3Wp)
                dxband = _dot(dg3, hxt, ((1,), (1,)), cdt)  # (rows*cin, Wp)
                dx_ref[0, pl.ds(a + i0, rows)] += dxband.reshape(rows, cin, wp)


def _bwd_dq_kernel(
    qy_ref, qx_ref, m_ref,
    ewt_ref,  # (9*cin, cout)
    x_ref,  # (1, H, cin, Wp)
    g_ref,  # (1, r_blk, cout, Wp)
    dq_ref,  # out (3, 1, r_blk, 3, 3*Wp) f32 — [dqy, dqx, dm] planes
    *,
    h, wp, w_img, cin, cout, sub, v_window, r_blk, wj=1, raw_q=False,  # wj unused (lean split path)
):
    """Offset / modulation-mask cotangents through the tent derivatives."""
    rb = pl.program_id(1)
    r0 = rb * r_blk
    cdt = x_ref.dtype
    xiota, subiota, same_img = _make_iotas(wp, sub, w_img)
    c_base = _raw_c_base(wp, w_img) if raw_q else None
    cr = _row_chunk(sub, cin)
    for j in range(r_blk):
        g_j = g_ref[0, j].astype(cdt)
        dvfull = _dot(ewt_ref[:], g_j, ((1,), (0,)), cdt).astype(cdt)
        dq_rows = []
        for gi in range(3):
            a = jnp.clip(r0 + j + (gi - 1) - v_window, 0, h - sub)
            hxt, dtx, ty3, tenty, dty = _bwd_common(
                qx_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                qy_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                m_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                a, xiota, subiota, same_img, w_img, wp,
                raw=(c_base, (r0 + j + (gi - 1) - a).astype(jnp.float32))
                if raw_q else None,
            )
            hxt = hxt.astype(cdt)
            dv3 = _dv3_of(dvfull, gi, cin)
            dh3 = jnp.zeros((wp, 3 * wp), jnp.float32)
            dqy3 = jnp.zeros((1, 3 * wp), jnp.float32)
            dm3 = jnp.zeros((1, 3 * wp), jnp.float32)
            for i0 in range(0, sub, cr):
                rows = min(cr, sub - i0)
                xs = x_ref[0, pl.ds(a + i0, rows)].reshape(rows * cin, wp)
                g3 = _dot(xs, hxt, ((1,), (0,)), cdt).astype(cdt)
                # dty_row[i] = sum_c g3[(i,c)] * dv3[c]; dG3[(i,c)] = ty*dv3
                dg3 = jnp.concatenate(
                    [dv3 * ty3[i : i + 1].astype(cdt)
                     for i in range(i0, i0 + rows)],
                    axis=0,
                )
                dh3 = dh3 + _dot(xs, dg3, ((0,), (0,)), cdt)
                pmat = jnp.concatenate(
                    [g3[(i - i0) * cin : (i - i0 + 1) * cin] * dv3
                     for i in range(i0, i0 + rows)],
                    axis=0,
                )
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (rows, rows * cin), 0)
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (rows, rows * cin), 1
                    ) // cin
                ).astype(cdt)
                dtyv = _dot(sel, pmat, ((1,), (0,)), cdt)  # (rows, 3Wp)
                dqy3 = dqy3 + jnp.sum(
                    dtyv * dty[i0 : i0 + rows], axis=0, keepdims=True
                )
                dm3 = dm3 + jnp.sum(
                    dtyv * tenty[i0 : i0 + rows], axis=0, keepdims=True
                )
            dqx3 = jnp.sum(dh3 * dtx, axis=0, keepdims=True)
            dq_rows.append((dqy3, dqx3, dm3))
        for comp in range(3):
            dq_ref[comp, 0, j] = jnp.concatenate(
                [dq_rows[gi][comp] for gi in range(3)], axis=0
            )


def _bwd_dw_kernel(
    qy_ref, qx_ref, m_ref,
    x_ref,  # (1, H, cin, Wp)
    g_ref,  # (1, r_blk, cout, Wp)
    dew_ref,  # out (cout, 9*cin) f32, accumulated across the whole grid
    vfull,  # VMEM scratch (9*cin, Wp)
    *,
    h, wp, w_img, cin, cout, sub, v_window, r_blk, wj=1, raw_q=False,  # wj unused (lean split path)
):
    """dW: recompute the folded samples Vfull and contract with g."""
    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * r_blk
    cdt = x_ref.dtype

    @pl.when(jnp.logical_and(b == 0, rb == 0))
    def _():
        dew_ref[...] = jnp.zeros(dew_ref.shape, dew_ref.dtype)

    xiota, subiota, same_img = _make_iotas(wp, sub, w_img)
    c_base = _raw_c_base(wp, w_img) if raw_q else None
    cr = _row_chunk(sub, cin)
    dew_acc = jnp.zeros((cout, 9 * cin), jnp.float32)
    for j in range(r_blk):
        for gi in range(3):
            a = jnp.clip(r0 + j + (gi - 1) - v_window, 0, h - sub)
            hxt, _, ty3, _, _ = _bwd_common(
                qx_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                qy_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                m_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                a, xiota, subiota, same_img, w_img, wp,
                raw=(c_base, (r0 + j + (gi - 1) - a).astype(jnp.float32))
                if raw_q else None,
            )
            hxt = hxt.astype(cdt)
            ty3 = ty3.astype(cdt)
            v3 = jnp.zeros((cin, 3 * wp), jnp.float32)
            for i0 in range(0, sub, cr):
                rows = min(cr, sub - i0)
                xs = x_ref[0, pl.ds(a + i0, rows)].reshape(rows * cin, wp)
                g3 = _dot(xs, hxt, ((1,), (0,)), cdt).astype(cdt)
                for i in range(i0, i0 + rows):
                    v3 = v3 + (
                        g3[(i - i0) * cin : (i - i0 + 1) * cin]
                        * ty3[i : i + 1]
                    ).astype(jnp.float32)
            for t in range(3):
                k = gi * 3 + t
                vfull[k * cin : (k + 1) * cin, :] = (
                    v3[:, t * wp : (t + 1) * wp].astype(vfull.dtype)
                )
        g_j = g_ref[0, j].astype(cdt)
        dew_acc = dew_acc + _dot(g_j, vfull[:], ((1,), (1,)), cdt)
    dew_ref[...] += dew_acc


def _bwd_dqdw_kernel(
    qy_ref, qx_ref, m_ref,
    ewt_ref,  # (9*cin, cout)
    x_ref,  # (1, H, cin, Wp)
    g_ref,  # (1, r_blk, cout, Wp)
    dq_ref,  # out (3, 1, r_blk, 3, 3*Wp) f32 — [dqy, dqx, dm] planes
    dew_ref,  # out (cout, 9*cin) f32, accumulated across the whole grid
    vfull,  # VMEM scratch (9*cin, wj*Wp)
    *,
    h, wp, w_img, cin, cout, sub, v_window, r_blk, wj=1, raw_q=False,
):
    """Fused dOffset/dMask + dW backward: one tent recompute and ONE
    ``g3 = Xsub @ hxt`` MXU pass feed both cotangents (the split kernels
    each redid that contraction — the single largest backward cost).
    The two per-row weight-space dots (cotangent spread ``EW @ g`` and the
    dW contraction ``g @ Vfull``) are batched over ``wj`` rows on the lane
    axis — per-row they run at ~3% MXU utilization (same measurement as
    the forward's weight dot)."""
    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * r_blk
    cdt = x_ref.dtype

    @pl.when(jnp.logical_and(b == 0, rb == 0))
    def _():
        dew_ref[...] = jnp.zeros(dew_ref.shape, dew_ref.dtype)

    xiota, subiota, same_img = _make_iotas(wp, sub, w_img)
    c_base = _raw_c_base(wp, w_img) if raw_q else None
    cr = _row_chunk(sub, cin)
    g_blk = dvfull_blk = None
    for j in range(r_blk):
        jj = j % wj
        if jj == 0:
            g_blk = jnp.concatenate(
                [g_ref[0, j + bb].astype(cdt) for bb in range(wj)], axis=1
            )  # (cout, wj*Wp)
            dvfull_blk = _dot(ewt_ref[:], g_blk, ((1,), (0,)), cdt).astype(cdt)
        dvfull = dvfull_blk[:, jj * wp : (jj + 1) * wp]
        dq_rows = []
        for gi in range(3):
            a = jnp.clip(r0 + j + (gi - 1) - v_window, 0, h - sub)
            hxt, dtx, ty3, tenty, dty = _bwd_common(
                qx_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                qy_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                m_ref[0, j, gi : gi + 1].reshape(1, 3 * wp),
                a, xiota, subiota, same_img, w_img, wp,
                raw=(c_base, (r0 + j + (gi - 1) - a).astype(jnp.float32))
                if raw_q else None,
            )
            hxt = hxt.astype(cdt)
            dv3 = _dv3_of(dvfull, gi, cin)
            dh3 = jnp.zeros((wp, 3 * wp), jnp.float32)
            dqy3 = jnp.zeros((1, 3 * wp), jnp.float32)
            dm3 = jnp.zeros((1, 3 * wp), jnp.float32)
            v3 = jnp.zeros((cin, 3 * wp), jnp.float32)
            for i0 in range(0, sub, cr):
                rows = min(cr, sub - i0)
                xs = x_ref[0, pl.ds(a + i0, rows)].reshape(rows * cin, wp)
                g3 = _dot(xs, hxt, ((1,), (0,)), cdt).astype(cdt)
                # --- dq side ---
                dg3 = jnp.concatenate(
                    [dv3 * ty3[i : i + 1].astype(cdt)
                     for i in range(i0, i0 + rows)],
                    axis=0,
                )
                dh3 = dh3 + _dot(xs, dg3, ((0,), (0,)), cdt)
                pmat = jnp.concatenate(
                    [g3[(i - i0) * cin : (i - i0 + 1) * cin] * dv3
                     for i in range(i0, i0 + rows)],
                    axis=0,
                )
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (rows, rows * cin), 0)
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (rows, rows * cin), 1
                    ) // cin
                ).astype(cdt)
                dtyv = _dot(sel, pmat, ((1,), (0,)), cdt)  # (rows, 3Wp)
                dqy3 = dqy3 + jnp.sum(
                    dtyv * dty[i0 : i0 + rows], axis=0, keepdims=True
                )
                dm3 = dm3 + jnp.sum(
                    dtyv * tenty[i0 : i0 + rows], axis=0, keepdims=True
                )
                # --- dW side: vertical fold of the SAME g3 ---
                for i in range(i0, i0 + rows):
                    v3 = v3 + (
                        g3[(i - i0) * cin : (i - i0 + 1) * cin]
                        * ty3[i : i + 1].astype(cdt)
                    ).astype(jnp.float32)
            dqx3 = jnp.sum(dh3 * dtx, axis=0, keepdims=True)
            dq_rows.append((dqy3, dqx3, dm3))
            for t in range(3):
                k = gi * 3 + t
                vfull[k * cin : (k + 1) * cin, jj * wp : (jj + 1) * wp] = (
                    v3[:, t * wp : (t + 1) * wp].astype(vfull.dtype)
                )
        for comp in range(3):
            dq_ref[comp, 0, j] = jnp.concatenate(
                [dq_rows[gi][comp] for gi in range(3)], axis=0
            )
        if jj == wj - 1:
            dew_ref[...] += _dot(g_blk, vfull[:], ((1,), (1,)), cdt)


def _fused_bwd_vmem_bytes(h, wp, cin, cout, sub, r_blk, itemsize, wj=1) -> int:
    """Rough VMEM footprint of the fused dq+dw kernel (blocks + the large
    temporaries); used to fall back to the split passes near the 16 MB
    scoped-VMEM limit (the cin=512 DLAUp stage is borderline)."""
    cr = _row_chunk(sub, cin)
    blocks = (
        3 * r_blk * 3 * 3 * wp * 4          # q/m blocks (f32)
        + 9 * cin * cout * itemsize          # ewt
        + h * cin * wp * itemsize            # x image block
        + r_blk * cout * wp * itemsize       # g block
        + 3 * r_blk * 3 * 3 * wp * 4         # dq out
        + cout * 9 * cin * 4                 # dew out
        + 9 * cin * wj * wp * itemsize       # vfull scratch (wj-wide)
    )
    temps = (
        9 * cin * wj * wp * itemsize         # dvfull_blk
        + cout * wj * wp * itemsize          # g_blk
        + cin * 3 * wp * itemsize            # dv3
        + wp * 3 * wp * 4                    # dh3
        + cin * 3 * wp * 4                   # v3
        + 3 * (cr * cin * 3 * wp * itemsize) # xs/g3/dg3/pmat working set
    )
    return blocks + temps


def _backward_impl(x, offset, mask, weight, gout, v_window, interpret):
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    raw_q = x.dtype == jnp.bfloat16 and _raw_q_enabled()
    prep = _prepare_bf16 if raw_q else _prepare
    qy_p, qx_p, m_p, x_t, d = prep(x, offset, mask, v_window)
    wp, nb, p, r_blk = d["wp"], d["nb"], d["p"], d["r_blk"]
    if gout.shape[0] != d["n"]:  # batch was padded
        gout = jnp.concatenate(
            [gout, jnp.zeros((d["n"] - gout.shape[0],) + gout.shape[1:], gout.dtype)],
            0,
        )
    g_t = _pack_img(gout.astype(x.dtype), nb, p, wp)
    ewt = _tap_major_weight(weight, x.dtype).T  # (9cin, cout)

    # row batching for the per-row weight-space dots; itemsize doubled to
    # cover the f32-accumulating dvfull temp alongside the vfull scratch
    wj = _pick_wj(r_blk, cin, wp, 2 * jnp.dtype(x.dtype).itemsize)
    dims = dict(
        h=h, wp=wp, w_img=w, cin=cin, cout=cout, sub=d["sub"],
        v_window=v_window, r_blk=r_blk, wj=wj, raw_q=raw_q,
    )
    grid = (nb, h // r_blk)
    qspec = pl.BlockSpec(
        (1, r_blk, 3, 3 * wp), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    ewt_spec = pl.BlockSpec(
        (9 * cin, cout), lambda b, r: (0, 0), memory_space=pltpu.VMEM
    )
    ximg_spec = pl.BlockSpec(
        (1, h, cin, wp), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, r_blk, cout, wp), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )

    # dX stays its own lean pass (it holds the f32 dX image block); dq and
    # dW fuse into one kernel sharing the tent + g3 recompute whenever the
    # fused working set clears scoped VMEM (cin=512 DLAUp stages fall back
    # to the split passes)
    dx_t = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, **dims),
        grid=grid,
        in_specs=[qspec, qspec, qspec, ewt_spec, g_spec],
        out_specs=ximg_spec,
        out_shape=jax.ShapeDtypeStruct((nb, h, cin, wp), jnp.float32),
        interpret=interpret,
    )(qy_p, qx_p, m_p, ewt, g_t)

    dq_spec = pl.BlockSpec(
        (3, 1, r_blk, 3, 3 * wp),
        lambda b, r: (0, b, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dew_spec = pl.BlockSpec(
        (cout, 9 * cin), lambda b, r: (0, 0), memory_space=pltpu.VMEM
    )
    fused_bytes = _fused_bwd_vmem_bytes(
        h, wp, cin, cout, d["sub"], r_blk, jnp.dtype(x.dtype).itemsize, wj=wj
    )
    import os

    fused_env = os.environ.get("PALLAS_DCN_FUSED_BWD", "auto")
    # Mosaic's real stack usage runs ~1.4x the estimate at bf16 and >3x at
    # f32 (unrolled-loop temporaries double with itemsize and don't share
    # slots); measured on v5e: every f32 DLA shape OOMs scoped VMEM even at
    # r_blk=1, so the fused path is gated to 2-byte compute widths
    use_fused = (
        (fused_bytes <= 13 * 2 ** 20 and jnp.dtype(x.dtype).itemsize == 2)
        if fused_env == "auto"
        else fused_env == "1"
    )
    if use_fused:
        dq, dew = pl.pallas_call(
            functools.partial(_bwd_dqdw_kernel, **dims),
            grid=grid,
            in_specs=[qspec, qspec, qspec, ewt_spec, ximg_spec, g_spec],
            out_specs=[dq_spec, dew_spec],
            out_shape=[
                jax.ShapeDtypeStruct((3, nb, h, 3, 3 * wp), jnp.float32),
                jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((9 * cin, wj * wp), x.dtype)],
            interpret=interpret,
        )(qy_p, qx_p, m_p, ewt, x_t, g_t)
    else:
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, **dims),
            grid=grid,
            in_specs=[qspec, qspec, qspec, ewt_spec, ximg_spec, g_spec],
            out_specs=dq_spec,
            out_shape=jax.ShapeDtypeStruct((3, nb, h, 3, 3 * wp), jnp.float32),
            interpret=interpret,
        )(qy_p, qx_p, m_p, ewt, x_t, g_t)

        dew = pl.pallas_call(
            functools.partial(_bwd_dw_kernel, **dims),
            grid=grid,
            in_specs=[qspec, qspec, qspec, ximg_spec, g_spec],
            out_specs=dew_spec,
            out_shape=jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
            scratch_shapes=[pltpu.VMEM((9 * cin, wp), x.dtype)],
            interpret=interpret,
        )(qy_p, qx_p, m_p, x_t, g_t)

    n_orig = d["n_orig"]
    dx = _unpack_img(dx_t, d["n"], p, w)[:n_orig].astype(x.dtype)
    dqy = _unpack_q(dq[0], d["n"], p, w)[:n_orig]  # (N, H, W, 9)
    dqx = _unpack_q(dq[1], d["n"], p, w)[:n_orig]
    dm = _unpack_q(dq[2], d["n"], p, w)[:n_orig].astype(mask.dtype)
    # qy = ry + ky + off_y, qx = cx + kx (+ slot) + off_x  =>  d off = dq
    doffset = jnp.stack([dqy, dqx], axis=-1).reshape(dqy.shape[:3] + (18,))
    doffset = doffset.astype(offset.dtype)
    # dW from tap-major dEW: dEW[co, k*cin + c] -> dW[k // 3, k % 3, c, co]
    dweight = (
        dew.reshape(cout, 9, cin).transpose(1, 2, 0).reshape(3, 3, cin, cout)
    ).astype(weight.dtype)
    return dx, doffset, dm, dweight
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _dcn_ad(x, offset, mask, weight, v_window, interpret):
    return _forward_impl(x, offset, mask, weight, v_window, interpret)


def _dcn_ad_fwd(x, offset, mask, weight, v_window, interpret):
    return (
        _forward_impl(x, offset, mask, weight, v_window, interpret),
        (x, offset, mask, weight),
    )


def _dcn_ad_bwd(v_window, interpret, res, gout):
    x, offset, mask, weight = res
    return _backward_impl(x, offset, mask, weight, gout, v_window, interpret)


_dcn_ad.defvjp(_dcn_ad_fwd, _dcn_ad_bwd)


def dcn_conv_pallas_ad(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias=None,
    v_window: int = V_WINDOW_DEFAULT,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable modulated-deform-conv: Pallas forward + Pallas VJP.

    The cotangents are the true gradients of the Pallas forward (drop-far
    vertical semantics included), computed by a mirror kernel: one
    tent-matmul recompute + transposed tent contractions for dX/dOffset and
    an in-kernel dW accumulation.  Replaces the gather-based XLA autodiff
    path, whose backward both compiles and runs orders of magnitude slower
    on TPU (reference backward kernels:
    ``deform_conv_cuda_kernel.cu:286-331,897-1000``).
    """
    out = _dcn_ad(x, offset, mask, weight, v_window, interpret)
    if bias is not None:
        out = out + bias.astype(out.dtype)  # dBias via XLA autodiff
    return out
