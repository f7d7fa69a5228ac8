"""Pallas DCN v2 (tent-matmul) vs the exact XLA op.

Runs in interpreter mode so CI exercises the kernel math on CPU; the same
code compiles via Mosaic on TPU (benchmarked separately).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.ops.deform_conv import modulated_deform_conv
from detectron2_centernet_tpu.ops.pallas_dcn import (
    dcn_conv_pallas,
    pallas_dcn_supported,
)


def _inputs(n=2, h=16, w=32, c=8, co=16, off_scale=2.8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    off = jnp.asarray((rng.rand(n, h, w, 18) * 2 - 1) * off_scale, jnp.float32)
    mask = jnp.asarray(rng.rand(n, h, w, 9), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(co), jnp.float32)
    return x, off, mask, wgt, bias


def test_matches_exact_within_vertical_window():
    """Bit-level parity with the exact unbounded op while |dy| <= v_window
    (horizontal offsets are always exact)."""
    x, off, mask, wgt, bias = _inputs(off_scale=2.8)
    got = dcn_conv_pallas(x, off, mask, wgt, bias, v_window=3, interpret=True)
    ref = modulated_deform_conv(x, off, mask, wgt, bias, window=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_horizontal_exact_unbounded():
    """Large horizontal offsets must still match the exact op."""
    rng = np.random.RandomState(1)
    x, off, mask, wgt, bias = _inputs(seed=1)
    off = np.array(off)
    off[..., 0::2] = (rng.rand(*off[..., 0::2].shape) * 2 - 1) * 2.0  # dy small
    off[..., 1::2] = (rng.rand(*off[..., 1::2].shape) * 2 - 1) * 20.0  # dx huge
    off = jnp.asarray(off)
    got = dcn_conv_pallas(x, off, mask, wgt, bias, v_window=3, interpret=True)
    ref = modulated_deform_conv(x, off, mask, wgt, bias, window=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_zero_offsets_equal_plain_conv_path():
    """dy=dx=0, mask=1 reduces to an ordinary 3x3 conv (same as exact op)."""
    x, _, _, wgt, bias = _inputs()
    off = jnp.zeros(x.shape[:3] + (18,), jnp.float32)
    mask = jnp.ones(x.shape[:3] + (9,), jnp.float32)
    got = dcn_conv_pallas(x, off, mask, wgt, bias, v_window=3, interpret=True)
    ref = modulated_deform_conv(x, off, mask, wgt, bias, window=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("co", [16, 128])  # (cout, Wp) and NHWC out layouts
def test_fused_epilogue_matches_bias_affine_relu(co):
    """post_scale/post_shift/post_relu fold conv-bias + BN-affine + ReLU
    into the kernel's HBM write; must equal the unfused composition (both
    the narrow-cout (cout, Wp) layout and the lane-tiled NHWC layout)."""
    x, off, mask, wgt, bias = _inputs(co=co, off_scale=2.0)
    rng = np.random.RandomState(7)
    a = jnp.asarray(np.abs(rng.randn(co)) + 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co), jnp.float32)
    got = dcn_conv_pallas(
        x, off, mask, wgt, None, v_window=3, interpret=True,
        post_scale=a, post_shift=a * bias + b, post_relu=True,
    )
    plain = dcn_conv_pallas(x, off, mask, wgt, bias, v_window=3, interpret=True)
    ref = jnp.maximum(plain * a + b, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_deform_conv_v2_eval_fold_matches_exact_module():
    """DeformConvV2's inference fast path (BN probe + fused kernel epilogue)
    must match the exact-impl module bit-for-bit at the test tolerance —
    same variable tree, same outputs."""
    from detectron2_centernet_tpu.models.layers import DeformConvV2

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 32, 8), jnp.float32)
    mod_p = DeformConvV2(features=16, impl="pallas", interpret=True)
    mod_e = DeformConvV2(features=16, impl="exact")
    variables = mod_p.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats + conv weights so the fold actually does work;
    # the offset conv gets a SMALL perturbation so vertical offsets stay
    # inside the v_window band where pallas == exact
    variables = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(
            np.abs(rng.randn(*v.shape)) * 0.3 + 0.05, v.dtype
        ),
        variables,
    )
    variables = dict(variables)
    com = variables["params"]["conv_offset_mask"]
    variables["params"] = dict(
        variables["params"],
        conv_offset_mask={k: v * 0.05 for k, v in com.items()},
    )
    got = mod_p.apply(variables, x, train=False)
    ref = mod_e.apply(variables, x, train=False)
    assert set(variables["params"].keys()) == {
        "conv_offset_mask", "kernel", "bias", "bn",
    }
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_drop_far_vertical_semantics():
    """Vertical samples beyond the band contribute zero (documented
    "drop-far" deviation from the clamping window path)."""
    x, _, _, wgt, _ = _inputs()
    off = np.zeros(x.shape[:3] + (18,), np.float32)
    off[..., 0::2] = 100.0  # every vertical offset far outside the band
    mask = jnp.ones(x.shape[:3] + (9,), jnp.float32)
    got = dcn_conv_pallas(
        x, jnp.asarray(off), mask, wgt, None, v_window=3, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-5)


def test_vjp_matches_exact_gradients():
    """Gradients of the Pallas custom-VJP vs jax.grad of the exact XLA op.
    With |dy| <= v_window the forwards agree exactly, so the true gradients
    agree too (up to float reassociation)."""
    from detectron2_centernet_tpu.ops.pallas_dcn import dcn_conv_pallas_ad

    x, off, mask, wgt, bias = _inputs(n=2, h=16, w=32, c=8, co=16, off_scale=2.5)
    # keep sample positions off exact integers: the subgradient of the
    # bilinear tent at frac==0 is an arbitrary (measure-zero) choice and
    # legitimately differs between implementations
    off = off + jnp.where(jnp.abs(off - jnp.round(off)) < 1e-3, 0.0371, 0.0)

    def loss_pallas(x, off, mask, wgt, bias):
        out = dcn_conv_pallas_ad(x, off, mask, wgt, bias, v_window=3, interpret=True)
        return jnp.sum(jnp.sin(out))  # nonlinear reduction exercises cotangents

    def loss_exact(x, off, mask, wgt, bias):
        out = modulated_deform_conv(x, off, mask, wgt, bias, window=0)
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias)
    ge = jax.grad(loss_exact, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias)
    names = ["dx", "doffset", "dmask", "dweight", "dbias"]
    for name, a, b in zip(names, gp, ge):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3, err_msg=name
        )


def test_vjp_packed_gradients():
    """Gradient parity with lane packing (w=32 -> 4 images per row)."""
    from detectron2_centernet_tpu.ops.pallas_dcn import dcn_conv_pallas_ad

    x, off, mask, wgt, _ = _inputs(n=4, h=8, w=32, c=8, co=8, off_scale=2.0, seed=7)

    def loss(fn):
        def f(x, off, mask, wgt):
            return jnp.sum(jnp.cos(fn(x, off, mask, wgt)))
        return f

    fp = loss(lambda *a: dcn_conv_pallas_ad(*a, v_window=3, interpret=True))
    fe = loss(lambda *a: modulated_deform_conv(*a, window=0))
    gp = jax.grad(fp, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
    ge = jax.grad(fe, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
    for name, a, b in zip(["dx", "doffset", "dmask", "dweight"], gp, ge):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3, err_msg=name
        )


def test_vjp_split_backward_matches_fused(monkeypatch):
    """The split dq/dw passes (VMEM fallback at cin=512) must produce the
    same gradients as the fused dq+dw kernel."""
    from detectron2_centernet_tpu.ops.pallas_dcn import dcn_conv_pallas_ad

    x, off, mask, wgt, bias = _inputs(n=1, h=8, w=32, c=8, co=8, seed=4)

    def loss_of(impl_flag):
        monkeypatch.setenv("PALLAS_DCN_FUSED_BWD", impl_flag)

        def loss(xx, oo, mm, ww):
            out = dcn_conv_pallas_ad(xx, oo, mm, ww, bias, v_window=3, interpret=True)
            return (out * out).sum()

        return jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, mask, wgt)

    g_fused = loss_of("1")
    g_split = loss_of("0")
    for a, b in zip(g_fused, g_split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_supported_predicate():
    assert pallas_dcn_supported((1, 16, 32, 8), interpret=True)
    assert pallas_dcn_supported((1, 16, 32, 8))  # lane-packs w/ batch padding
    assert pallas_dcn_supported((4, 16, 32, 8))  # lane-packs 4 images
    assert pallas_dcn_supported((2, 16, 64, 8))  # lane-packs 2 images
    assert pallas_dcn_supported((1, 128, 128, 64))  # production hot shape
    assert pallas_dcn_supported((4, 32, 32, 256))  # packed small hot shape
    assert not pallas_dcn_supported((1, 16, 32, 6))  # C % 8
    assert not pallas_dcn_supported((1, 16, 32, 8), stride=2)
    assert not pallas_dcn_supported((1, 16, 32, 8), kernel_size=(5, 5))
    assert not pallas_dcn_supported((1, 16, 32, 8), dilation=2)
    assert not pallas_dcn_supported((1, 128, 128, 64), v_window=4)  # band > 8


def test_lane_packing_pads_odd_batch():
    """n=3 with w=32 pads to the packing factor 4 and slices back."""
    rng = np.random.RandomState(4)
    n, h, w, c, co = 3, 16, 32, 8, 8
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    off = jnp.asarray((rng.rand(n, h, w, 18) * 2 - 1) * 2.0, jnp.float32)
    mask = jnp.asarray(rng.rand(n, h, w, 9), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
    got = dcn_conv_pallas(x, off, mask, wgt, None, v_window=3, interpret=True)
    assert got.shape == (n, h, w, co)
    ref = modulated_deform_conv(x, off, mask, wgt, None, window=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_lane_packing_matches_exact():
    """w=32 packs 4 images on the lane axis; border zero-padding must not
    bleed across packed neighbors even with huge horizontal offsets."""
    rng = np.random.RandomState(3)
    n, h, w, c, co = 4, 16, 32, 8, 16
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    off = np.asarray((rng.rand(n, h, w, 18) * 2 - 1), np.float32)
    off[..., 1::2] *= 30.0  # dx far outside the 32-wide image
    off = jnp.asarray(off)
    mask = jnp.asarray(rng.rand(n, h, w, 9), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
    got = dcn_conv_pallas(x, off, mask, wgt, None, v_window=3, interpret=True)
    ref = modulated_deform_conv(x, off, mask, wgt, None, window=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def _bf16_inputs(n=2, h=16, w=32, c=16, co=16, off_scale=2.0, seed=11):
    """Inputs pre-rounded to bf16 so the exact-op reference sees the same
    values the raw-offset fast prep packs verbatim."""
    rng = np.random.RandomState(seed)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32).astype(bf)
    off = jnp.asarray(
        (rng.rand(n, h, w, 18) * 2 - 1) * off_scale, jnp.float32
    ).astype(bf)
    mask = jnp.asarray(rng.rand(n, h, w, 9), jnp.float32).astype(bf)
    wgt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32).astype(bf)
    bias = jnp.asarray(rng.randn(co), jnp.float32).astype(bf)
    return x, off, mask, wgt, bias


def test_bf16_raw_prep_matches_exact():
    """The bf16 fast path (``_prepare_bf16`` raw-offset prep + raw_q kernel)
    vs the exact XLA op evaluated on the same bf16-rounded values in f32.
    Tolerance is bf16 resolution over the 9-tap accumulation."""
    x, off, mask, wgt, bias = _bf16_inputs()
    got = dcn_conv_pallas(x, off, mask, wgt, bias, v_window=3, interpret=True)
    assert got.dtype == jnp.bfloat16
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    ref = modulated_deform_conv(
        f32(x), f32(off), f32(mask), f32(wgt), f32(bias), window=0
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.06, rtol=0.05
    )


def test_bf16_raw_prep_bit_identical_to_f32_prep(monkeypatch):
    """The raw-offset fast prep (``_prepare_bf16`` + raw_q kernel) must be
    BIT-identical to the f32 grid prep + bf16-tent kernel, forward and
    backward — the grid terms cancel algebraically, so any difference is a
    packing/reconstruction bug (PALLAS_DCN_RAW_Q=0 forces the old path)."""
    from detectron2_centernet_tpu.ops.pallas_dcn import dcn_conv_pallas_ad

    x, off, mask, wgt, bias = _bf16_inputs(off_scale=2.5, seed=12)

    def grads():
        def loss(xx, oo, mm, ww, bb):
            out = dcn_conv_pallas_ad(xx, oo, mm, ww, bb, v_window=3, interpret=True)
            return jnp.sum(jnp.sin(out.astype(jnp.float32)))

        fwd = dcn_conv_pallas(x, off, mask, wgt, bias, v_window=3, interpret=True)
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias)
        return [fwd] + list(g)

    monkeypatch.setenv("PALLAS_DCN_RAW_Q", "1")
    jax.clear_caches()  # dcn_conv_pallas is jitted; the env gate is trace-time
    new = grads()
    monkeypatch.setenv("PALLAS_DCN_RAW_Q", "0")
    jax.clear_caches()
    old = grads()
    names = ["fwd", "dx", "doffset", "dmask", "dweight", "dbias"]
    for name, a, b in zip(names, new, old):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32), err_msg=name
        )
