"""Shared flax building blocks (NHWC, MXU-friendly).

Analog of the reference's ``detectron2/layers`` Python wrappers
(``wrappers.py:42`` Conv2d+norm fusion, ``batch_norm.py``), re-designed as
flax modules.  BatchNorm notes:

  * torch ``momentum=0.1`` ≡ flax ``momentum=0.9`` (flax keeps the EMA decay).
  * Under ``jit`` with a batch-sharded mesh, the batch-axis mean/var reductions
    are *global*: XLA inserts the cross-replica collectives automatically, so
    multi-chip training gets synchronized BN statistics by construction — the
    TPU-native replacement for the reference's opt-in ``NaiveSyncBatchNorm``
    (layers/batch_norm.py:153-240).
"""

import logging
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.deform_conv import modulated_deform_conv
from ..ops.pallas_dcn import (
    dcn_conv_pallas,
    dcn_conv_pallas_ad,
    pallas_dcn_supported,
)

BN_MOMENTUM = 0.9  # = 1 - torch_momentum(0.1), reference dla.py:27
BN_EPS = 1e-5


class ConvBnAct(nn.Module):
    """3x3/1x1 conv → BatchNorm → optional ReLU, the DLA trunk workhorse."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: int = 1
    dilation: int = 1
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # explicit symmetric padding: torch's Conv2d(padding=(k-1)//2*d).
        # flax SAME pads asymmetrically under stride 2 — different pixels.
        pads = tuple(
            (self.dilation * (k - 1) // 2, self.dilation * (k - 1) // 2)
            for k in self.kernel_size
        )
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            kernel_dilation=self.dilation,
            padding=pads,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


_warned_window = False


def _dcn_offset_mask_init(key, shape, dtype=jnp.float32):
    """Zero init: offsets start at 0 and masks at sigmoid(0)=0.5, so a fresh
    DCN behaves like half a plain conv (DCNv2's reset convention)."""
    return jnp.zeros(shape, dtype)


class DeformConvV2(nn.Module):
    """The fused DCN block used 16x in DLAUp/IDAUp.

    Structure per reference ``layers/deform_conv.py:498-519`` + the external
    DCNv2 op it wraps: an internal 3x3 conv predicting 27 channels (18 offset
    + 9 mask-logit), sigmoid on the mask, 3x3 modulated deformable conv
    (stride 1, 1 deformable group), then BatchNorm(momentum 0.1) + ReLU.
    """

    features: int
    window: int = 0  # offset clamp for the blocked fast path (0 = exact)
    impl: str = "auto"  # "auto" | "exact" | "window" | "pallas"
    v_window: int = 3  # pallas vertical offset coverage (max 3: 8-row band)
    dtype: Any = jnp.float32
    interpret: bool = False  # run the Pallas kernels interpreted (CPU tests)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        global _warned_window
        if self.window > 0 and not _warned_window:
            _warned_window = True
            logging.getLogger(__name__).warning(
                "TPU.DCN_WINDOW=%d clamps deformable-conv offsets to ±%d px — "
                "exact only while |offset| <= window; verify accuracy before "
                "using with imported reference weights.",
                self.window,
                self.window,
            )
        cin = x.shape[-1]
        # compute dtype follows the model (bf16 offsets quantize at ~0.03 px
        # for |offset|<=8 — far below sampling noise); the COORDINATE math
        # (x' + offset) happens in f32 inside the DCN ops, where bf16 would
        # cost whole pixels at x'~128
        om = nn.Conv(
            27,
            (3, 3),
            padding="SAME",
            kernel_init=_dcn_offset_mask_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        om = om.astype(jnp.float32)
        offset, mask_logit = om[..., :18], om[..., 18:]
        mask = jax.nn.sigmoid(mask_logit)

        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        use_pallas = (
            self.impl == "pallas"
            or (self.impl == "auto" and jax.default_backend() == "tpu")
        ) and pallas_dcn_supported(
            x.shape, v_window=self.v_window, dtype=self.dtype,
            interpret=self.interpret,
        )
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            # reference initializes this BN's scale with U(0,1)
            # (deform_conv.py:514); we keep the conventional ones-init, which
            # dominates U(0,1) in expectation and trains identically.
            name="bn",
        )
        # the mirror backward kernels only fit the 16 MB scoped-VMEM budget
        # at 2-byte compute width (measured on v5e: every f32 DLA shape OOMs
        # even at r_blk=1, bf16 fits with margin); f32 training falls back
        # to the exact gather+GEMM op under XLA autodiff
        pallas_train = self.dtype == jnp.bfloat16 or self.interpret
        if use_pallas and train and not pallas_train:
            use_pallas = False
        if use_pallas and train:
            # custom-VJP MXU kernel: Pallas forward + mirror Pallas backward
            y = dcn_conv_pallas_ad(
                x, offset, mask, kernel.astype(self.dtype), bias,
                v_window=self.v_window, interpret=self.interpret,
            )
        elif use_pallas:
            # inference fast path: fold conv-bias + BatchNorm + ReLU into the
            # kernel epilogue.  The BN affine (a, b) is extracted by probing
            # the *standard* flax BatchNorm with [0, 1] per channel — the
            # module (and its variable tree) stays byte-identical to the
            # train path, so checkpoints and goldens are unaffected:
            #   bn(0) = b,  bn(1) - bn(0) = a,  bn(y) = a*y + b
            probe = bn(jnp.stack([
                jnp.zeros((self.features,), self.dtype),
                jnp.ones((self.features,), self.dtype),
            ])[:, None, None, :])
            b = probe[0, 0, 0].astype(jnp.float32)
            a = (probe[1, 0, 0].astype(jnp.float32) - b)
            return dcn_conv_pallas(
                x, offset, mask, kernel.astype(self.dtype),
                v_window=self.v_window, interpret=self.interpret,
                post_scale=a, post_shift=a * bias + b, post_relu=True,
            )
        else:
            y = modulated_deform_conv(
                x, offset, mask, kernel.astype(self.dtype), bias,
                window=self.window,
            )
        return nn.relu(bn(y))


def _bilinear_kernel(f: int) -> np.ndarray:
    """(2f, 2f) bilinear interpolation stencil (reference fill_up_weights,
    dla.py:33-42)."""
    size = 2 * f
    c = (2 * np.ceil(size / 2) - 1 - np.ceil(size / 2) % 2) / (2.0 * np.ceil(size / 2))
    og = np.ogrid[:size, :size]
    k = (1 - np.abs(og[0] / np.ceil(size / 2) - c)) * (
        1 - np.abs(og[1] / np.ceil(size / 2) - c)
    )
    return k.astype(np.float32)


def _deconv_phase_taps(f: int):
    """Static tap table for a k=2f / stride-f transposed conv.

    Output pixel ``y = f*i + d`` of the input-dilated correlation touches
    exactly TWO input columns per axis: the kernel indices ``k`` with
    ``(d - pad + k) % f == 0`` (pad = 2f-1-f//2).  Returns, per phase d,
    the two ``(kernel index, input offset in {-1, 0, 1})`` pairs."""
    pad = 2 * f - 1 - f // 2
    return [
        [(k, (d - pad + k) // f) for k in range(2 * f) if (d - pad + k) % f == 0]
        for d in range(f)
    ]


class BilinearUpsample(nn.Module):
    """Learnable depthwise transposed conv, bilinear-initialized.

    Equivalent of the reference's grouped ``ConvTranspose2d(o, o, f*2,
    stride=f, padding=f//2, groups=o, bias=False)`` (dla.py:162-165).

    Two formulations, picked per shape (both bit-exact vs a float64 oracle,
    tests/ops; measured on v5e at the DLA-34 call shapes, B=64):
    * phase-decomposed: since k = 2f and stride = f, each output pixel
      reads exactly 2 input taps per axis, so the op is f^2 shifted 4-term
      FMAs + one contiguous pixel-shuffle reshape.  Wins at small spatial
      extents (<= 32x32: 1.5 vs 1.6 ms at 16^2x256, 1.8 vs 2.1 at
      32^2x128) where the dilated conv's window setup dominates.
    * input-dilated depthwise conv (one XLA conv op): wins at large
      extents (2.4 vs 5.3 ms at 64^2x64) and for f > 2, where the phase
      path's f^2 full-size phase tensors re-read the input per phase and
      the concatenate doubles the HBM traffic."""

    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.factor
        n, h, w, c = x.shape
        size = 2 * f

        def init(key, shape, dtype=jnp.float32):
            k = _bilinear_kernel(f)[:, :, None, None]
            return jnp.asarray(np.broadcast_to(k, shape), dtype)

        kernel = self.param("kernel", init, (size, size, 1, c), jnp.float32)
        kern = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        if f != 2 or h * w > 32 * 32:
            pad = size - 1 - f // 2
            return jax.lax.conv_general_dilated(
                xd,
                kern,
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                lhs_dilation=(f, f),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
        taps = _deconv_phase_taps(f)
        # offsets are in {-1, 0, 1}: one ring of zero padding covers all
        xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)))

        def shifted(oy, ox):  # x[i+oy, j+ox] with zero borders
            return jax.lax.slice(
                xp, (0, 1 + oy, 1 + ox, 0), (n, 1 + oy + h, 1 + ox + w, c)
            )

        rows = []
        for dy in range(f):
            cols = []
            for dx in range(f):
                acc = None
                for ky, oy in taps[dy]:
                    for kx, ox in taps[dx]:
                        term = shifted(oy, ox) * kern[ky, kx, 0]
                        acc = term if acc is None else acc + term
                cols.append(acc)
            rows.append(jnp.stack(cols, axis=3))  # (N, H, W, f, C)
        out = jnp.stack(rows, axis=2)  # (N, H, f, W, f, C)
        return out.reshape(n, f * h, f * w, c)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params (reference
    layers/batch_norm.py:14): used by ResNet/VoVNet backbones."""

    features: int
    dtype: Any = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        shift = bias - mean.value * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


def get_norm(norm: str, features: int, dtype: Any = jnp.float32) -> Optional[Callable]:
    """Norm factory mirroring reference ``layers/batch_norm.py:127``."""
    if norm == "":
        return None
    if norm in ("BN", "SyncBN", "NaiveSyncBN"):
        # Sync is automatic under a sharded mesh — see module docstring.
        return lambda train: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=dtype
        )
    if norm == "FrozenBN":
        return lambda train: FrozenBatchNorm(features=features, dtype=dtype)
    if norm == "GN":
        return lambda train: nn.GroupNorm(num_groups=32, dtype=dtype)
    raise ValueError(f"Unknown norm: {norm}")


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference layers/aspp.py:12): parallel
    1x1 + three dilated 3x3 convs + image pooling, concatenated and projected.
    Used by DeepLab-style semantic heads."""

    out_channels: int
    dilations: Tuple[int, int, int] = (6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.out_channels
        branches = [
            nn.relu(nn.Conv(c, (1, 1), dtype=self.dtype, name="conv1x1")(x))
        ]
        for i, d in enumerate(self.dilations):
            branches.append(
                nn.relu(
                    nn.Conv(
                        c, (3, 3), padding="SAME", kernel_dilation=d,
                        dtype=self.dtype, name=f"dilated{i}",
                    )(x)
                )
            )
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = nn.relu(nn.Conv(c, (1, 1), dtype=self.dtype, name="image_pool")(gap))
        gap = jnp.broadcast_to(gap, x.shape[:3] + (c,))
        cat = jnp.concatenate(branches + [gap], axis=-1)
        return nn.relu(nn.Conv(c, (1, 1), dtype=self.dtype, name="project")(cat))
