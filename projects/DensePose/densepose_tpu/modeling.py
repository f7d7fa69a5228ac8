"""DensePose chart model: head, predictor, losses, ROI extension.

Reference: ``/root/reference/projects/DensePose/densepose/modeling/``
(``roi_heads/v1convx.py:15`` head, ``predictors/chart.py:12`` predictor,
``losses/densepose_losses.py:515-729`` chart losses,
``roi_heads/roi_head.py:85`` DensePoseROIHeads).

TPU redesign: the ragged per-instance IUV point lists become fixed
``(MAX_OBJS, MAX_DP_POINTS)`` arrays with validity masks; losses are masked
sums over the static point capacity, and the whole head runs inside the one
jitted train step through the framework's ROI-head extension hooks.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from detectron2_centernet_tpu.models.roi_heads.extension import (
    ROI_HEAD_EXTENSION_REGISTRY,
    ROIContext,
    ROIHeadExtension,
)
from detectron2_centernet_tpu.models.roi_heads.mask_head import crop_gt_masks


class DensePoseHead(nn.Module):
    """N stacked 3x3 convs + relu (DensePoseV1ConvXHead, v1convx.py:15-61)."""

    num_convs: int = 8
    hidden_dim: int = 512
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.kernel // 2
        for i in range(self.num_convs):
            x = nn.Conv(
                self.hidden_dim, (self.kernel, self.kernel),
                padding=[(p, p), (p, p)], dtype=self.dtype,
                name=f"body_conv_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


def _gn_groups(channels: int, want: int = 32) -> int:
    """GroupNorm group count.  The reference hardcodes 32 groups for its
    DeepLab/ASPP heads; any reference-parity width is divisible by 32 and
    gets exactly 32 so imported-checkpoint statistics match.  Only
    explicitly-tiny test widths (< 32 channels, or a non-multiple used in
    unit tests) fall back to the largest divisor."""
    if channels % want == 0:
        return want
    g = min(want, channels)
    while channels % g:
        g -= 1
    if channels >= want:
        import logging

        logging.getLogger(__name__).warning(
            "GroupNorm width %d is not divisible by the reference's %d "
            "groups; using %d groups — imported-checkpoint activations will "
            "differ from the reference at this width.", channels, want, g,
        )
    return g


class _ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference deeplab.py:109-140, the
    torchvision DeepLabV3 ASPP at rates 6/12/56): 1x1 branch + three dilated
    3x3 branches + a global-pool branch, each GN+relu, concat, 1x1 project."""

    out_channels: int
    rates: Tuple[int, int, int] = (6, 12, 56)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def gn_relu(h, name):
            return nn.relu(
                nn.GroupNorm(
                    num_groups=_gn_groups(h.shape[-1]), epsilon=1e-5,
                    dtype=self.dtype, name=name,
                )(h)
            )

        # submodule names mirror the torch Sequential indices
        # (ASPP.convs.{i}.{j}) so checkpoint import aligns deterministically
        c = self.out_channels
        branches = [
            gn_relu(
                nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="convs0_0")(x),
                "convs0_1",
            )
        ]
        for i, r in enumerate(self.rates):
            h = nn.Conv(
                c, (3, 3), kernel_dilation=(r, r), padding=[(r, r), (r, r)],
                use_bias=False, dtype=self.dtype, name=f"convs{i + 1}_0",
            )(x)
            branches.append(gn_relu(h, f"convs{i + 1}_1"))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(
            c, (1, 1), use_bias=False, dtype=self.dtype, name="convs4_1"
        )(pooled)
        pooled = gn_relu(pooled, "convs4_2")
        # broadcast of a 1x1 global feature == bilinear upsample of a 1x1 map
        branches.append(jnp.broadcast_to(pooled, x.shape[:3] + (c,)))
        cat = jnp.concatenate(branches, axis=-1)
        return nn.relu(
            nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project0")(cat)
        )


class _NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block (reference deeplab.py:146-263,
    Wang et al. CVPR 2018): softmax(theta @ phi^T) @ g, projected by a
    zero-initialised GN so the block starts as identity; phi/g sub-sampled
    by a 2x2 max-pool."""

    sub_sample: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        inter = max(c // 2, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x)
        if self.sub_sample:
            pool = lambda a: nn.max_pool(a, (2, 2), strides=(2, 2))
            phi, g = pool(phi), pool(g)
        q = theta.reshape(n, h * w, inter)
        k = phi.reshape(n, -1, inter)
        v = g.reshape(n, -1, inter)
        attn = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", q.astype(jnp.float32), k.astype(jnp.float32)),
            axis=-1,
        ).astype(v.dtype)
        y = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, inter)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="W_0")(y)
        y = nn.GroupNorm(
            num_groups=_gn_groups(c), epsilon=1e-5, dtype=self.dtype,
            name="W_1", scale_init=nn.initializers.zeros,
        )(y)
        return x + y


class DensePoseDeepLabHead(nn.Module):
    """ASPP (+ optional non-local) front end, then N stacked GN convs
    (reference ``roi_heads/deeplab.py:15-77``: ASPP keeps the input channel
    width; the conv stack maps to ``hidden_dim``, bias-free when normed)."""

    num_convs: int = 8
    hidden_dim: int = 512
    kernel: int = 3
    norm: str = "GN"
    use_nonlocal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _ASPP(out_channels=x.shape[-1], dtype=self.dtype, name="aspp")(x)
        if self.use_nonlocal:
            x = _NonLocal2D(dtype=self.dtype, name="nlblock")(x)
        p = self.kernel // 2
        for i in range(self.num_convs):
            x = nn.Conv(
                self.hidden_dim, (self.kernel, self.kernel),
                padding=[(p, p), (p, p)], use_bias=not self.norm,
                dtype=self.dtype, name=f"body_conv_fcn{i + 1}",
            )(x)
            if self.norm == "GN":
                x = nn.GroupNorm(
                    num_groups=_gn_groups(self.hidden_dim), epsilon=1e-5,
                    dtype=self.dtype, name=f"body_conv_fcn{i + 1}_norm",
                )(x)
            x = nn.relu(x)
        return x


class DensePoseChartPredictor(nn.Module):
    """4x deconv (k4 s2) + 2x bilinear upscale per output
    (predictors/chart.py:12-96): coarse segm (K=2), fine segm I (C=25),
    U (25), V (25) at HEATMAP_SIZE."""

    num_patches: int = 24
    num_coarse: int = 2
    deconv_kernel: int = 4
    up_scale: int = 2
    # confidence estimation (reference predictors/chart_confidence.py:12-160,
    # Neverova et al. NeurIPS 2019): "" disables, else "iid_iso"/"indep_aniso"
    uv_confidence_type: str = ""
    segm_confidence: bool = False
    confidence_eps: float = 0.01
    dtype: Any = jnp.float32

    def _deconv(self, x, features, name):
        k = self.deconv_kernel
        pad = k // 2 - 1
        return nn.ConvTranspose(
            features, (k, k), strides=(2, 2),
            padding=[(k - 1 - pad, k - 1 - pad)] * 2,
            transpose_kernel=True, dtype=self.dtype, name=name,
        )(x)

    @staticmethod
    def _interp2x(x):
        """Bilinear x2, align_corners=False (torch interpolate semantics)."""
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cp = self.num_patches + 1
        s = self._interp2x(self._deconv(x, self.num_coarse, "ann_index_lowres"))
        i_uv = self._interp2x(self._deconv(x, cp, "index_uv_lowres"))
        u = self._interp2x(self._deconv(x, cp, "u_lowres"))
        v = self._interp2x(self._deconv(x, cp, "v_lowres"))
        conf: Dict[str, jnp.ndarray] = {}
        if self.uv_confidence_type:
            assert self.uv_confidence_type in ("iid_iso", "indep_aniso")
            conf["sigma_2"] = self._interp2x(self._deconv(x, cp, "sigma_2_lowres"))
            if self.uv_confidence_type == "indep_aniso":
                conf["kappa_u"] = self._interp2x(self._deconv(x, cp, "kappa_u_lowres"))
                conf["kappa_v"] = self._interp2x(self._deconv(x, cp, "kappa_v_lowres"))
        if self.segm_confidence:
            # softplus+eps-scaled logits (chart_confidence.py:135-155): the
            # learned temperature sharpens/softens the segmentation CE
            fsc = jax.nn.softplus(
                self._interp2x(self._deconv(x, 1, "fine_segm_confidence_lowres"))
            ) + self.confidence_eps
            i_uv = i_uv * fsc
            csc = jax.nn.softplus(
                self._interp2x(self._deconv(x, 1, "coarse_segm_confidence_lowres"))
            ) + self.confidence_eps
            s = s * csc
            conf["fine_segm_confidence"] = fsc[..., 0]
            conf["coarse_segm_confidence"] = csc[..., 0]
        return s, i_uv, u, v, conf


class DensePoseModule(nn.Module):
    """head + predictor, the unit registered as the ROI extension module.

    ``head_name`` selects the feature extractor by the reference's registry
    key (``MODEL.ROI_DENSEPOSE_HEAD.NAME``): ``DensePoseV1ConvXHead`` (plain
    conv stack) or ``DensePoseDeepLabHead`` (ASPP front end)."""

    num_convs: int = 8
    hidden_dim: int = 512
    kernel: int = 3
    num_patches: int = 24
    num_coarse: int = 2
    deconv_kernel: int = 4
    head_name: str = "DensePoseV1ConvXHead"
    deeplab_norm: str = "GN"
    deeplab_nonlocal: bool = False
    uv_confidence_type: str = ""
    segm_confidence: bool = False
    confidence_eps: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False):
        if self.head_name == "DensePoseDeepLabHead":
            x = DensePoseDeepLabHead(
                num_convs=self.num_convs, hidden_dim=self.hidden_dim,
                kernel=self.kernel, norm=self.deeplab_norm,
                use_nonlocal=self.deeplab_nonlocal, dtype=self.dtype,
                name="head",
            )(pooled, train)
        else:
            x = DensePoseHead(
                num_convs=self.num_convs, hidden_dim=self.hidden_dim,
                kernel=self.kernel, dtype=self.dtype, name="head",
            )(pooled, train)
        return DensePoseChartPredictor(
            num_patches=self.num_patches, num_coarse=self.num_coarse,
            deconv_kernel=self.deconv_kernel,
            uv_confidence_type=self.uv_confidence_type,
            segm_confidence=self.segm_confidence,
            confidence_eps=self.confidence_eps,
            dtype=self.dtype,
            name="predictor",
        )(x, train)


def bilinear_at(grid: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample (H, W, C) at float grid coords (reference losses'
    _linear_interpolation_utilities convention: texel centers at integers,
    indices clamped)."""
    h, w, _ = grid.shape
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[:, None]
    v00, v01 = grid[y0, x0], grid[y0, x1]
    v10, v11 = grid[y1, x0], grid[y1, x1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


@ROI_HEAD_EXTENSION_REGISTRY.register()
class DensePoseExtension(ROIHeadExtension):
    """Chart-model DensePose as a pluggable ROI head."""

    name = "densepose"

    def __init__(self, cfg):
        super().__init__(cfg)
        c = cfg.MODEL.ROI_DENSEPOSE_HEAD
        self.pooler_resolution = int(c.POOLER_RESOLUTION)
        self.heatmap_size = int(c.HEATMAP_SIZE)
        self.num_patches = int(c.NUM_PATCHES)
        self.num_coarse = int(c.NUM_COARSE_SEGM_CHANNELS)
        self.num_convs = int(c.NUM_STACKED_CONVS)
        self.hidden_dim = int(c.CONV_HEAD_DIM)
        self.kernel = int(c.CONV_HEAD_KERNEL)
        self.deconv_kernel = int(c.DECONV_KERNEL)
        self.head_name = str(c.NAME)
        self.deeplab_norm = str(c.DEEPLAB.NORM)
        self.deeplab_nonlocal = bool(c.DEEPLAB.NONLOCAL_ON)
        self.w_points = float(c.POINT_REGRESSION_WEIGHTS)
        self.w_part = float(c.PART_WEIGHTS)
        self.w_segm = float(c.INDEX_WEIGHTS)
        self.max_dets = int(c.MAX_DETECTIONS)
        self.uv_conf_type = (
            str(c.UV_CONFIDENCE.TYPE) if c.UV_CONFIDENCE.ENABLED else ""
        )
        self.uv_conf_eps = float(c.UV_CONFIDENCE.EPSILON)
        self.segm_conf = bool(c.SEGM_CONFIDENCE.ENABLED)
        self.segm_conf_eps = float(c.SEGM_CONFIDENCE.EPSILON)

    def build_module(self, dtype):
        return DensePoseModule(
            num_convs=self.num_convs, hidden_dim=self.hidden_dim,
            kernel=self.kernel, num_patches=self.num_patches,
            num_coarse=self.num_coarse, deconv_kernel=self.deconv_kernel,
            head_name=self.head_name, deeplab_norm=self.deeplab_norm,
            deeplab_nonlocal=self.deeplab_nonlocal,
            uv_confidence_type=self.uv_conf_type,
            segm_confidence=self.segm_conf,
            confidence_eps=self.segm_conf_eps,  # loss applies UV's own eps
            dtype=dtype, name="densepose",
        )

    def init_shapes(self, channels: int):
        p = self.pooler_resolution
        return [((1, p, p, channels), None)]

    # -- training -------------------------------------------------------------
    def loss(self, ctx: ROIContext) -> Dict[str, jnp.ndarray]:
        batch = ctx.batch
        if "gt_dp_x" not in batch:
            return {}
        sampled, flat = ctx.sampled, ctx.flat_sampled
        n, s = sampled["boxes"].shape[:2]
        flat_boxes = flat["boxes"]  # (N*S, 4)
        batch_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), s)
        pooled = ctx.pool(flat_boxes, batch_idx, self.pooler_resolution)
        segm, i_uv, u, v, conf = ctx.apply(self.name, pooled, train=True)
        hs = segm.shape[1]

        # gather matched gt dense annotations per sampled roi
        def take(key):
            g = batch[key]  # (N, M, ...)
            idx = sampled["matched_idx"]  # (N, S)
            out = jnp.take_along_axis(
                g, idx.reshape(n, s, *(1,) * (g.ndim - 2)), axis=1
            )
            return out.reshape((n * s,) + g.shape[2:])

        dp_x = take("gt_dp_x").astype(jnp.float32)  # (R, P) in [0,256) gt-box
        dp_y = take("gt_dp_y").astype(jnp.float32)
        dp_i = take("gt_dp_I").astype(jnp.int32)  # (R, P) in [1..24]
        dp_u = take("gt_dp_U").astype(jnp.float32)
        dp_v = take("gt_dp_V").astype(jnp.float32)
        dp_valid = take("gt_dp_valid").astype(jnp.float32)  # (R, P)
        gt_boxes = flat["target_boxes"]  # (R, 4) matched gt boxes

        # annotated points -> image coords -> this proposal's heatmap grid
        gx0, gy0 = gt_boxes[:, 0:1], gt_boxes[:, 1:2]
        gw = jnp.maximum(gt_boxes[:, 2:3] - gx0, 1e-2)
        gh = jnp.maximum(gt_boxes[:, 3:4] - gy0, 1e-2)
        xi = gx0 + dp_x / 256.0 * gw  # (R, P) image coords
        yi = gy0 + dp_y / 256.0 * gh
        px0, py0 = flat_boxes[:, 0:1], flat_boxes[:, 1:2]
        pw = jnp.maximum(flat_boxes[:, 2:3] - px0, 1e-2)
        ph = jnp.maximum(flat_boxes[:, 3:4] - py0, 1e-2)
        gx = (xi - px0) / pw * hs  # heatmap grid coords
        gy = (yi - py0) / ph * hs
        inside = (gx >= 0) & (gx < hs) & (gy >= 0) & (gy < hs)
        fg = (flat["is_pos"] & (flat["weights"] > 0)).astype(jnp.float32)
        pt_w = dp_valid * inside.astype(jnp.float32) * fg[:, None]  # (R, P)
        # mirrored samples carry part/segm supervision only (the chart-space
        # U/V symmetry lookup is external data; data.py packs the mask)
        if "gt_dp_uv_valid" in batch:
            uv_w = pt_w * take("gt_dp_uv_valid").astype(jnp.float32)
        else:
            uv_w = pt_w

        sample = jax.vmap(bilinear_at)
        iuv_pts = sample(i_uv.astype(jnp.float32), gy, gx)  # (R, P, 25)
        u_pts = sample(u.astype(jnp.float32), gy, gx)
        v_pts = sample(v.astype(jnp.float32), gy, gx)

        # fine segmentation CE at points (mean over valid, x w_part)
        logp = jax.nn.log_softmax(iuv_pts, axis=-1)
        ce_i = -jnp.take_along_axis(logp, dp_i[..., None], axis=-1)[..., 0]
        n_pts = jnp.maximum(pt_w.sum(), 1.0)
        loss_i = (ce_i * pt_w).sum() / n_pts * self.w_part

        # U/V at points on the GT part channel
        u_est = jnp.take_along_axis(u_pts, dp_i[..., None], axis=-1)[..., 0]
        v_est = jnp.take_along_axis(v_pts, dp_i[..., None], axis=-1)[..., 0]

        uv_losses: Dict[str, jnp.ndarray] = {}
        if self.uv_conf_type:
            # Gaussian NLL with learned confidence replaces smooth-L1
            # (reference densepose_losses.py:434-520 + :699-713;
            # Neverova et al. NeurIPS 2019). sigma^2 lower-bounded by eps.
            sig_pts = sample(conf["sigma_2"].astype(jnp.float32), gy, gx)
            sig = jnp.take_along_axis(sig_pts, dp_i[..., None], axis=-1)[..., 0]
            sigma2 = jax.nn.softplus(sig) + self.uv_conf_eps
            du, dv = u_est - dp_u, v_est - dp_v
            delta2 = du * du + dv * dv
            log2pi = float(np.log(2.0 * np.pi))
            if self.uv_conf_type == "iid_iso":
                nll = 0.5 * (log2pi + 2.0 * jnp.log(sigma2) + delta2 / sigma2)
            else:  # indep_aniso: Sigma = sigma^2 I + r r^T
                ku_pts = sample(conf["kappa_u"].astype(jnp.float32), gy, gx)
                kv_pts = sample(conf["kappa_v"].astype(jnp.float32), gy, gx)
                ku = jnp.take_along_axis(ku_pts, dp_i[..., None], axis=-1)[..., 0]
                kv = jnp.take_along_axis(kv_pts, dp_i[..., None], axis=-1)[..., 0]
                r2 = ku * ku + kv * kv
                dr = du * ku + dv * kv
                denom2 = sigma2 * (sigma2 + r2)
                nll = 0.5 * (
                    log2pi + jnp.log(denom2) + delta2 / sigma2 - dr * dr / denom2
                )
            uv_losses["loss_densepose_UV"] = (nll * uv_w).sum() * self.w_points
        else:

            def smooth_l1(d):
                ad = jnp.abs(d)
                return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)

            uv_losses["loss_densepose_U"] = (
                (smooth_l1(u_est - dp_u) * uv_w).sum() * self.w_points
            )
            uv_losses["loss_densepose_V"] = (
                (smooth_l1(v_est - dp_v) * uv_w).sum() * self.w_points
            )

        # coarse segmentation CE against the gt fg raster resampled into the
        # proposal window (reference n_segm_chan==2 branch, :724-727)
        gt_crop = jax.vmap(
            lambda rast, gb, midx, rois: crop_gt_masks(
                rast.astype(jnp.float32), gb, midx, rois, hs
            )
        )(
            batch["gt_dp_segm"].astype(jnp.float32),
            batch["gt_boxes"],
            sampled["matched_idx"],
            sampled["boxes"],
        ).reshape(n * s, hs, hs)
        seg_t = (gt_crop > 0.5).astype(jnp.int32)
        seg_logp = jax.nn.log_softmax(segm.astype(jnp.float32), axis=-1)
        ce_s = -jnp.take_along_axis(seg_logp, seg_t[..., None], axis=-1)[..., 0]
        # only rois with at least one annotated point carry dense supervision
        has_dp = (pt_w.sum(axis=1) > 0).astype(jnp.float32)  # (R,)
        n_fg = jnp.maximum(has_dp.sum(), 1.0)
        loss_s = (
            (ce_s.mean(axis=(1, 2)) * has_dp).sum() / n_fg * self.w_segm
        )

        return {
            "loss_densepose_I": loss_i,
            "loss_densepose_S": loss_s,
            **uv_losses,
        }

    # -- inference ------------------------------------------------------------
    def inference(self, ctx: ROIContext) -> Dict[str, jnp.ndarray]:
        dets = ctx.dets
        n, k = dets["boxes"].shape[:2]
        kk = min(k, self.max_dets)
        boxes = dets["boxes"][:, :kk].reshape(n * kk, 4)
        det_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), kk)
        pooled = ctx.pool(boxes, det_idx, self.pooler_resolution)
        segm, i_uv, u, v, conf = ctx.apply(self.name, pooled, train=False)
        hs = segm.shape[1]
        coarse_fg = jnp.argmax(segm, axis=-1) > 0  # (R, S, S)
        labels = jnp.argmax(i_uv, axis=-1)  # (R, S, S) in [0..24]
        labels = jnp.where(coarse_fg, labels, 0).astype(jnp.uint8)
        u_sel = jnp.take_along_axis(u, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
        v_sel = jnp.take_along_axis(v, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
        # zero-pad back to the full detection capacity so every Instances
        # field shares one length (padding = "no dense output")
        def pad(a):
            a = a.reshape(n, kk, hs, hs)
            return jnp.pad(a, ((0, 0), (0, k - kk), (0, 0), (0, 0)))

        out = {
            "dp_labels": pad(labels),
            "dp_u": pad(jnp.clip(u_sel, 0.0, 1.0)),
            "dp_v": pad(jnp.clip(v_sel, 0.0, 1.0)),
        }
        if self.uv_conf_type:
            # per-texel UV variance at the predicted part (reference
            # ToChartResultConverterWithConfidences semantics)
            sig_sel = jnp.take_along_axis(
                conf["sigma_2"], labels[..., None].astype(jnp.int32), axis=-1
            )[..., 0]
            out["dp_sigma_2"] = pad(
                jax.nn.softplus(sig_sel) + self.uv_conf_eps
            )
        return out
