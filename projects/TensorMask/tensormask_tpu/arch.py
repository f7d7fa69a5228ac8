"""TensorMask meta-architecture, TPU-native.

Capability match for ``/root/reference/projects/TensorMask/tensormask/arch.py``
(913 LoC): dense sliding-window instance segmentation with the aligned mask
representation, SwapAlign2Nat, and the bipyramid head.

TPU redesign (same contract as the framework's RetinaNet/CenterNet):

  * one flax module, fixed shapes, a jitted ``loss_fn``/``predict_fn``;
  * ``SwapAlign2Nat`` is the einsum formulation in
    ``detectron2_centernet_tpu/ops/swap_align2nat.py`` — no CUDA kernel;
  * the assignment rule (containment + scale + spatial centrality,
    arch.py:42-132) is a dense vectorized (M gt x R anchor) computation under
    ``vmap`` instead of per-image tensor indexing;
  * the mask loss supervises up to ``MAX_MASKS_PER_LEVEL`` foreground anchors
    per (image, level, anchor-type) — fixed-K selection via ``top_k`` —
    with gt targets cropped on device from the ``(M, R, R)`` gt-box-relative
    rasters the data mapper already produces (reference crops polygon masks
    host-side per iteration, arch.py:596-604);
  * inference returns fixed-K detections plus their (level, anchor, cell)
    provenance; mask logits stay in per-level maps and the host gathers +
    pastes the kept ones (``postprocess``).
"""

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from detectron2_centernet_tpu.config import CfgNode
from detectron2_centernet_tpu.models.anchors import build_anchor_generator
from detectron2_centernet_tpu.models.box_regression import Box2BoxTransform
from detectron2_centernet_tpu.models.meta_arch.retinanet import (
    optax_sigmoid_ce,
    smooth_l1,
)
from detectron2_centernet_tpu.models.registry import (
    BACKBONE_REGISTRY,
    META_ARCH_REGISTRY,
)
from detectron2_centernet_tpu.models.roi_heads.mask_head import crop_gt_masks
from detectron2_centernet_tpu.ops.nms import batched_nms_fixed
from detectron2_centernet_tpu.ops.swap_align2nat import swap_align2nat
from detectron2_centernet_tpu.structures import Boxes, Instances

__all__ = ["TensorMask", "TensorMaskHead", "sigmoid_focal_loss_star"]


def sigmoid_focal_loss_star(logits, targets, alpha: float, gamma: float):
    """fvcore's ``sigmoid_focal_loss_star`` (the TensorMask paper's focal
    variant): -logsigmoid(gamma * logits * (2t - 1)) / gamma, alpha-weighted."""
    shifted = gamma * (logits * (2.0 * targets - 1.0))
    loss = -jax.nn.log_sigmoid(shifted) / gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


class TensorMaskHead(nn.Module):
    """cls/box/mask towers over the pyramid (reference arch.py:637-913).

    Returns per level: cls logits (N, H, W, A*K), box deltas (N, H, W, A*4),
    and per (level, anchor-type) natural-representation mask logits
    (N, H_l, W_l, (m*lam)^2) when mask_on.
    """

    num_classes: int
    num_anchors: int
    mask_sizes: Tuple[int, ...]
    num_convs: int = 4
    cls_channels: int = 256
    bbox_channels: int = 128
    mask_channels: int = 128
    mask_on: bool = True
    align_on: bool = True
    bipyramid_on: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        w_init = nn.initializers.normal(0.01)
        prior_bias = nn.initializers.constant(
            -math.log((1 - 0.01) / 0.01)
        )

        def tower(name, channels):
            convs = [
                nn.Conv(channels, (3, 3), padding="SAME", kernel_init=w_init,
                        dtype=self.dtype, name=f"{name}{i}")
                for i in range(self.num_convs)
            ]

            def run(x):
                for c in convs:
                    x = nn.relu(c(x))
                return x

            return run

        cls_tower = tower("cls_subnet", self.cls_channels)
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            kernel_init=w_init, bias_init=prior_bias, dtype=jnp.float32,
            name="cls_score",
        )
        box_tower = tower("bbox_subnet", self.bbox_channels)
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME", kernel_init=w_init,
            dtype=jnp.float32, name="bbox_pred",
        )

        logits = [cls_score(cls_tower(f).astype(jnp.float32)) for f in feats]
        deltas = [bbox_pred(box_tower(f).astype(jnp.float32)) for f in feats]

        masks = None
        if self.mask_on:
            mask_tower = tower("mask_subnet", self.mask_channels)
            mask_feats = [mask_tower(f) for f in feats]
            if self.bipyramid_on:
                # upsample every level to the finest resolution and fuse with
                # it (reference arch.py:883-897)
                hi = mask_feats[0]
                h2, w2 = hi.shape[1], hi.shape[2]
                fuse = nn.Conv(
                    self.mask_channels, (3, 3), padding="SAME",
                    kernel_init=w_init, dtype=self.dtype, name="mask_fuse",
                )
                fused = []
                for lvl, mf in enumerate(mask_feats):
                    up = mf
                    if lvl > 0:
                        lam = 2 ** lvl
                        up = jax.image.resize(
                            mf,
                            (mf.shape[0], mf.shape[1] * lam, mf.shape[2] * lam,
                             mf.shape[3]),
                            method="bilinear",
                        )[:, :h2, :w2, :]
                    fused.append(nn.relu(fuse(up + hi)))
                mask_feats = fused

            preds = [
                nn.Conv(m * m, (1, 1), kernel_init=w_init, dtype=jnp.float32,
                        name=f"mask_pred_{m:02d}")
                for m in self.mask_sizes
            ]
            masks = []
            for lvl, mf in enumerate(mask_feats):
                lam = 2 ** lvl if self.bipyramid_on else 1
                per_anchor = []
                for anc, m in enumerate(self.mask_sizes):
                    cur = preds[anc](mf.astype(jnp.float32))
                    if self.align_on:
                        cur = swap_align2nat(cur, m, m, lam)
                    per_anchor.append(cur)
                masks.append(per_anchor)
        return logits, deltas, masks


class TensorMaskModel(nn.Module):
    backbone: nn.Module
    in_features: Tuple[str, ...]
    head_cfg: Dict[str, Any]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images.astype(self.dtype), train)
        feats = [feats[f] for f in self.in_features]
        return TensorMaskHead(
            dtype=self.dtype, name="head", **self.head_cfg
        )(feats, train)


@META_ARCH_REGISTRY.register()
class TensorMask:
    """Functional meta-arch implementing the framework-wide contract."""

    def __init__(self, cfg: CfgNode) -> None:
        t = cfg.MODEL.TENSOR_MASK
        self.num_classes = int(t.NUM_CLASSES)
        self.in_features = tuple(t.IN_FEATURES)
        self.focal_alpha = float(t.FOCAL_LOSS_ALPHA)
        self.focal_gamma = float(t.FOCAL_LOSS_GAMMA)
        self.score_threshold = float(t.SCORE_THRESH_TEST)
        self.topk_candidates = int(t.TOPK_CANDIDATES_TEST)
        self.nms_threshold = float(t.NMS_THRESH_TEST)
        self.max_detections = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        self.mask_on = bool(cfg.MODEL.MASK_ON)
        self.mask_loss_weight = float(t.MASK_LOSS_WEIGHT)
        self.mask_pos_weight = float(t.POSITIVE_WEIGHT)
        self.align_on = bool(t.ALIGNED_ON)
        self.bipyramid_on = bool(t.BIPYRAMID_ON)
        self.max_masks = int(t.MAX_MASKS_PER_LEVEL)

        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
        self.dtype = dtype

        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
        self.strides = [strides[f] for f in self.in_features]
        self.num_levels = len(self.strides)
        self.anchor_generator = build_anchor_generator(cfg, self.strides)
        self.num_anchors = self.anchor_generator.num_anchors[0]
        assert all(n == self.num_anchors for n in self.anchor_generator.num_anchors)
        sizes_lvl0 = list(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0])
        self.mask_sizes = tuple(int(s) // self.strides[0] for s in sizes_lvl0)
        self.min_anchor_size = float(min(sizes_lvl0) - self.strides[0])
        self.box2box = Box2BoxTransform(tuple(t.BBOX_REG_WEIGHTS))

        backbone = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg, dtype=dtype)
        self.module = TensorMaskModel(
            backbone=backbone,
            in_features=self.in_features,
            head_cfg=dict(
                num_classes=self.num_classes,
                num_anchors=self.num_anchors,
                mask_sizes=self.mask_sizes,
                num_convs=int(t.NUM_CONVS),
                cls_channels=int(t.CLS_CHANNELS),
                bbox_channels=int(t.BBOX_CHANNELS),
                mask_channels=int(t.MASK_CHANNELS),
                mask_on=self.mask_on,
                align_on=self.align_on,
                bipyramid_on=self.bipyramid_on,
            ),
            dtype=dtype,
        )

    # -- shared plumbing ------------------------------------------------------
    def init(self, rng: jax.Array, image_size: Tuple[int, int] = (512, 512)):
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        return self.module.init(rng, dummy, train=False)

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(jnp.float32)
        return (x - self.pixel_mean) / self.pixel_std

    def _anchors_unit_lengths(self, image_hw):
        grid_sizes = [
            (-(-image_hw[0] // s), -(-image_hw[1] // s)) for s in self.strides
        ]
        per_level = self.anchor_generator.grid_anchors(grid_sizes)
        units = np.concatenate(
            [np.full((a.shape[0],), s, np.float32)
             for a, s in zip(per_level, self.strides)]
        )
        return np.concatenate(per_level, 0), units, [a.shape[0] for a in per_level]

    # -- assignment (reference _assignment_rule, arch.py:42-132) -------------
    def assign(self, gt_boxes, gt_classes, gt_valid, anchors, units):
        """Per image.  Returns (matches (R,) int32, fg (R,) bool)."""
        m = gt_boxes.shape[0]
        # containment: anchor must contain the gt box
        lt = jnp.minimum(gt_boxes[:, None, :2], anchors[None, :, :2])
        rb = jnp.maximum(gt_boxes[:, None, 2:], anchors[None, :, 2:])
        contain = jnp.all(
            jnp.concatenate([lt, rb], axis=2) == anchors[None], axis=2
        )
        # scale: anchor size (minus unit) must not exceed 2x gt max side
        gt_size = jnp.max(gt_boxes[:, 2:] - gt_boxes[:, :2], axis=1)
        gt_upper = jnp.maximum(gt_size * 2.0, self.min_anchor_size)
        anc_size = jnp.max(anchors[:, 2:] - anchors[:, :2], axis=1) - units
        scale_ok = (gt_upper[:, None] - anc_size[None, :]) >= 0
        # spatial: centers within one unit length
        gt_c = (gt_boxes[:, 2:] + gt_boxes[:, :2]) / 2.0
        anc_c = (anchors[:, 2:] + anchors[:, :2]) / 2.0
        off = (gt_c[:, None, :] - anc_c[None, :, :]) / units[None, :, None]
        spatial_ok = jnp.sum(off * off, axis=2) <= 1.0

        assign = contain & scale_ok & spatial_ok & gt_valid[:, None]
        matched = jnp.any(assign, axis=0)
        matches = jnp.argmax(assign, axis=0).astype(jnp.int32)
        unique = jnp.sum(assign, axis=0) == 1  # uniqueness_on drops shared
        fg = matched & unique
        return matches, fg

    # -- training -------------------------------------------------------------
    def loss_fn(self, params, batch_stats, batch):
        images = self.normalize(batch["image"])
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (logits, deltas, masks), mutated = self.module.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        n, h, w, _ = images.shape
        anchors_np, units_np, counts = self._anchors_unit_lengths((h, w))
        anchors = jnp.asarray(anchors_np)
        units = jnp.asarray(units_np)

        matches, fg = jax.vmap(self.assign, in_axes=(0, 0, 0, None, None))(
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
            anchors, units,
        )  # (N, R)
        num_fg = jnp.maximum(fg.sum().astype(jnp.float32), 1.0)

        cls_list = [
            lg.reshape(lg.shape[0], -1, self.num_classes) for lg in logits
        ]
        box_list = [bx.reshape(bx.shape[0], -1, 4) for bx in deltas]
        cls_pred = jnp.concatenate(cls_list, axis=1)  # (N, R, K)
        box_pred = jnp.concatenate(box_list, axis=1)  # (N, R, 4)

        matched_cls = jnp.take_along_axis(
            batch["gt_classes"].astype(jnp.int32), matches, axis=1
        )
        targets = jax.nn.one_hot(
            jnp.where(fg, matched_cls, self.num_classes),
            self.num_classes, dtype=jnp.float32,
        )
        cls_loss = sigmoid_focal_loss_star(
            cls_pred, targets, self.focal_alpha, self.focal_gamma
        ).sum() / num_fg

        matched_boxes = jnp.take_along_axis(
            batch["gt_boxes"], matches[..., None], axis=1
        )
        deltas_gt = self.box2box.get_deltas(anchors[None], matched_boxes)
        reg = smooth_l1(box_pred, deltas_gt, beta=0.0)
        reg_loss = jnp.where(fg[..., None], reg, 0.0).sum() / num_fg

        loss_dict = {"loss_cls": cls_loss, "loss_box_reg": reg_loss}
        total = cls_loss + reg_loss

        if self.mask_on and masks is not None and "gt_masks" in batch:
            mask_loss = self._mask_loss(
                masks, batch, anchors, matches, fg, counts, num_fg
            )
            loss_dict["loss_mask"] = mask_loss
            total = total + mask_loss

        new_stats = mutated.get("batch_stats", batch_stats)
        return total, (loss_dict, new_stats)

    def _mask_loss(self, masks, batch, anchors, matches, fg, counts, num_fg):
        """Fixed-K per (level, anchor-type) mask BCE (reference losses,
        arch.py:466-499)."""
        loss = 0.0
        offset = 0
        kq = self.max_masks
        for lvl in range(self.num_levels):
            lam = 2 ** lvl if self.bipyramid_on else 1
            r_lvl = counts[lvl]
            # anchors in this level come in cell-major (H*W, A) order
            for anc in range(self.num_anchors):
                size = self.mask_sizes[anc] * lam
                pred_map = masks[lvl][anc]  # (N, H_l, W_l, size^2)
                nb = pred_map.shape[0]
                cells = r_lvl // self.num_anchors
                sl = slice(offset, offset + r_lvl)
                fg_la = fg[:, sl].reshape(nb, cells, self.num_anchors)[
                    :, :, anc
                ]  # (N, cells)
                match_la = matches[:, sl].reshape(nb, cells, self.num_anchors)[
                    :, :, anc
                ]
                anchors_la = anchors[sl].reshape(cells, self.num_anchors, 4)[
                    :, anc
                ]
                # fixed-K fg selection (scores: fg first, stable cell order)
                score = fg_la.astype(jnp.float32)
                k = min(kq, cells)
                _, sel = jax.lax.top_k(score, k)  # (N, k)
                sel_fg = jnp.take_along_axis(fg_la, sel, axis=1)
                sel_match = jnp.take_along_axis(match_la, sel, axis=1)
                sel_anchor = anchors_la[sel]  # (N, k, 4)

                flat = pred_map.reshape(nb, cells, size * size)
                sel_pred = jnp.take_along_axis(
                    flat, sel[..., None], axis=1
                ).reshape(nb * k, size, size)

                gt_t = jax.vmap(
                    lambda rasters, gb, midx, rois: crop_gt_masks(
                        rasters, gb, midx, rois, size
                    )
                )(
                    batch["gt_masks"], batch["gt_boxes"], sel_match, sel_anchor
                ).reshape(nb * k, size, size)
                gt_t = (gt_t > 0.5).astype(jnp.float32)

                ce = optax_sigmoid_ce(sel_pred, gt_t)
                # pos_weight multiplies the positive-label term (torch BCE
                # semantics): ce + (pw - 1) * t * softplus(-logit)
                ce = ce + (self.mask_pos_weight - 1.0) * gt_t * (
                    jnp.log1p(jnp.exp(-jnp.abs(sel_pred)))
                    + jnp.maximum(-sel_pred, 0.0)
                )
                wmask = sel_fg.reshape(-1).astype(jnp.float32)
                per = ce.sum(axis=(1, 2)) * wmask
                loss = loss + per.sum() * (self.mask_loss_weight / (size * size))
            offset += r_lvl
        return loss / num_fg

    # -- inference ------------------------------------------------------------
    def predict_fn(self, variables, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Fixed-K detections + provenance; per-level mask logit maps ride
        along for the host to gather (mask sizes differ per level/anchor)."""
        x = self.normalize(images)
        logits, deltas, masks = self.module.apply(variables, x, train=False)
        n, h, w, _ = x.shape
        grid_sizes = [(-(-h // s), -(-w // s)) for s in self.strides]
        anchors_per_level = [
            jnp.asarray(a) for a in self.anchor_generator.grid_anchors(grid_sizes)
        ]

        def decode_one(cls_list, box_list):
            cand = {"boxes": [], "scores": [], "classes": [], "prov": [],
                    "anchors": []}
            for lvl, (lg, bx, anc) in enumerate(
                zip(cls_list, box_list, anchors_per_level)
            ):
                scores = jax.nn.sigmoid(lg.reshape(-1).astype(jnp.float32))
                k = min(self.topk_candidates // self.num_levels, scores.shape[0])
                top_scores, idx = jax.lax.top_k(scores, k)
                anchor_idx = idx // self.num_classes
                cls_idx = (idx % self.num_classes).astype(jnp.int32)
                anchor_boxes = anc[anchor_idx]
                boxes = self.box2box.apply_deltas(
                    bx.reshape(-1, 4)[anchor_idx], anchor_boxes
                )
                keep = top_scores > self.score_threshold
                cand["boxes"].append(boxes)
                cand["scores"].append(jnp.where(keep, top_scores, -jnp.inf))
                cand["classes"].append(cls_idx)
                cand["anchors"].append(anchor_boxes)
                # provenance: (lvl, cell, anchor-type) for host mask lookup
                cell = anchor_idx // self.num_anchors
                anc_t = anchor_idx % self.num_anchors
                cand["prov"].append(
                    jnp.stack(
                        [jnp.full_like(cls_idx, lvl), cell.astype(jnp.int32),
                         anc_t.astype(jnp.int32)], axis=1
                    )
                )
            boxes = jnp.concatenate(cand["boxes"], 0)
            scores = jnp.concatenate(cand["scores"], 0)
            classes = jnp.concatenate(cand["classes"], 0)
            prov = jnp.concatenate(cand["prov"], 0)
            anchor_boxes = jnp.concatenate(cand["anchors"], 0)
            keep_idx, keep_valid = batched_nms_fixed(
                boxes, scores, classes, self.nms_threshold, self.max_detections
            )
            return {
                "boxes": boxes[keep_idx],
                "scores": jnp.where(keep_valid, scores[keep_idx], 0.0),
                "classes": classes[keep_idx],
                "prov": prov[keep_idx],
                # masks are pasted at the *anchor* windows (reference
                # _postprocess, arch.py:224-230)
                "anchors": anchor_boxes[keep_idx],
            }

        out = jax.vmap(lambda cl, bl: decode_one(list(cl), list(bl)))(
            tuple(logits), tuple(deltas)
        )
        if self.mask_on and masks is not None:
            for lvl in range(self.num_levels):
                for anc in range(self.num_anchors):
                    out[f"mask_{lvl}_{anc}"] = masks[lvl][anc]
        return out

    # -- host boundary --------------------------------------------------------
    def postprocess(self, dets, warps, orig_sizes) -> List[Dict[str, Instances]]:
        from detectron2_centernet_tpu.structures.masks import (
            paste_masks_in_image,
        )

        boxes = np.asarray(dets["boxes"])
        scores = np.asarray(dets["scores"])
        classes = np.asarray(dets["classes"])
        prov = np.asarray(dets["prov"]) if "prov" in dets else None
        anchors = np.asarray(dets["anchors"]) if "anchors" in dets else None
        results = []
        for i, (oh, ow) in enumerate(orig_sizes):
            keep = scores[i] > self.score_threshold
            b, s, c = boxes[i][keep], scores[i][keep], classes[i][keep]
            if warps is not None:
                from detectron2_centernet_tpu.data.detection_utils import (
                    unwarp_boxes,
                )

                b = unwarp_boxes(warps[i], b)
            inst = Instances((oh, ow))
            bx = Boxes(b.astype(np.float32))
            bx.clip((oh, ow))
            inst.pred_boxes = bx
            inst.scores = s.astype(np.float32)
            inst.pred_classes = c.astype(np.int64)
            if self.mask_on and prov is not None and keep.any():
                pv = prov[i][keep]
                anc_boxes = anchors[i][keep]
                if warps is not None:
                    anc_boxes = unwarp_boxes(warps[i], anc_boxes)
                pasted = np.zeros((pv.shape[0], oh, ow), bool)
                for d in range(pv.shape[0]):
                    lvl, cell, anc = int(pv[d, 0]), int(pv[d, 1]), int(pv[d, 2])
                    mmap = np.asarray(dets[f"mask_{lvl}_{anc}"][i])
                    wl = mmap.shape[1]
                    size = self.mask_sizes[anc] * (
                        2 ** lvl if self.bipyramid_on else 1
                    )
                    y_c, x_c = cell // wl, cell % wl
                    soft = 1.0 / (1.0 + np.exp(
                        -mmap[y_c, x_c].reshape(size, size)
                    ))
                    # masks live in the anchor window (reference arch.py:680)
                    pasted[d] = paste_masks_in_image(
                        soft[None], anc_boxes[d : d + 1], (oh, ow)
                    )[0]
                inst.pred_masks = pasted
            results.append({"instances": inst})
        return results
