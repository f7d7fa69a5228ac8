"""CenterNet ("Objects as Points", ctdet) meta-architecture.

Capability match for the reference ``detectron2/modeling/meta_arch/centernet.py``
re-designed functionally for TPU:

  * the network is one flax module (backbone → per-task heads) compiled once;
  * ground-truth heatmap/wh/reg targets are rendered **on device, vectorized**
    (ops/target_gen.py) instead of the reference's per-object numpy loop
    inside forward (centernet.py:186-189) — same tensors, no host hot loop;
  * inference decodes a *fixed* K=TOPK_CANDIDATES_TEST detections per image
    under jit (ops/decode.py, reference ctdet_decode centernet.py:426-458);
    score thresholding and the variable-length ``Instances`` happen at the
    host boundary (``postprocess``);
  * losses are the CornerNet-style focal loss with per-class alpha weighting
    (reference ``_neg_loss`` centernet.py:333-369) and the masked-gather L1
    (``RegL1Loss`` centernet.py:372-381), numerically identical formulas.

Batch dict contract (all device arrays, fixed shapes):
  image      (N, H, W, 3) float32, raw 0..255 RGB/BGR per INPUT.FORMAT
  gt_boxes   (N, M, 4) XYXY in network-input pixels   (train only)
  gt_classes (N, M) int32                             (train only)
  gt_valid   (N, M) bool                              (train only)
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import CfgNode
from ...data.catalog import DatasetCatalog, MetadataCatalog
from ...ops.decode import ctdet_decode
from ...ops.target_gen import gen_centernet_targets_batch
from ...structures import Boxes, Instances
from ..registry import BACKBONE_REGISTRY, META_ARCH_REGISTRY


class CenterNetHeads(nn.Module):
    """Per-task prediction heads: 3x3 conv(HEAD_CONV) + ReLU + 1x1 conv.

    The hm head's final bias starts at -2.19 = -log((1-0.1)/0.1) so the
    initial heatmap probability is ~0.1 (reference centernet.py:112-134).
    """

    heads: Tuple[Tuple[str, int], ...]  # (("hm", C), ("reg", 2), ("wh", 2))
    head_conv: int = 256
    final_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        z = {}
        for name, nout in self.heads:
            h = y
            if self.head_conv > 0:
                h = nn.Conv(
                    self.head_conv,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    name=f"{name}_tower",
                )(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(-2.19)
                if name == "hm"
                else nn.initializers.zeros
            )
            z[name] = nn.Conv(
                nout,
                (self.final_kernel, self.final_kernel),
                padding="SAME",
                bias_init=bias_init,
                dtype=jnp.float32,  # head outputs stay f32 for stable loss/decode
                name=f"{name}_out",
            )(h.astype(jnp.float32))
        return z


class DeconvNeck(nn.Module):
    """Deconv upsampler for dict-output trunks (ResNet/VoVNet paths,
    reference centernet.py:70-109,268-320): stride-16 feature -> 2x
    [ConvTranspose(256, k4, s2) + BN + ReLU] -> stride-4 map."""

    trunk: nn.Module
    feature: str  # "res4" | "stage4"
    head_channels: int = 256
    num_deconv: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = self.trunk(x, train)[self.feature]
        for i in range(self.num_deconv):
            y = nn.ConvTranspose(
                self.head_channels, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, name=f"deconv{i}",
            )(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"deconv{i}_bn",
            )(y)
            y = nn.relu(y)
        return y


class CenterNetModel(nn.Module):
    """backbone → heads. Input is already normalized NHWC."""

    backbone: nn.Module
    heads: Tuple[Tuple[str, int], ...]
    head_conv: int = 256
    final_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        y = self.backbone(images.astype(self.dtype), train)
        return CenterNetHeads(
            self.heads, self.head_conv, self.final_kernel, dtype=self.dtype, name="heads"
        )(y)


def focal_loss(
    hm_logits: jnp.ndarray,  # (N, H, W, C)
    gt_hm: jnp.ndarray,  # (N, H, W, C)
    alpha: jnp.ndarray,  # (C,)
) -> jnp.ndarray:
    """CornerNet-style modified focal loss (reference _neg_loss,
    centernet.py:333-369): pos term weighted per class by alpha, neg term
    down-weighted by (1-gt)^4, normalized by the number of positives."""
    pred = jnp.clip(jax.nn.sigmoid(hm_logits.astype(jnp.float32)), 1e-4, 1 - 1e-4)
    gt = gt_hm.astype(jnp.float32)
    pos = (gt == 1.0).astype(jnp.float32)
    neg = (gt < 1.0).astype(jnp.float32)
    neg_weights = (1.0 - gt) ** 4

    pos_loss = jnp.log(pred) * (1.0 - pred) ** 2 * pos
    neg_loss = jnp.log(1.0 - pred) * pred ** 2 * neg_weights * neg

    num_pos = pos.sum()
    pos_total = (alpha[None, None, None, :] * pos_loss).sum()
    neg_total = neg_loss.sum()
    return jnp.where(
        num_pos == 0.0,
        -neg_total,
        -(pos_total + neg_total) / jnp.maximum(num_pos, 1.0),
    )


def reg_l1_loss(
    out: jnp.ndarray,  # (N, H, W, 2) head output
    mask: jnp.ndarray,  # (N, M) float validity
    ind: jnp.ndarray,  # (N, M) int32 flattened center indices
    target: jnp.ndarray,  # (N, M, 2)
) -> jnp.ndarray:
    """Masked L1 on features gathered at gt centers (reference RegL1Loss,
    centernet.py:372-381; normalizer counts the expanded (N, M, 2) mask)."""
    n, h, w, c = out.shape
    flat = out.astype(jnp.float32).reshape(n, h * w, c)
    pred = jnp.take_along_axis(flat, ind[:, :, None].astype(jnp.int32), axis=1)
    m = jnp.broadcast_to(mask[:, :, None].astype(jnp.float32), pred.shape)
    num = jnp.abs(pred * m - target.astype(jnp.float32) * m).sum()
    return num / (m.sum() + 1e-4)


def _resolve_alpha(alpha_cfg, num_classes: int) -> np.ndarray:
    """Reference alpha list handling (centernet.py:341-349)."""
    alpha = list(alpha_cfg) if isinstance(alpha_cfg, (list, tuple)) else [alpha_cfg]
    if len(alpha) == 1:
        alpha = alpha * num_classes
    elif len(alpha) < num_classes:
        alpha = alpha + [1.0] * (num_classes - len(alpha))
    return np.asarray(alpha[:num_classes], np.float32)


@META_ARCH_REGISTRY.register()
class CenterNet:
    """Functional meta-arch: owns the flax module + pure loss/predict fns.

    Unlike the reference (centernet.py:59-63), constructing the model does
    not *require* a registered dataset: class count falls back to
    MODEL.CENTERNET.TASK.HM when DATASETS.TRAIN is empty or unregistered —
    fixing the coupling SURVEY.md §4 flags as blocking e2e tests.
    """

    def __init__(self, cfg: CfgNode) -> None:
        c = cfg.MODEL.CENTERNET
        self.num_classes = int(c.TASK.HM)
        self.metadata = None
        train_sets = tuple(cfg.DATASETS.TRAIN)
        if train_sets and train_sets[0] in DatasetCatalog:
            self.metadata = MetadataCatalog.get(train_sets[0])
            thing_classes = self.metadata.get("thing_classes")
            if thing_classes is not None:
                self.num_classes = len(thing_classes)

        self.down_ratio = int(c.DOWN_RATIO)
        self.score_threshold = float(c.SCORE_THRESH_TEST)
        self.topk_candidates = int(c.TOPK_CANDIDATES_TEST)
        self.max_detections = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        self.max_objs = int(c.MAX_OBJS)
        self.hm_weight = float(c.HM_WEIGHT)
        self.wh_weight = float(c.WH_WEIGHT)
        self.off_weight = float(c.OFF_WEIGHT)
        self.alpha = _resolve_alpha(c.FOCAL_LOSS_ALPHA, self.num_classes)
        self.size_divisibility = int(c.SIZE_DIVISIBILITY)
        # TEST.EXACT_MODE forces the bit-comparable decode path (exact
        # top-k + f32 scores), overriding the TPU fast-path knobs
        self.exact_mode = bool(cfg.TEST.EXACT_MODE)
        self.approx_topk = bool(cfg.TPU.APPROX_TOPK) and not self.exact_mode

        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)

        dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
        self.dtype = dtype
        backbone_builder = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
        backbone = backbone_builder(cfg, dtype=dtype)
        # dict-output trunks get the deconv neck (reference forces
        # down_ratio 4 / size_div 16 for these paths, centernet.py:70-109)
        from ..backbones.resnet import ResNet
        from ..backbones.vovnet import VoVNet

        if isinstance(backbone, ResNet):
            backbone = DeconvNeck(trunk=backbone, feature="res4", dtype=dtype)
        elif isinstance(backbone, VoVNet):
            backbone = DeconvNeck(trunk=backbone, feature="stage4", dtype=dtype)
        self.backbone = backbone
        heads = (("hm", self.num_classes), ("reg", 2), ("wh", 2))
        self.module = CenterNetModel(
            backbone=self.backbone,
            heads=heads,
            head_conv=int(c.HEAD_CONV),
            final_kernel=int(c.FINAL_KERNEL),
            dtype=dtype,
        )

    # -- parameter init ------------------------------------------------------
    def init(self, rng: jax.Array, image_size: Tuple[int, int] = (512, 512)):
        """Initialize all variables ({'params', 'batch_stats'})."""
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        return self.module.init(rng, dummy, train=False)

    # -- pure functions used by jitted steps ----------------------------------
    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        """x/255 then (x - mean)/std (reference preprocess_image,
        centernet.py:177-183; ctdet configs carry 0-1 scale mean/std)."""
        x = images.astype(jnp.float32) / 255.0
        return (x - self.pixel_mean) / self.pixel_std

    def loss_fn(
        self,
        params,
        batch_stats,
        batch: Dict[str, jnp.ndarray],
    ) -> Tuple[jnp.ndarray, Tuple[Dict[str, jnp.ndarray], Any]]:
        """(params, stats, batch) -> (total_loss, (loss_dict, new_stats))."""
        images = self.normalize(batch["image"])
        z, mutated = self.module.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        n, h, w, _ = images.shape
        targets = gen_centernet_targets_batch(
            batch["gt_boxes"],
            batch["gt_classes"],
            batch["gt_valid"],
            self.num_classes,
            h // self.down_ratio,
            w // self.down_ratio,
            self.down_ratio,
        )
        hm_loss = focal_loss(z["hm"], targets["hm"], jnp.asarray(self.alpha))
        wh_loss = reg_l1_loss(z["wh"], targets["reg_mask"], targets["ind"], targets["wh"])
        off_loss = reg_l1_loss(z["reg"], targets["reg_mask"], targets["ind"], targets["reg"])
        loss_dict = {
            "hm_loss": hm_loss * self.hm_weight,
            "wh_loss": wh_loss * self.wh_weight,
            "off_loss": off_loss * self.off_weight,
        }
        total = hm_loss * self.hm_weight + wh_loss * self.wh_weight + off_loss * self.off_weight
        return total, (loss_dict, mutated["batch_stats"])

    def predict_fn(
        self, variables, images: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Raw-image batch -> fixed-size detections (still on device)."""
        x = self.normalize(images)
        z = self.module.apply(variables, x, train=False)
        hm = jnp.clip(jax.nn.sigmoid(z["hm"].astype(jnp.float32)), 1e-4, 1 - 1e-4)
        boxes, scores, classes = ctdet_decode(
            hm,
            z["wh"],
            z["reg"],
            k=self.topk_candidates,
            down_ratio=self.down_ratio,
            # the peak-suppression + top-k sweep is HBM-bound; run it at the
            # model's compute width (box/score gathers stay f32) unless
            # TEST.EXACT_MODE pins f32 scores
            score_dtype=(
                self.dtype
                if self.dtype != jnp.float32 and not self.exact_mode
                else None
            ),
            approx=self.approx_topk,
        )
        return {"boxes": boxes, "scores": scores, "classes": classes}

    # -- host boundary ---------------------------------------------------------
    def postprocess(
        self,
        dets: Dict[str, np.ndarray],
        warps: Optional[List[np.ndarray]],
        orig_sizes: List[Tuple[int, int]],
    ) -> List[Dict[str, Instances]]:
        """Fixed-size device detections -> per-image Instances in original
        image coordinates (reference inference_single_image +
        detector_postprocess, centernet.py:236-266)."""
        boxes = np.asarray(dets["boxes"])
        scores = np.asarray(dets["scores"])
        classes = np.asarray(dets["classes"])
        results = []
        for i, (oh, ow) in enumerate(orig_sizes):
            k = min(self.max_detections, self.topk_candidates)
            b, s, c = boxes[i, :k], scores[i, :k], classes[i, :k]
            keep = s > self.score_threshold
            b, s, c = b[keep], s[keep], c[keep]
            if warps is not None:
                # boxes are in network-input pixels; invert the affine warp
                from ...data.detection_utils import unwarp_boxes

                b = unwarp_boxes(warps[i], b)
            inst = Instances((oh, ow))
            bx = Boxes(b.astype(np.float32))
            bx.clip((oh, ow))
            ne = bx.nonempty()  # detector_postprocess drops empty boxes
            inst.pred_boxes = bx[ne]
            inst.scores = s[ne].astype(np.float32)
            inst.pred_classes = c[ne].astype(np.int64)
            results.append({"instances": inst})
        return results
