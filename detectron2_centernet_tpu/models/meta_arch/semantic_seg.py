"""Semantic segmentation meta-arch (reference
``detectron2/modeling/meta_arch/semantic_seg.py``).

``SemSegFPNHead`` (:104): per-level [3x3 conv + GN + relu + 2x upsample]*
towers summed at the common stride, 1x1 predictor, 4x upsample to input.
``SemanticSegmentor`` (:28): backbone + head, pixel-wise CE with ignore.

Batch contract: ``sem_seg`` (N, H, W) int32 class map at input resolution
(255 = ignore), produced by the mapper when the dataset has ``sem_seg_file``.
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import CfgNode
from ..registry import BACKBONE_REGISTRY, META_ARCH_REGISTRY


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")


class SemSegFPNHead(nn.Module):
    in_features: Tuple[str, ...]
    strides: Tuple[int, ...]
    num_classes: int
    convs_dim: int = 128
    common_stride: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        out = None
        for f, stride in zip(self.in_features, self.strides):
            x = features[f]
            n_ups = max(1, int(np.log2(stride) - np.log2(self.common_stride)))
            reps = n_ups if stride > self.common_stride else 1
            for k in range(reps):
                x = nn.Conv(self.convs_dim, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name=f"{f}_conv{k}")(x)
                x = nn.GroupNorm(
                    num_groups=min(32, self.convs_dim), dtype=self.dtype,
                    name=f"{f}_gn{k}",
                )(x)
                x = nn.relu(x)
                if stride > self.common_stride:
                    x = _upsample2x(x)
            out = x if out is None else out + x
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32, name="predictor")(
            out.astype(jnp.float32)
        )
        n, h, w, c = logits.shape
        scale = self.common_stride
        return jax.image.resize(
            logits, (n, h * scale, w * scale, c), method="bilinear"
        )


class DeepLabV3PlusHead(nn.Module):
    """DeepLabV3+ semantic head (the capability of the reference's
    ``projects/DeepLab``): ASPP over the deepest feature + low-level fusion
    at the common stride + decoder convs."""

    in_features: Tuple[str, ...]  # (low_level, deep), e.g. ("res2", "res5")
    strides: Tuple[int, ...]
    num_classes: int
    convs_dim: int = 256
    common_stride: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        from ..layers import ASPP

        low = features[self.in_features[0]]
        deep = features[self.in_features[-1]]
        x = ASPP(self.convs_dim, dtype=self.dtype, name="aspp")(deep, train)
        n, h, w, c = x.shape
        lh, lw = low.shape[1:3]
        x = jax.image.resize(x, (n, lh, lw, c), method="bilinear")
        low_proj = nn.relu(
            nn.Conv(48, (1, 1), dtype=self.dtype, name="low_level_proj")(low)
        )
        x = jnp.concatenate([x, low_proj], axis=-1)
        for i in range(2):
            x = nn.relu(
                nn.Conv(self.convs_dim, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"decoder{i}")(x)
            )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32, name="predictor")(
            x.astype(jnp.float32)
        )
        scale = self.strides[0] // self.common_stride if self.strides else 1
        up = self.common_stride
        n, h2, w2, cc = logits.shape
        return jax.image.resize(
            logits, (n, h2 * up, w2 * up, cc), method="bilinear"
        )


def sem_seg_loss(logits: jnp.ndarray, targets: jnp.ndarray, ignore_value: int = 255) -> jnp.ndarray:
    """Pixel CE with ignore label (reference semantic_seg.py:184-199)."""
    valid = targets != ignore_value
    t = jnp.where(valid, targets, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    return jnp.where(valid, ce, 0.0).sum() / jnp.maximum(valid.sum(), 1.0)


@META_ARCH_REGISTRY.register()
class SemanticSegmentor:
    def __init__(self, cfg: CfgNode) -> None:
        s = cfg.MODEL.SEM_SEG_HEAD
        self.num_classes = int(s.NUM_CLASSES)
        self.ignore_value = int(s.IGNORE_VALUE)
        self.loss_weight = float(s.LOSS_WEIGHT)
        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
        self.dtype = dtype

        backbone_builder = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
        backbone = backbone_builder(cfg, dtype=dtype)
        strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
        in_features = tuple(s.IN_FEATURES)

        strides_map.update({"res2": 4, "res3": 8, "res4": 16, "res5": 32})
        head_cls = {
            "SemSegFPNHead": SemSegFPNHead,
            "DeepLabV3PlusHead": DeepLabV3PlusHead,
        }[s.NAME]
        head = head_cls(
            in_features=in_features,
            strides=tuple(strides_map[f] for f in in_features),
            num_classes=self.num_classes,
            convs_dim=int(s.CONVS_DIM),
            common_stride=int(s.COMMON_STRIDE),
            dtype=dtype,
        )

        class _Net(nn.Module):
            backbone: nn.Module
            head: nn.Module

            @nn.compact
            def __call__(self, images, train: bool = False):
                feats = self.backbone(images, train)
                return self.head(feats, train)

        self.module = _Net(backbone=backbone, head=head)

    def init(self, rng: jax.Array, image_size: Tuple[int, int] = (512, 512)):
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        return self.module.init(rng, dummy, train=False)

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        return (images.astype(jnp.float32) - self.pixel_mean) / self.pixel_std

    def loss_fn(self, params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, mutated = self.module.apply(
            variables, self.normalize(batch["image"]), True, mutable=["batch_stats"]
        )
        loss = sem_seg_loss(logits, batch["sem_seg"], self.ignore_value) * self.loss_weight
        return loss, ({"loss_sem_seg": loss}, mutated.get("batch_stats", batch_stats))

    def predict_fn(self, variables, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        logits = self.module.apply(variables, self.normalize(images), False)
        return {"sem_seg": logits}

    def postprocess(self, dets, warps, orig_sizes) -> List[Dict]:
        """Per-image argmax map resized to the original size (reference
        sem_seg_postprocess, postprocessing.py:75-100)."""
        import cv2

        logits = np.asarray(dets["sem_seg"])
        results = []
        for i, (oh, ow) in enumerate(orig_sizes):
            lg = logits[i]
            if warps is not None:
                m = np.asarray(warps[i], np.float64)
                minv = cv2.invertAffineTransform(m)
                lg = cv2.warpAffine(lg, minv, (ow, oh), flags=cv2.INTER_LINEAR)
            results.append({"sem_seg": lg.argmax(-1)})
        return results
