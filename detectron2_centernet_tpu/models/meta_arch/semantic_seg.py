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


class DeepLabV3Head(nn.Module):
    """DeepLabV3 semantic head (reference projects/DeepLab/deeplab/
    semantic_seg.py DeepLabV3Head): ASPP over the single (dilated) deep
    feature + 1x1 predictor, upsampled to input resolution. No decoder —
    that's the V3+ variant below."""

    in_features: Tuple[str, ...]  # ("res5",) on the dilated trunk
    strides: Tuple[int, ...]
    num_classes: int
    convs_dim: int = 256
    common_stride: int = 16
    aspp_dilations: Tuple[int, int, int] = (6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        from ..layers import ASPP

        deep = features[self.in_features[-1]]
        x = ASPP(
            self.convs_dim, dilations=tuple(self.aspp_dilations),
            dtype=self.dtype, name="aspp",
        )(deep, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32, name="predictor")(
            x.astype(jnp.float32)
        )
        n, h, w, c = logits.shape
        up = self.common_stride
        return jax.image.resize(
            logits, (n, h * up, w * up, c), method="bilinear"
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
    aspp_dilations: Tuple[int, int, int] = (6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        from ..layers import ASPP

        low = features[self.in_features[0]]
        deep = features[self.in_features[-1]]
        x = ASPP(
            self.convs_dim, dilations=tuple(self.aspp_dilations),
            dtype=self.dtype, name="aspp",
        )(deep, train)
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


def _top2_uncertainty(vals: jnp.ndarray) -> jnp.ndarray:
    """Multi-class uncertainty = -(top1 - top2) logit gap (reference
    projects/PointRend/point_rend/semantic_seg.py:19-34: higher = more
    uncertain)."""
    top2 = jax.lax.top_k(vals, 2)[0]
    return top2[..., 1] - top2[..., 0]


class PointRendSemSegHead(nn.Module):
    """PointRend semantic segmentation (reference projects/PointRend/
    point_rend/semantic_seg.py:37-135) with static shapes.

    Training: the paper's biased point sampling (oversample uniform
    candidates, keep the most top2-uncertain, fill uniformly), a shared
    point MLP over [fine feature, coarse logits] — returns the coarse
    logits plus (point_logits, point_coords) so the meta-arch can compute
    the point CE against nearest-sampled targets.

    Inference: the coarse head here already emits input-resolution logits
    (unlike the reference's common-stride output), so instead of 2x
    upsample-then-refine rounds, each subdivision step re-predicts the
    SUBDIVISION_NUM_POINTS most uncertain grid texels of the full-res map
    in place — the same compute pattern on the final grid.
    """

    coarse: nn.Module
    num_classes: int
    in_features: Tuple[str, ...] = ("p2",)
    train_num_points: int = 1024
    oversample: int = 3
    importance: float = 0.75
    subdivision_steps: int = 2
    subdivision_num_points: int = 8192
    fc_dim: int = 256
    num_fc: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        from ..roi_heads.point_head import PointHead, point_sample

        logits = self.coarse(features, train)  # (N, H, W, C) input-res
        fine = jnp.concatenate([features[f] for f in self.in_features], -1)
        head = PointHead(
            num_classes=self.num_classes, fc_dim=self.fc_dim,
            num_fc=self.num_fc, dtype=self.dtype, name="point_head",
        )
        n = logits.shape[0]

        if train:
            rng = self.make_rng("points")

            def sample_one(lg, key):
                k = self.oversample * self.train_num_points
                r1, r2 = jax.random.split(key)
                cand = jax.random.uniform(r1, (k, 2))
                u = _top2_uncertainty(point_sample(lg, cand))
                n_imp = int(self.importance * self.train_num_points)
                _, idx = jax.lax.top_k(u, n_imp)
                rand_pts = jax.random.uniform(
                    r2, (self.train_num_points - n_imp, 2)
                )
                return jnp.concatenate([cand[idx], rand_pts], axis=0)

            coords = jax.vmap(sample_one)(
                logits, jax.random.split(rng, n)
            )  # (N, P, 2)
            fine_pts = jax.vmap(point_sample)(fine.astype(jnp.float32), coords)
            coarse_pts = jax.vmap(point_sample)(logits, coords)
            point_logits = head(fine_pts, coarse_pts)  # (N, P, C)
            return logits, point_logits, coords

        refined = logits
        h, w = refined.shape[1:3]
        k = min(self.subdivision_num_points, h * w)
        fine32 = fine.astype(jnp.float32)
        for _ in range(self.subdivision_steps):
            flat = refined.reshape(n, h * w, self.num_classes)
            _, idx = jax.lax.top_k(_top2_uncertainty(flat), k)  # (N, K)
            ys = (idx // w).astype(jnp.float32)
            xs = (idx % w).astype(jnp.float32)
            coords = jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], axis=2)
            fine_pts = jax.vmap(point_sample)(fine32, coords)  # (N, K, Cf)
            coarse_pts = jnp.take_along_axis(
                flat, idx[..., None], axis=1
            )  # (N, K, C)
            new = head(fine_pts, coarse_pts)  # (N, K, C)
            refined = jax.vmap(
                lambda fl, ix, nw: fl.at[ix].set(nw)
            )(flat, idx, new).reshape(refined.shape)
        return refined


def sem_seg_point_loss(
    point_logits: jnp.ndarray,  # (N, P, C)
    point_coords: jnp.ndarray,  # (N, P, 2) normalized
    targets: jnp.ndarray,  # (N, H, W) int
    ignore_value: int = 255,
) -> jnp.ndarray:
    """Point CE against nearest-sampled gt (reference semantic_seg.py:
    92-105, F.cross_entropy with ignore_index, mean reduction)."""
    n, h, w = targets.shape
    xs = jnp.clip((point_coords[..., 0] * w).astype(jnp.int32), 0, w - 1)
    ys = jnp.clip((point_coords[..., 1] * h).astype(jnp.int32), 0, h - 1)
    t = jax.vmap(lambda tg, yy, xx: tg[yy, xx])(targets, ys, xs)  # (N, P)
    valid = t != ignore_value
    tc = jnp.where(valid, t, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(point_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
    return jnp.where(valid, ce, 0.0).sum() / jnp.maximum(valid.sum(), 1.0)


def sem_seg_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_value: int = 255,
    top_k_percent: float = 1.0,
) -> jnp.ndarray:
    """Pixel CE with ignore label (reference semantic_seg.py:184-199).

    ``top_k_percent < 1`` enables DeepLabCE hard pixel mining (reference
    projects/DeepLab/deeplab/loss.py:6-40): the loss averages only the
    top-k fraction of per-pixel losses (ignored pixels contribute 0 and
    sort to the bottom, mirroring the torch ignore_index semantics)."""
    valid = targets != ignore_value
    t = jnp.where(valid, targets, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    if top_k_percent < 1.0:
        flat = ce.reshape(-1)
        k = max(1, int(top_k_percent * flat.shape[0]))
        top, _ = jax.lax.top_k(flat, k)
        return top.mean()
    return ce.sum() / jnp.maximum(valid.sum(), 1.0)


@META_ARCH_REGISTRY.register()
class SemanticSegmentor:
    def __init__(self, cfg: CfgNode) -> None:
        s = cfg.MODEL.SEM_SEG_HEAD
        self.num_classes = int(s.NUM_CLASSES)
        self.ignore_value = int(s.IGNORE_VALUE)
        self.loss_weight = float(s.LOSS_WEIGHT)
        # DeepLabCE hard pixel mining (reference projects/DeepLab loss.py)
        self.loss_top_k = (
            float(s.LOSS_TOP_K) if s.LOSS_TYPE == "hard_pixel_mining" else 1.0
        )
        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
        self.dtype = dtype

        backbone_builder = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
        backbone = backbone_builder(cfg, dtype=dtype)
        strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
        in_features = tuple(s.IN_FEATURES)

        strides_map.update({"res2": 4, "res3": 8, "res4": 16, "res5": 32})
        self.point_rend = s.NAME == "PointRendSemSegHead"
        coarse_name = (
            cfg.MODEL.POINT_HEAD.COARSE_SEM_SEG_HEAD_NAME
            if self.point_rend
            else s.NAME
        )
        head_cls = {
            "SemSegFPNHead": SemSegFPNHead,
            "DeepLabV3Head": DeepLabV3Head,
            "DeepLabV3PlusHead": DeepLabV3PlusHead,
        }[coarse_name]
        head_kwargs = dict(
            in_features=in_features,
            strides=tuple(strides_map[f] for f in in_features),
            num_classes=self.num_classes,
            convs_dim=int(s.CONVS_DIM),
            common_stride=int(s.COMMON_STRIDE),
            dtype=dtype,
        )
        if coarse_name != "SemSegFPNHead":
            head_kwargs["aspp_dilations"] = tuple(s.ASPP_DILATIONS)
        head = head_cls(**head_kwargs)
        if self.point_rend:
            ph = cfg.MODEL.POINT_HEAD
            head = PointRendSemSegHead(
                coarse=head,
                num_classes=self.num_classes,
                in_features=tuple(ph.IN_FEATURES),
                train_num_points=int(ph.TRAIN_NUM_POINTS),
                oversample=int(ph.OVERSAMPLE_RATIO),
                importance=float(ph.IMPORTANCE_SAMPLE_RATIO),
                subdivision_steps=int(ph.SUBDIVISION_STEPS),
                subdivision_num_points=int(ph.SUBDIVISION_NUM_POINTS),
                fc_dim=int(ph.FC_DIM),
                num_fc=int(ph.NUM_FC),
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
        rngs = (
            {"points": batch.get("rng", jax.random.PRNGKey(0))}
            if self.point_rend
            else None
        )
        out, mutated = self.module.apply(
            variables, self.normalize(batch["image"]), True,
            mutable=["batch_stats"], rngs=rngs,
        )
        if self.point_rend:
            logits, point_logits, point_coords = out
            loss = sem_seg_loss(
                logits, batch["sem_seg"], self.ignore_value, self.loss_top_k
            ) * self.loss_weight
            ploss = sem_seg_point_loss(
                point_logits, point_coords, batch["sem_seg"], self.ignore_value
            )
            losses = {"loss_sem_seg": loss, "loss_sem_seg_point": ploss}
            return loss + ploss, (losses, mutated.get("batch_stats", batch_stats))
        logits = out
        loss = sem_seg_loss(
            logits, batch["sem_seg"], self.ignore_value, self.loss_top_k
        ) * self.loss_weight
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
