"""Panoptic FPN (reference ``detectron2/modeling/meta_arch/panoptic_fpn.py:20``).

Joint instance (Mask R-CNN) + semantic (SemSegFPNHead) model sharing one
ResNet-FPN; losses are the union with ``INSTANCE_LOSS_WEIGHT``;
``combine_semantic_and_instance_outputs`` (:133-218) merges at the host
boundary into the panoptic segmentation format.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...config import CfgNode
from ..registry import META_ARCH_REGISTRY
from .rcnn import GeneralizedRCNN, RCNNNetwork
from .semantic_seg import SemSegFPNHead, sem_seg_loss


@META_ARCH_REGISTRY.register()
class PanopticFPN(GeneralizedRCNN):
    def __init__(self, cfg: CfgNode) -> None:
        super().__init__(cfg)
        s = cfg.MODEL.SEM_SEG_HEAD
        self.sem_seg_num_classes = int(s.NUM_CLASSES)
        self.sem_seg_ignore_value = int(s.IGNORE_VALUE)
        self.sem_seg_loss_weight = float(s.LOSS_WEIGHT)
        self.instance_loss_weight = float(cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT)
        c = cfg.MODEL.PANOPTIC_FPN.COMBINE
        self.combine_enabled = bool(c.ENABLED)
        self.combine_overlap_thresh = float(c.OVERLAP_THRESH)
        self.combine_stuff_area = int(c.STUFF_AREA_LIMIT)
        self.combine_conf_thresh = float(c.INSTANCES_CONFIDENCE_THRESH)

        strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
        in_features = tuple(s.IN_FEATURES)
        self.sem_seg_head = SemSegFPNHead(
            in_features=in_features,
            strides=tuple(strides_map[f] for f in in_features),
            num_classes=self.sem_seg_num_classes,
            convs_dim=int(s.CONVS_DIM),
            common_stride=int(s.COMMON_STRIDE),
            dtype=self.dtype,
        )

    # the sem-seg head has its own params tracked under a separate collection
    def init(self, rng, image_size=(512, 512)):
        variables = super().init(rng, image_size)
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        feats, _, _ = self.module.apply(
            variables, dummy, False, method=RCNNNetwork.backbone_rpn
        )
        rng2 = jax.random.fold_in(rng, 1)
        sem_vars = self.sem_seg_head.init(rng2, feats, train=False)
        params = dict(variables["params"])
        params["sem_seg_head"] = sem_vars["params"]
        out = dict(variables)
        out["params"] = params
        return out

    def _split_vars(self, variables):
        params = dict(variables["params"])
        sem_params = params.pop("sem_seg_head")
        main = dict(variables)
        main["params"] = params
        return main, {"params": sem_params}

    def loss_fn(self, params, batch_stats, batch):
        sem_params = params["sem_seg_head"]
        main_params = {k: v for k, v in params.items() if k != "sem_seg_head"}
        total, (losses, new_stats) = super().loss_fn(main_params, batch_stats, batch)
        # only the ROI-head detector losses are scaled; RPN proposal losses
        # pass through unweighted (reference panoptic_fpn.py:105-107)
        losses = {
            k: v if k.startswith("loss_rpn") else v * self.instance_loss_weight
            for k, v in losses.items()
        }

        variables = {"params": main_params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        feats, _, _ = self.module.apply(
            variables, self.normalize(batch["image"]), True,
            method=RCNNNetwork.backbone_rpn,
        )
        logits = self.sem_seg_head.apply({"params": sem_params}, feats, True)
        if "sem_seg" in batch:
            l_sem = sem_seg_loss(logits, batch["sem_seg"], self.sem_seg_ignore_value)
        else:
            l_sem = jnp.float32(0.0)
        losses["loss_sem_seg"] = l_sem * self.sem_seg_loss_weight
        total = sum(losses.values())
        return total, (losses, new_stats)

    def predict_fn(self, variables, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        main, sem = self._split_vars(variables)
        dets = super().predict_fn(main, images)
        feats, _, _ = self.module.apply(
            main, self.normalize(images), False, method=RCNNNetwork.backbone_rpn
        )
        dets["sem_seg"] = self.sem_seg_head.apply(sem, feats, False)
        return dets

    def postprocess(self, dets, warps, orig_sizes) -> List[Dict]:
        inst_results = super().postprocess(
            {k: v for k, v in dets.items() if k != "sem_seg"}, warps, orig_sizes
        )
        sem_logits = np.asarray(dets["sem_seg"])
        import cv2

        for i, (oh, ow) in enumerate(orig_sizes):
            lg = sem_logits[i]
            if warps is not None:
                m = np.asarray(warps[i], np.float64)
                minv = cv2.invertAffineTransform(m)
                lg = cv2.warpAffine(lg, minv, (ow, oh), flags=cv2.INTER_LINEAR)
            sem = lg.argmax(-1)
            inst_results[i]["sem_seg"] = sem
            if self.combine_enabled:
                inst_results[i]["panoptic_seg"] = combine_semantic_and_instance_outputs(
                    inst_results[i]["instances"], sem,
                    self.combine_overlap_thresh, self.combine_stuff_area,
                    self.combine_conf_thresh,
                )
        return inst_results


def combine_semantic_and_instance_outputs(
    instances,
    semantic_results: np.ndarray,
    overlap_threshold: float,
    stuff_area_limit: int,
    instances_confidence_threshold: float,
):
    """Host-side panoptic merge (reference panoptic_fpn.py:133-218):
    paste instances by confidence, then fill stuff regions above the area
    limit.  Returns (panoptic_seg (H, W) int32 segment ids, segments_info)."""
    panoptic_seg = np.zeros(semantic_results.shape, np.int32)
    current_segment_id = 0
    segments_info = []

    scores = np.asarray(instances.scores) if len(instances) else np.zeros(0)
    order = np.argsort(-scores)
    for idx in order:
        score = float(scores[idx])
        if score < instances_confidence_threshold:
            break
        if not hasattr(instances, "pred_masks"):
            continue
        mask = np.asarray(instances.pred_masks[idx]).astype(bool)
        mask_area = mask.sum()
        if mask_area == 0:
            continue
        intersect = mask & (panoptic_seg > 0)
        if intersect.sum() * 1.0 / mask_area > overlap_threshold:
            continue
        mask = mask & (panoptic_seg == 0)
        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": True,
                "score": score,
                "category_id": int(np.asarray(instances.pred_classes)[idx]),
                "instance_id": int(idx),
            }
        )

    semantic_labels = np.unique(semantic_results)
    for semantic_label in semantic_labels:
        if semantic_label == 0:  # 0 is the "thing" placeholder
            continue
        mask = (semantic_results == semantic_label) & (panoptic_seg == 0)
        if mask.sum() < stuff_area_limit:
            continue
        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": False,
                "category_id": int(semantic_label),
                "area": int(mask.sum()),
            }
        )
    return panoptic_seg, segments_info
