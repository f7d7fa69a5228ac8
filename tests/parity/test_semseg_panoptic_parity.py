"""Golden parity for the panoptic stack's two unverified blocks.

- ``SemSegFPNHead`` (reference
  ``detectron2/modeling/meta_arch/semantic_seg.py:104-199``): per-level
  [3x3 conv + GN + relu + 2x bilinear]* towers summed at the common stride,
  1x1 predictor, 4x upsample; train-mode cross-entropy with ignore_index.
- ``combine_semantic_and_instance_outputs`` (reference
  ``detectron2/modeling/meta_arch/panoptic_fpn.py:133-218``): confidence-
  ordered instance paste with overlap rejection/trim, then stuff fill above
  the area limit.

Together with the whole-model Mask R-CNN goldens
(test_maskrcnn_whole_model.py) these cover every PanopticFPN-specific
block; the meta-arch itself is instance losses (verified) + sem-seg loss
(verified here) + this combine (verified here).
"""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from .conftest import seed_torch_module, to_nhwc
from .test_module_parity import _transfer

CHANNELS = 64
CONVS_DIM = 128
NUM_CLASSES = 7
IMG = 128


@pytest.fixture(scope="module")
def ref_panoptic(ref_rcnn):
    """ref_rcnn extended with the semantic-seg head and panoptic combine."""
    ns = ref_rcnn
    ns.semantic_seg = importlib.import_module(
        "detectron2.modeling.meta_arch.semantic_seg"
    )
    ns.panoptic_fpn = importlib.import_module(
        "detectron2.modeling.meta_arch.panoptic_fpn"
    )
    return ns


def _head_cfg():
    from detectron2_centernet_tpu.config import get_cfg

    cfg = get_cfg()
    s = cfg.MODEL.SEM_SEG_HEAD
    s.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    s.NUM_CLASSES = NUM_CLASSES
    s.CONVS_DIM = CONVS_DIM
    s.COMMON_STRIDE = 4
    s.NORM = "GN"
    s.LOSS_WEIGHT = 1.0
    s.IGNORE_VALUE = 255
    return cfg


def _features(torch):
    g = torch.Generator().manual_seed(7)
    strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32}
    return {
        f: torch.randn(1, CHANNELS, IMG // s, IMG // s, generator=g)
        for f, s in strides.items()
    }


@pytest.fixture(scope="module")
def semseg_pair(ref_panoptic):
    torch = ref_panoptic.torch
    ShapeSpec = ref_panoptic.layers.ShapeSpec
    cfg = _head_cfg()
    input_shape = {
        f: ShapeSpec(channels=CHANNELS, stride=s)
        for f, s in (("p2", 4), ("p3", 8), ("p4", 16), ("p5", 32))
    }
    t = ref_panoptic.semantic_seg.SemSegFPNHead(cfg, input_shape)
    seed_torch_module(t)
    t.eval()

    from detectron2_centernet_tpu.models.meta_arch.semantic_seg import (
        SemSegFPNHead,
    )

    ours = SemSegFPNHead(
        in_features=("p2", "p3", "p4", "p5"),
        strides=(4, 8, 16, 32),
        num_classes=NUM_CLASSES,
        convs_dim=CONVS_DIM,
        common_stride=4,
        dtype=jnp.float32,
    )
    feats_t = _features(torch)
    feats_j = {k: jnp.asarray(to_nhwc(v)) for k, v in feats_t.items()}
    variables = ours.init(jax.random.PRNGKey(0), feats_j, train=False)
    variables = _transfer(t, variables)
    return t, ours, variables, feats_t, feats_j


def test_semseg_fpn_head_logits_parity(semseg_pair, ref_panoptic):
    """Eval logits after the full tower sum + predictor + 4x upsample."""
    torch = ref_panoptic.torch
    t, ours, variables, feats_t, feats_j = semseg_pair

    with torch.no_grad():
        logits_ref, _ = t(feats_t)  # (1, C, IMG, IMG)
    logits = ours.apply(variables, feats_j, train=False)  # NHWC

    ref = logits_ref.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(logits)
    assert got.shape == ref.shape == (1, IMG, IMG, NUM_CLASSES)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * max(scale, 1.0))


def test_semseg_fpn_head_loss_parity(semseg_pair, ref_panoptic):
    """Train-mode loss: CE over non-ignored pixels, mean reduction
    (reference losses(), semantic_seg.py:184-199)."""
    torch = ref_panoptic.torch
    t, ours, variables, feats_t, feats_j = semseg_pair
    from detectron2_centernet_tpu.models.meta_arch.semantic_seg import (
        sem_seg_loss,
    )

    g = torch.Generator().manual_seed(11)
    targets = torch.randint(0, NUM_CLASSES, (1, IMG, IMG), generator=g)
    targets[:, :16, :] = 255  # an ignore band

    t.train()
    with torch.no_grad():
        _, losses_ref = t(feats_t, targets)
    t.eval()

    logits = ours.apply(variables, feats_j, train=False)
    loss = sem_seg_loss(logits, jnp.asarray(targets.numpy()), 255)
    np.testing.assert_allclose(
        float(loss), float(losses_ref["loss_sem_seg"]), rtol=5e-5
    )


def _combine_scene(torch):
    """Instances + semantic map hitting every branch: high-score paste,
    overlap rejection, partial-overlap trim, zero-area skip, low-score
    break, stuff fill, and stuff below the area limit."""
    H = W = 80
    masks = np.zeros((5, H, W), bool)
    masks[0, 10:40, 10:40] = True          # A: pasted first (score .9)
    masks[1, 12:38, 12:38] = True          # B: inside A -> rejected (.8)
    masks[2, 30:60, 30:60] = True          # C: partial overlap -> trimmed (.7)
    # D: zero-area mask (.75) -> skipped
    masks[4, 60:70, 5:30] = True           # E: low score (.3) -> break
    scores = np.array([0.9, 0.8, 0.7, 0.75, 0.3], np.float32)
    classes = np.array([2, 1, 4, 0, 3], np.int64)

    sem = np.zeros((H, W), np.int64)
    sem[:, 50:] = 1                        # big stuff region (pasted)
    sem[75:78, 0:3] = 2                    # 9 px < limit -> skipped
    sem[0:30, 0:30] = 3                    # partially under instance A
    return H, W, masks, scores, classes, sem


def test_panoptic_combine_parity(ref_panoptic):
    torch = ref_panoptic.torch
    Instances = ref_panoptic.centernet.Instances
    H, W, masks, scores, classes, sem = _combine_scene(torch)

    inst_ref = Instances((H, W))
    inst_ref.scores = torch.from_numpy(scores)
    inst_ref.pred_classes = torch.from_numpy(classes)
    inst_ref.pred_masks = torch.from_numpy(masks)
    seg_ref, info_ref = (
        ref_panoptic.panoptic_fpn.combine_semantic_and_instance_outputs(
            inst_ref,
            torch.from_numpy(sem),
            overlap_threshold=0.5,
            stuff_area_limit=64,
            instances_confidence_threshold=0.5,
        )
    )

    from detectron2_centernet_tpu.models.meta_arch.panoptic_fpn import (
        combine_semantic_and_instance_outputs,
    )
    from detectron2_centernet_tpu.structures import Instances as OurInstances

    inst = OurInstances((H, W))
    inst.scores = scores
    inst.pred_classes = classes
    inst.pred_masks = masks
    seg, info = combine_semantic_and_instance_outputs(
        inst,
        sem,
        overlap_threshold=0.5,
        stuff_area_limit=64,
        instances_confidence_threshold=0.5,
    )

    np.testing.assert_array_equal(seg, seg_ref.numpy())
    assert len(info) == len(info_ref)
    for got, ref in zip(info, info_ref):
        assert got["id"] == ref["id"]
        assert got["isthing"] == ref["isthing"]
        assert got["category_id"] == ref["category_id"]
        if ref["isthing"]:
            assert got["instance_id"] == ref["instance_id"]
            np.testing.assert_allclose(got["score"], ref["score"], rtol=1e-6)
        else:
            assert got["area"] == ref["area"]
    # the scene must actually exercise the branches
    thing_ids = [s["instance_id"] for s in info if s["isthing"]]
    assert thing_ids == [0, 2], thing_ids  # B rejected, D zero-area, E break
    stuff_cats = [s["category_id"] for s in info if not s["isthing"]]
    assert 2 not in stuff_cats and 1 in stuff_cats and 3 in stuff_cats
