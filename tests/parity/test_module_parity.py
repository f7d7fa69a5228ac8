"""Module-level golden parity: reference torch modules vs our flax modules.

Each test constructs the reference's OWN torch module (imported from
/root/reference via the conftest stubs), fills it with deterministic
weights, transfers them to our flax module through
``checkpoint.torch_import`` (exercising the aligner on structured state
dicts), and asserts forward-output equality — the module-level substitute
for end-to-end mAP parity while no trained checkpoints are mounted.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.checkpoint.torch_import import (
    align_state_dicts,
    _flatten_pytree,
)

from .conftest import from_nhwc, seed_torch_module, to_nhwc

ATOL = 2e-4


def _transfer(torch_module, variables):
    """torch state_dict -> flax variables via the production aligner."""
    torch_sd = {
        k: v.detach().numpy() for k, v in torch_module.state_dict().items()
    }
    leaves = _flatten_pytree(variables)
    aligned = align_state_dicts(torch_sd, leaves)
    assert len(aligned) == len(leaves), "aligner left flax leaves unmatched"
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    new = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        new.append(jnp.asarray(aligned[name]))
    return jax.tree_util.tree_unflatten(treedef, new)


def test_resnet_stem_parity(ref):
    """BasicStem: 7x7 s2 conv + FrozenBN + relu + 3x3 s2 maxpool
    (/root/reference/detectron2/modeling/backbone/resnet.py:331-362)."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.backbones.resnet import BasicStem

    t = ref.resnet.BasicStem(in_channels=3, out_channels=16, norm="FrozenBN")
    seed_torch_module(t)
    t.eval()
    x = torch.randn(2, 3, 33, 47, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        y_ref = t(x)

    m = BasicStem(out_channels=16, norm="FrozenBN")
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    y = m.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), atol=ATOL)


def test_resnet_bottleneck_stage_parity(ref):
    """A res2-style stage (3 BottleneckBlocks, first with projection
    shortcut) followed by a stride-2 block — the shape of every ResNet-50
    stage (resnet.py:101-213). Covers the stride-2 3x3 padding semantics."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.backbones.resnet import BottleneckBlock

    blocks = [
        ref.resnet.BottleneckBlock(
            in_channels=16 if i == 0 else 32,
            out_channels=32,
            bottleneck_channels=8,
            stride=1,
            norm="FrozenBN",
        )
        for i in range(3)
    ] + [
        ref.resnet.BottleneckBlock(
            in_channels=32,
            out_channels=64,
            bottleneck_channels=16,
            stride=2,
            stride_in_1x1=True,
            norm="FrozenBN",
        )
    ]
    t = torch.nn.Sequential(*blocks)
    seed_torch_module(t)
    t.eval()
    x = torch.randn(2, 16, 32, 32, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        y_ref = t(x)

    from flax import linen as nn

    class FlaxStage(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for i in range(3):
                x = BottleneckBlock(
                    out_channels=32, bottleneck_channels=8, norm="FrozenBN",
                    name=f"block{i}",
                )(x, train)
            return BottleneckBlock(
                out_channels=64, bottleneck_channels=16, stride=2,
                stride_in_1x1=True, norm="FrozenBN", name="block3",
            )(x, train)

    m = FlaxStage()
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    y = m.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), atol=ATOL)


def test_bottleneck_stride_not_in_1x1_parity(ref):
    """stride_in_1x1=False (torchvision convention): the stride-2 3x3 conv
    must use torch's symmetric padding (resnet.py:140-168)."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.backbones.resnet import BottleneckBlock

    t = ref.resnet.BottleneckBlock(
        in_channels=16, out_channels=32, bottleneck_channels=8,
        stride=2, stride_in_1x1=False, norm="FrozenBN",
    )
    seed_torch_module(t)
    t.eval()
    x = torch.randn(1, 16, 30, 26, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        y_ref = t(x)

    m = BottleneckBlock(
        out_channels=32, bottleneck_channels=8, stride=2,
        stride_in_1x1=False, norm="FrozenBN",
    )
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    y = m.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), atol=ATOL)


def test_fpn_parity(ref):
    """FPN lateral+output convs with LastLevelMaxPool over a 3-level
    pyramid (fpn.py:17-184)."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.backbones.fpn import FPN

    class FakeBackbone(ref.fpn.Backbone):
        def __init__(self):
            super().__init__()
            self._out_features = ["res3", "res4", "res5"]

        def output_shape(self):
            SS = ref.layers.ShapeSpec
            return {
                "res3": SS(channels=8, stride=8),
                "res4": SS(channels=16, stride=16),
                "res5": SS(channels=32, stride=32),
            }

        def forward(self, feats):
            return feats

    t = ref.fpn.FPN(
        bottom_up=FakeBackbone(),
        in_features=["res3", "res4", "res5"],
        out_channels=16,
        norm="",
        top_block=ref.fpn.LastLevelMaxPool(),
    )
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(4)
    feats = {
        "res3": torch.randn(1, 8, 16, 16, generator=g),
        "res4": torch.randn(1, 16, 8, 8, generator=g),
        "res5": torch.randn(1, 32, 4, 4, generator=g),
    }
    with torch.no_grad():
        y_ref = t(feats)

    from flax import linen as nn

    from detectron2_centernet_tpu.models.backbones import fpn as our_fpn

    class IdentityBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return x  # precomputed feature dict passes straight through

    m = our_fpn.FPN(
        bottom_up=IdentityBackbone(),
        in_features=("res3", "res4", "res5"),
        out_channels=16,
        top_block="maxpool",
    )
    feats_j = {k: jnp.asarray(to_nhwc(v)) for k, v in feats.items()}
    variables = m.init(jax.random.PRNGKey(0), feats_j)
    variables = _transfer(t, variables)
    y = m.apply(variables, feats_j)
    for lvl in ("p3", "p4", "p5", "p6"):
        np.testing.assert_allclose(
            np.asarray(y[lvl]), to_nhwc(y_ref[lvl]), atol=ATOL, err_msg=lvl
        )


def test_box2box_transform_parity(ref):
    """Box2BoxTransform get_deltas/apply_deltas
    (box_regression.py:16-111)."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.box_regression import Box2BoxTransform

    rng = np.random.RandomState(5)
    src = rng.rand(40, 4).astype(np.float32) * 50
    src[:, 2:] = src[:, :2] + 1 + rng.rand(40, 2).astype(np.float32) * 40
    tgt = rng.rand(40, 4).astype(np.float32) * 50
    tgt[:, 2:] = tgt[:, :2] + 1 + rng.rand(40, 2).astype(np.float32) * 40
    weights = (10.0, 10.0, 5.0, 5.0)

    t = ref.box_regression.Box2BoxTransform(weights=weights)
    deltas_ref = t.get_deltas(torch.from_numpy(src), torch.from_numpy(tgt))
    applied_ref = t.apply_deltas(deltas_ref, torch.from_numpy(src))

    ours = Box2BoxTransform(weights)
    deltas = ours.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    applied = ours.apply_deltas(jnp.asarray(np.asarray(deltas)), jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(deltas), deltas_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(applied), applied_ref.numpy(), atol=1e-3)


def test_matcher_parity(ref):
    """Matcher threshold assignment incl. allow_low_quality_matches
    (matcher.py:8-127)."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.matcher import Matcher

    rng = np.random.RandomState(6)
    iou = rng.rand(7, 64).astype(np.float32)
    t = ref.matcher.Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    midx_ref, mlab_ref = t(torch.from_numpy(iou))

    ours = Matcher((0.3, 0.7), (0, -1, 1), allow_low_quality_matches=True)
    midx, mlab = ours(jnp.asarray(iou), jnp.ones((7,), bool))
    np.testing.assert_array_equal(np.asarray(midx), midx_ref.numpy())
    np.testing.assert_array_equal(np.asarray(mlab), mlab_ref.numpy())


def test_frozen_bn_parity(ref):
    """FrozenBatchNorm2d affine math (layers/batch_norm.py:14-126)."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.layers import FrozenBatchNorm

    t = ref.layers.FrozenBatchNorm2d(12)
    seed_torch_module(t, seed=7)
    t.eval()
    x = torch.randn(2, 12, 9, 11, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        y_ref = t(x)

    m = FrozenBatchNorm(features=12)
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    y = m.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), atol=1e-5)


def test_dla_trunk_parity(ref):
    """The fork's own DLA trunk (dla.py:206-268) vs our DLATrunk, weights
    imported through the deterministic DLA name map — all 6 level outputs
    must match (the mAP-import path for ctdet checkpoints)."""
    import importlib

    torch = ref.torch
    dla = importlib.import_module("detectron2.modeling.backbone.dla")
    from detectron2_centernet_tpu.models.backbones.dla import DLATrunk

    levels = [1, 1, 1, 2, 2, 1]  # the DLA-34 level layout
    channels = [4, 8, 8, 16, 16, 16]
    t = dla.DLA(levels, channels, block=dla.DLABasicBlock)
    seed_torch_module(t)
    t.eval()
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        y_ref = t(x)

    m = DLATrunk(levels, channels)
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    ys = m.apply(variables, xj)
    for i, (a, b) in enumerate(zip(ys, y_ref)):
        np.testing.assert_allclose(
            np.asarray(a), to_nhwc(b), atol=5e-4, err_msg=f"level{i}"
        )


def test_dla_canonical_name_map():
    """Fork DLASeg naming (DCNv2 wrappers, head towers, Sequential stems)
    maps deterministically onto our flax paths."""
    from detectron2_centernet_tpu.checkpoint.dla_import import canonical_dla_key

    cases = {
        "base.base_layer.0.weight": "params/base/base_layer/conv/kernel",
        "base.base_layer.1.running_mean": "batch_stats/base/base_layer/bn/mean",
        "base.level0.0.weight": "params/base/level0_conv0/conv/kernel",
        "base.level1.4.bias": "params/base/level1_conv1/bn/bias",
        "base.level2.tree1.conv1.weight":
            "params/base/level2/tree1/conv1/conv/kernel",
        "base.level2.tree1.bn2.weight":
            "params/base/level2/tree1/conv2/bn/scale",
        "base.level3.tree2.root.conv.weight":
            "params/base/level3/tree2/root/conv/conv/kernel",
        "base.level2.project.1.running_var":
            "batch_stats/base/level2/project/bn/var",
        "dla_up.ida_0.proj_1.conv.weight":
            "params/dla_up/ida_0/proj_1/kernel",
        "dla_up.ida_0.proj_1.conv.conv_offset_mask.weight":
            "params/dla_up/ida_0/proj_1/conv_offset_mask/kernel",
        "dla_up.ida_0.node_1.actf.0.weight":
            "params/dla_up/ida_0/node_1/bn/scale",
        "dla_up.ida_0.node_1.actf.0.running_var":
            "batch_stats/dla_up/ida_0/node_1/bn/var",
        "ida_up.up_2.weight": "params/ida_up/up_2/kernel",
        "hm.0.weight": "params/heads/hm_tower/kernel",
        "hm.2.bias": "params/heads/hm_out/bias",
        "wh.2.weight": "params/heads/wh_out/kernel",
        "base.fc.weight": None,  # ImageNet classifier: no counterpart
        "base.level2.tree1.bn1.num_batches_tracked": None,
    }
    for torch_key, expect in cases.items():
        assert canonical_dla_key(torch_key) == expect, torch_key


def test_retinanet_head_parity(ref):
    """RetinaNet head numerics: a torch twin built exactly per the
    reference's definition (retinanet.py:405-489 — 4-conv cls/box towers
    with interleaved ReLU, shared across levels, 3x3 predictors) must match
    our shared-tower flax head after aligner transfer."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.meta_arch.retinanet import RetinaNetHead

    num_classes, num_anchors, num_convs, ch = 5, 3, 4, 16

    class TorchHead(torch.nn.Module):
        def __init__(self):
            super().__init__()
            cls_subnet, bbox_subnet = [], []
            for _ in range(num_convs):
                cls_subnet += [torch.nn.Conv2d(ch, ch, 3, 1, 1), torch.nn.ReLU()]
                bbox_subnet += [torch.nn.Conv2d(ch, ch, 3, 1, 1), torch.nn.ReLU()]
            self.cls_subnet = torch.nn.Sequential(*cls_subnet)
            self.bbox_subnet = torch.nn.Sequential(*bbox_subnet)
            self.cls_score = torch.nn.Conv2d(ch, num_anchors * num_classes, 3, 1, 1)
            self.bbox_pred = torch.nn.Conv2d(ch, num_anchors * 4, 3, 1, 1)

        def forward(self, feats):
            logits = [self.cls_score(self.cls_subnet(f)) for f in feats]
            deltas = [self.bbox_pred(self.bbox_subnet(f)) for f in feats]
            return logits, deltas

    t = TorchHead()
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(6)
    feats = [torch.randn(1, ch, s, s, generator=g) for s in (16, 8, 4)]
    with torch.no_grad():
        logits_ref, deltas_ref = t(feats)

    m = RetinaNetHead(
        num_classes=num_classes, num_anchors=num_anchors,
        num_convs=num_convs, channels=ch,
    )
    feats_j = [jnp.asarray(to_nhwc(f)) for f in feats]
    variables = m.init(jax.random.PRNGKey(0), feats_j)
    variables = _transfer(t, variables)
    logits, deltas = m.apply(variables, feats_j)
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(logits[lvl]), to_nhwc(logits_ref[lvl]), atol=ATOL,
            err_msg=f"logits l{lvl}",
        )
        np.testing.assert_allclose(
            np.asarray(deltas[lvl]), to_nhwc(deltas_ref[lvl]), atol=ATOL,
            err_msg=f"deltas l{lvl}",
        )


def test_mask_head_parity(ref_full):
    ref = ref_full
    """MaskRCNNConvUpsampleHead vs the reference's OWN module
    (roi_heads/mask_head.py:207-260): conv tower + deconv + 1x1 predictor
    bit-match after aligner transfer."""
    torch = ref.torch
    import importlib

    ref_mh = importlib.import_module("detectron2.modeling.roi_heads.mask_head")
    from detectron2_centernet_tpu.models.roi_heads.mask_head import (
        MaskRCNNConvUpsampleHead,
    )

    ch, num_classes = 16, 5
    shape = ref.layers.ShapeSpec(channels=ch, height=14, width=14)
    t = ref_mh.MaskRCNNConvUpsampleHead(
        shape, num_classes=num_classes, conv_dims=[ch] * 5
    )
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(3)
    x = torch.randn(2, ch, 14, 14, generator=g)
    with torch.no_grad():
        out_ref = t.layers(x)

    m = MaskRCNNConvUpsampleHead(num_classes, num_conv=4, conv_dim=ch)
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    out = m.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(out_ref), atol=ATOL)


def test_keypoint_head_parity(ref_full):
    ref = ref_full
    """KRCNNConvDeconvUpsampleHead vs the reference's OWN module
    (roi_heads/keypoint_head.py:215-260): conv stack + deconv + 2x bilinear
    interp (align_corners=False) match after transfer."""
    torch = ref.torch
    import importlib

    ref_kh = importlib.import_module(
        "detectron2.modeling.roi_heads.keypoint_head"
    )
    from detectron2_centernet_tpu.models.roi_heads.keypoint_head import (
        KRCNNConvDeconvUpsampleHead,
    )

    ch, num_kp = 16, 17
    shape = ref.layers.ShapeSpec(channels=ch, height=14, width=14)
    t = ref_kh.KRCNNConvDeconvUpsampleHead(
        shape, num_keypoints=num_kp, conv_dims=(ch, ch, ch)
    )
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(4)
    x = torch.randn(2, ch, 14, 14, generator=g)
    with torch.no_grad():
        out_ref = t.layers(x)

    m = KRCNNConvDeconvUpsampleHead(num_keypoints=num_kp, conv_dims=(ch, ch, ch))
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    out = m.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(out_ref), atol=ATOL)


def test_heatmaps_to_keypoints_parity(ref_full):
    """Keypoint heatmap decode vs the reference's own
    ``structures.keypoints.heatmaps_to_keypoints`` (:145-212): positions
    exact (same bicubic grid + argmax), logits/scores to float tolerance
    (cv2 INTER_CUBIC vs torch bicubic rounding)."""
    torch = ref_full.torch
    import importlib

    ref_kp = importlib.import_module("detectron2.structures.keypoints")
    from detectron2_centernet_tpu.structures.keypoints import (
        heatmaps_to_keypoints,
    )

    rng = np.random.RandomState(0)
    n, k, p = 4, 17, 14
    maps = rng.randn(n, k, p, p).astype(np.float32) * 3
    rois = rng.rand(n, 4).astype(np.float32) * 40
    rois[:, 2:] = rois[:, :2] + 20 + rng.rand(n, 2).astype(np.float32) * 60

    with torch.no_grad():
        want = ref_kp.heatmaps_to_keypoints(
            torch.from_numpy(maps), torch.from_numpy(rois)
        ).numpy()

    got = heatmaps_to_keypoints(maps.transpose(0, 2, 3, 1), rois)
    np.testing.assert_allclose(got[..., :2], want[..., :2], atol=1e-3)
    np.testing.assert_allclose(got[..., 2], want[..., 2], atol=1e-3)
    np.testing.assert_allclose(got[..., 3], want[..., 3], rtol=1e-3, atol=1e-5)


def test_paste_masks_in_image_parity(ref_full):
    """paste_masks_in_image vs the reference's own layers/mask_ops.py
    (grid_sample align_corners=False over the sub-pixel box): the pasted
    bool masks must be IDENTICAL pixel for pixel."""
    torch = ref_full.torch
    import importlib

    ref_mo = importlib.import_module("detectron2.layers.mask_ops")
    from detectron2_centernet_tpu.structures.masks import paste_masks_in_image

    rng = np.random.RandomState(1)
    n, m, h, w = 6, 28, 60, 80
    masks = rng.rand(n, m, m).astype(np.float32)
    boxes = rng.rand(n, 4).astype(np.float32) * 30
    boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(n, 2).astype(np.float32) * 40
    boxes[0] = [-3.2, -1.7, 20.4, 25.9]  # partially outside
    boxes[1] = [60.0, 40.0, 95.5, 70.2]  # clipped right/bottom

    with torch.no_grad():
        want = ref_mo.paste_masks_in_image(
            torch.from_numpy(masks), torch.from_numpy(boxes), (h, w), 0.5
        ).numpy()

    got = paste_masks_in_image(masks, boxes, (h, w), 0.5)
    mismatch = (got != want).sum()
    assert mismatch == 0, f"{mismatch} of {got.size} pixels differ"


def test_box2box_rotated_parity(ref):
    """Box2BoxTransformRotated vs the reference's own module
    (box_regression.py:114-212): get_deltas and apply_deltas round-trip on
    random rotated boxes (incl. angle normalization to (-180, 180])."""
    torch = ref.torch
    from detectron2_centernet_tpu.models.box_regression import (
        Box2BoxTransformRotated,
    )

    weights = (10.0, 10.0, 5.0, 5.0, 1.0)
    t_ref = ref.box_regression.Box2BoxTransformRotated(weights=weights)
    t_our = Box2BoxTransformRotated(weights)

    rng = np.random.RandomState(2)
    src = np.stack([
        rng.rand(64) * 80 + 10, rng.rand(64) * 80 + 10,
        rng.rand(64) * 40 + 4, rng.rand(64) * 40 + 4,
        rng.rand(64) * 720 - 360,
    ], 1).astype(np.float32)
    tgt = np.stack([
        rng.rand(64) * 80 + 10, rng.rand(64) * 80 + 10,
        rng.rand(64) * 40 + 4, rng.rand(64) * 40 + 4,
        rng.rand(64) * 720 - 360,
    ], 1).astype(np.float32)

    with torch.no_grad():
        d_ref = t_ref.get_deltas(torch.from_numpy(src), torch.from_numpy(tgt)).numpy()
        a_ref = t_ref.apply_deltas(torch.from_numpy(d_ref), torch.from_numpy(src)).numpy()

    d = np.asarray(t_our.get_deltas(jnp.asarray(src), jnp.asarray(tgt)))
    a = np.asarray(t_our.apply_deltas(jnp.asarray(d), jnp.asarray(src)))
    np.testing.assert_allclose(d, d_ref, atol=2e-4)
    np.testing.assert_allclose(a, a_ref, atol=2e-3)


def test_anchor_generator_parity(ref_full):
    """DefaultAnchorGenerator vs the reference's own module
    (anchor_generator.py:80-230): identical anchors per level, per cell,
    multi-size/ratio, at both offsets."""
    torch = ref_full.torch
    import importlib

    ref_ag = importlib.import_module("detectron2.modeling.anchor_generator")
    from detectron2_centernet_tpu.models.anchors import DefaultAnchorGenerator

    sizes = [[32, 64], [128]]
    ratios = [[0.5, 1.0, 2.0]]
    strides = [8, 16]
    for offset in (0.0, 0.5):
        t = ref_ag.DefaultAnchorGenerator(
            sizes=sizes, aspect_ratios=ratios, strides=strides, offset=offset
        )
        feats = [torch.zeros(1, 1, 10, 14), torch.zeros(1, 1, 5, 7)]
        with torch.no_grad():
            want = [b.tensor.numpy() for b in t(feats)]

        ours = DefaultAnchorGenerator(
            sizes=sizes, aspect_ratios=ratios, strides=strides, offset=offset
        )
        got = ours.grid_anchors([(10, 14), (5, 7)])
        for lvl in range(2):
            np.testing.assert_allclose(
                got[lvl], want[lvl], atol=1e-5, err_msg=f"offset={offset} l{lvl}"
            )


def test_detector_postprocess_box_rescale_parity(ref_full):
    """Output rescaling: our warp-inversion postprocess vs the reference's
    detector_postprocess (postprocessing.py:11-72) for a pure uniform-scale
    letterbox warp (scale s, no shift): boxes must coincide after clipping,
    empties dropped the same way."""
    torch = ref_full.torch
    import importlib

    ref_pp = importlib.import_module("detectron2.modeling.postprocessing")
    inst_mod = importlib.import_module("detectron2.structures.instances")
    boxes_mod = importlib.import_module("detectron2.structures.boxes")
    from detectron2_centernet_tpu.data.detection_utils import unwarp_boxes

    rng = np.random.RandomState(5)
    mh, mw = 128, 128   # model input size
    oh, ow = 256, 512   # original image size (integral letterbox extent)
    s = min(mh / oh, mw / ow)
    warp = np.array([[s, 0.0, 0.0], [0.0, s, 0.0]], np.float64)  # orig->model

    b_model = rng.rand(12, 4).astype(np.float32) * 100
    b_model[:, 2:] = b_model[:, :2] + rng.rand(12, 2).astype(np.float32) * 40

    # reference: detector_postprocess scales by output_size /
    # results.image_size; for a letterbox warp the equivalence holds when
    # the Instances' image_size is the (integral) warped extent
    results = inst_mod.Instances((int(round(oh * s)), int(round(ow * s))))
    results.pred_boxes = boxes_mod.Boxes(torch.from_numpy(b_model.copy()))
    results.scores = torch.ones(12)
    out_ref = ref_pp.detector_postprocess(results, oh, ow)
    want = out_ref.pred_boxes.tensor.numpy()

    got = unwarp_boxes(warp, b_model.copy())
    from detectron2_centernet_tpu.structures import Boxes

    bx = Boxes(got.astype(np.float32))
    bx.clip((oh, ow))
    ne = np.asarray(bx.nonempty())
    # detector_postprocess already dropped its empties; the survivors and
    # their boxes must coincide
    assert ne.sum() == len(want), (ne.sum(), len(want))
    np.testing.assert_allclose(np.asarray(bx.tensor)[ne], want, atol=1e-3)


def test_box_head_parity(ref_full):
    """FastRCNNConvFCHead vs the reference's own module (box_head.py):
    covers the conv -> flatten -> fc boundary, where torch's channel-major
    flatten meets our NHWC flatten — the aligner must permute the first fc
    weight or every imported torch checkpoint mis-wires the box head."""
    ref = ref_full
    torch = ref.torch
    import importlib

    ref_bh = importlib.import_module("detectron2.modeling.roi_heads.box_head")
    from detectron2_centernet_tpu.models.roi_heads.box_head import (
        FastRCNNConvFCHead,
    )

    ch, p = 8, 7
    shape = ref.layers.ShapeSpec(channels=ch, height=p, width=p)
    t = ref_bh.FastRCNNConvFCHead(shape, conv_dims=[ch], fc_dims=[32, 32])
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(9)
    x = torch.randn(3, ch, p, p, generator=g)
    with torch.no_grad():
        want = t(x).numpy()

    m = FastRCNNConvFCHead(num_conv=1, conv_dim=ch, num_fc=2, fc_dim=32)
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    got = np.asarray(m.apply(variables, xj))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_coarse_mask_head_parity(ref_full):
    """CoarseMaskHead vs the reference PointRend project's own module
    (point_rend/coarse_mask_head.py, loaded by file path to skip the
    project __init__): 1x1 reduce + 2x2 s2 reduce + FC stack + per-class
    low-res prediction, including the conv->flatten boundary permutation."""
    ref = ref_full
    torch = ref.torch
    import importlib
    import importlib.util
    import sys

    mh_mod = importlib.import_module("detectron2.modeling.roi_heads.mask_head")
    modeling = sys.modules["detectron2.modeling"]
    if not hasattr(modeling, "ROI_MASK_HEAD_REGISTRY"):
        modeling.ROI_MASK_HEAD_REGISTRY = mh_mod.ROI_MASK_HEAD_REGISTRY
    spec = importlib.util.spec_from_file_location(
        "_ref_coarse_mask_head",
        "/root/reference/projects/PointRend/point_rend/coarse_mask_head.py",
    )
    ref_cmh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_cmh)

    from detectron2_centernet_tpu.config import get_cfg
    from detectron2_centernet_tpu.models.roi_heads.mask_head import CoarseMaskHead

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.MODEL.ROI_MASK_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_MASK_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_MASK_HEAD.OUTPUT_SIDE_RESOLUTION = 7
    ch, p = 24, 14  # cin > conv_dim exercises the reduce conv
    shape = ref.layers.ShapeSpec(channels=ch, height=p, width=p)
    t = ref_cmh.CoarseMaskHead(cfg, shape)
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(11)
    x = torch.randn(2, ch, p, p, generator=g)
    with torch.no_grad():
        want = t(x).numpy()  # (R, C, 7, 7)

    m = CoarseMaskHead(4, conv_dim=16, fc_dim=32, num_fc=2, output_side=7)
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    got = np.asarray(m.apply(variables, xj))  # (R, 7, 7, C)
    np.testing.assert_allclose(
        got, np.transpose(want, (0, 2, 3, 1)), atol=ATOL
    )


def test_rpn_head_parity(ref_full):
    """StandardRPNHead vs the reference's own module
    (proposal_generator/rpn.py:68-130): shared 3x3 conv + 1x1 objectness
    and A*4 anchor-delta predictors across levels."""
    ref = ref_full
    torch = ref.torch
    import importlib

    import sys

    structures = sys.modules["detectron2.structures"]
    if not hasattr(structures, "pairwise_iou_rotated"):
        # rrpn.py (pulled in by .build) needs the _C-backed rotated IoU at
        # import time only; the golden never calls it
        structures.pairwise_iou_rotated = None
    # import .build first: it defines the registry before importing rpn,
    # which breaks the rpn <-> build import cycle the package __init__
    # normally resolves
    importlib.import_module("detectron2.modeling.proposal_generator.build")
    ref_rpn = importlib.import_module(
        "detectron2.modeling.proposal_generator.rpn"
    )
    from detectron2_centernet_tpu.models.proposal_generator.rpn import (
        StandardRPNHead,
    )

    ch, na = 16, 3
    t = ref_rpn.StandardRPNHead(in_channels=ch, num_anchors=na, box_dim=4)
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(12)
    feats = [torch.randn(1, ch, s, s, generator=g) for s in (16, 8)]
    with torch.no_grad():
        logits_ref, deltas_ref = t(feats)

    m = StandardRPNHead(num_anchors=na, channels=ch)
    feats_j = [jnp.asarray(to_nhwc(f)) for f in feats]
    variables = m.init(jax.random.PRNGKey(0), feats_j)
    variables = _transfer(t, variables)
    logits, deltas = m.apply(variables, feats_j)
    for lvl in range(2):
        np.testing.assert_allclose(
            np.asarray(logits[lvl]), to_nhwc(logits_ref[lvl]), atol=ATOL
        )
        np.testing.assert_allclose(
            np.asarray(deltas[lvl]), to_nhwc(deltas_ref[lvl]), atol=ATOL
        )


def test_find_top_rpn_proposals_parity(ref_full):
    """Proposal selection vs the reference's own find_top_rpn_proposals
    (proposal_utils.py:13-113): same decoded per-level boxes + logits in,
    same surviving proposal set out (per-level NMS, global top-K).
    Proposal selection feeds everything downstream in a two-stage model —
    a drift here shifts every roi."""
    ref = ref_full
    torch = ref.torch
    import importlib

    ref_pu = importlib.import_module(
        "detectron2.modeling.proposal_generator.proposal_utils"
    )
    from detectron2_centernet_tpu.models.box_regression import Box2BoxTransform
    from detectron2_centernet_tpu.models.proposal_generator.rpn import (
        find_top_rpn_proposals,
    )

    rng = np.random.RandomState(13)
    h, w = 64, 80
    b2b = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
    anchors, logits, deltas, dec_boxes = [], [], [], []
    for rl, cell in ((120, 8), (40, 16)):
        cx = rng.rand(rl) * w
        cy = rng.rand(rl) * h
        s = 10 + rng.rand(rl) * 30
        anc = np.stack([cx - s, cy - s, cx + s, cy + s], 1).astype(np.float32)
        lg = rng.randn(1, rl).astype(np.float32)
        dl = (rng.randn(1, rl, 4) * 0.2).astype(np.float32)
        anchors.append(anc)
        logits.append(jnp.asarray(lg))
        deltas.append(jnp.asarray(dl))
        dec = np.asarray(b2b.apply_deltas(jnp.asarray(dl[0]), jnp.asarray(anc)))
        dec_boxes.append(torch.from_numpy(dec[None]))

    with torch.no_grad():
        inst = ref_pu.find_top_rpn_proposals(
            dec_boxes, [torch.from_numpy(np.asarray(l)) for l in logits],
            [(h, w)], nms_thresh=0.7, pre_nms_topk=100, post_nms_topk=20,
            min_box_size=0.0, training=False,
        )[0]
    want_boxes = inst.proposal_boxes.tensor.numpy()
    want_scores = inst.objectness_logits.numpy()

    boxes, scores, valid = find_top_rpn_proposals(
        logits, deltas, [jnp.asarray(a) for a in anchors], (h, w), b2b,
        nms_thresh=0.7, pre_nms_topk=100, post_nms_topk=20,
    )
    got_boxes = np.asarray(boxes[0])[np.asarray(valid[0])]
    got_scores = np.asarray(scores[0])[np.asarray(valid[0])]
    assert len(got_scores) == len(want_scores), (len(got_scores), len(want_scores))
    order_w = np.argsort(-want_scores)
    order_g = np.argsort(-got_scores)
    np.testing.assert_allclose(got_scores[order_g], want_scores[order_w], atol=1e-5)
    np.testing.assert_allclose(got_boxes[order_g], want_boxes[order_w], atol=1e-3)


def test_boxmode_convert_parity(ref_full):
    """BoxMode.convert vs the reference's own (structures/boxes.py:13-130):
    XYWH<->XYXY and the rotated XYWHA_ABS -> XYXY_ABS envelope."""
    ref = ref_full
    torch = ref.torch
    import importlib

    ref_boxes = importlib.import_module("detectron2.structures.boxes")
    from detectron2_centernet_tpu.structures import BoxMode

    rng = np.random.RandomState(17)
    xywh = rng.rand(16, 4).astype(np.float32) * 100
    want = ref_boxes.BoxMode.convert(
        torch.from_numpy(xywh.copy()), ref_boxes.BoxMode.XYWH_ABS,
        ref_boxes.BoxMode.XYXY_ABS,
    ).numpy()
    got = BoxMode.convert(xywh.copy(), BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(got, want, atol=1e-6)

    back = BoxMode.convert(got.copy(), BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(back, xywh, atol=1e-5)

    xywha = np.concatenate(
        [rng.rand(16, 2) * 100 + 50, rng.rand(16, 2) * 40 + 5,
         rng.rand(16, 1) * 360 - 180], 1
    ).astype(np.float32)
    want_r = ref_boxes.BoxMode.convert(
        torch.from_numpy(xywha.copy()), ref_boxes.BoxMode.XYWHA_ABS,
        ref_boxes.BoxMode.XYXY_ABS,
    ).numpy()
    got_r = BoxMode.convert(xywha.copy(), BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(got_r, want_r, atol=1e-3)


def test_pairwise_iou_parity(ref_full):
    """pairwise_iou vs the reference's own Boxes op (boxes.py:314-350)."""
    ref = ref_full
    torch = ref.torch
    import importlib

    ref_boxes = importlib.import_module("detectron2.structures.boxes")
    from detectron2_centernet_tpu.structures import Boxes, pairwise_iou

    rng = np.random.RandomState(19)
    a = rng.rand(13, 4).astype(np.float32) * 80
    a[:, 2:] = a[:, :2] + rng.rand(13, 2).astype(np.float32) * 50
    b = rng.rand(9, 4).astype(np.float32) * 80
    b[:, 2:] = b[:, :2] + rng.rand(9, 2).astype(np.float32) * 50
    want = ref_boxes.pairwise_iou(
        ref_boxes.Boxes(torch.from_numpy(a)), ref_boxes.Boxes(torch.from_numpy(b))
    ).numpy()
    got = np.asarray(pairwise_iou(Boxes(a), Boxes(b)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_keypoints_to_heatmap_parity(ref_full):
    """Keypoint target encoding vs the reference's own _keypoints_to_heatmap
    (structures/keypoints.py:85-142): identical flat heatmap indices and
    validity for random keypoints/rois (the training-target side of the
    decode golden)."""
    ref = ref_full
    torch = ref.torch
    import importlib

    ref_kp = importlib.import_module("detectron2.structures.keypoints")
    import jax.numpy as jnp2

    from detectron2_centernet_tpu.models.roi_heads.keypoint_head import (
        encode_keypoint_targets,
    )

    rng = np.random.RandomState(23)
    s, k, hm = 10, 17, 14
    rois = rng.rand(s, 4).astype(np.float32) * 60
    rois[:, 2:] = rois[:, :2] + 10 + rng.rand(s, 2).astype(np.float32) * 50
    kpts = np.zeros((s, k, 3), np.float32)
    kpts[..., 0] = rng.rand(s, k) * 120
    kpts[..., 1] = rng.rand(s, k) * 120
    kpts[..., 2] = rng.randint(0, 3, (s, k))

    with torch.no_grad():
        want_idx, want_valid = ref_kp._keypoints_to_heatmap(
            torch.from_numpy(kpts), torch.from_numpy(rois), hm
        )
    got_idx, got_valid = encode_keypoint_targets(
        jnp2.asarray(kpts), jnp2.asarray(rois), hm
    )
    gv = np.asarray(got_valid) > 0
    wv = want_valid.numpy() > 0
    np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(
        np.asarray(got_idx)[gv], want_idx.numpy()[wv]
    )


def test_deeplab_stem_parity(ref_full):
    """DeepLabStem vs the reference DeepLab project's own module
    (deeplab/resnet.py:14-72, loaded by file path): 3x [3x3 conv + BN +
    relu] + maxpool, first conv s2."""
    ref = ref_full
    torch = ref.torch
    import importlib
    import importlib.util
    import sys

    modeling = sys.modules["detectron2.modeling"]
    if not hasattr(modeling, "BACKBONE_REGISTRY"):
        bb = importlib.import_module("detectron2.modeling.backbone.build")
        modeling.BACKBONE_REGISTRY = bb.BACKBONE_REGISTRY
    spec = importlib.util.spec_from_file_location(
        "_ref_deeplab_resnet",
        "/root/reference/projects/DeepLab/deeplab/resnet.py",
    )
    ref_dl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_dl)

    from detectron2_centernet_tpu.models.backbones.resnet import DeepLabStem

    t = ref_dl.DeepLabStem(in_channels=3, out_channels=32, norm="BN")
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(15)
    x = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad():
        want = t(x)

    m = DeepLabStem(out_channels=32, norm="BN")
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj, False)
    variables = _transfer(t, variables)
    got = np.asarray(m.apply(variables, xj, False))
    np.testing.assert_allclose(got, to_nhwc(want), atol=ATOL)



def test_densepose_deeplab_head_parity(ref_full):
    """DensePoseDeepLabHead vs the reference DensePose project's own module
    (densepose/modeling/roi_heads/deeplab.py:15-77, imported through a
    synthetic package so its relative registry import resolves): ASPP at
    rates 6/12/56 (1x1 + three dilated + global-pool branches, GN+relu,
    1x1 project) followed by the GN conv stack."""
    ref = ref_full
    torch = ref.torch
    import importlib
    import sys
    import types as _types

    pkg = _types.ModuleType("_ref_dp_roi_heads")
    pkg.__path__ = [
        "/root/reference/projects/DensePose/densepose/modeling/roi_heads"
    ]
    sys.modules["_ref_dp_roi_heads"] = pkg
    ref_dl = importlib.import_module("_ref_dp_roi_heads.deeplab")

    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(__file__), "..", "..", "projects", "DensePose"))
    from densepose_tpu.modeling import DensePoseDeepLabHead

    from detectron2_centernet_tpu.config import CfgNode as CN

    cfg = CN()
    cfg.MODEL = CN()
    c = CN()
    c.CONV_HEAD_DIM = 64
    c.CONV_HEAD_KERNEL = 3
    c.NUM_STACKED_CONVS = 2
    c.DEEPLAB = CN()
    c.DEEPLAB.NORM = "GN"
    c.DEEPLAB.NONLOCAL_ON = 0
    cfg.MODEL.ROI_DENSEPOSE_HEAD = c

    ch, p = 64, 14
    t = ref_dl.DensePoseDeepLabHead(cfg, ch)
    seed_torch_module(t)
    t.eval()
    g = torch.Generator().manual_seed(5)
    x = torch.randn(2, ch, p, p, generator=g)
    with torch.no_grad():
        want = t(x).numpy()  # (N, hidden, p, p)

    m = DensePoseDeepLabHead(num_convs=2, hidden_dim=64, kernel=3, norm="GN")
    xj = jnp.asarray(to_nhwc(x))
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = _transfer(t, variables)
    got = np.asarray(m.apply(variables, xj))
    np.testing.assert_allclose(
        got, np.transpose(want, (0, 2, 3, 1)), atol=5e-4
    )
