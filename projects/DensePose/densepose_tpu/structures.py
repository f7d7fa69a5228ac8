"""DensePose result structures: box-resampled IUV rasters + compact codec.

Counterpart of the reference's ``densepose/data/structures.py``
``DensePoseResult`` (:536-640): per detection, the chart outputs are
resampled from the fixed head raster into the detection box and packed as
a ``(3, h, w)`` uint8 IUV array (part index, U*255, V*255), then
PNG-compressed to a base64 string — the format ``apply_net.py dump``
emits, ``query_db``-style tooling consumes, and the visualizers render.

TPU-shape deviation (documented): the reference keeps per-part LOGIT
volumes per detection and bilinearly resamples those before the argmax
(:555-580).  This framework's jitted inference already reduces to
``dp_labels`` (argmaxed part id) / ``dp_u`` / ``dp_v`` rasters of static
size, so the resample interpolates part ids nearest-neighbor and U/V
bilinearly — identical away from part boundaries, one-texel differences
possible along them.
"""

import base64
from io import BytesIO
from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "DensePoseDataRelative",
    "DensePoseTransformData",
    "DensePoseResult",
    "DensePoseResultExtractor",
    "MASK_LABEL_SYMMETRIES",
    "POINT_LABEL_SYMMETRIES",
    "resample_iuv_to_bbox",
]

# Horizontal-flip label symmetries, hardcoded in the reference
# (data/structures.py:13-16) — NOT part of the external UV-transform .mat.
MASK_LABEL_SYMMETRIES = [0, 1, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13, 12, 14]
POINT_LABEL_SYMMETRIES = [
    0, 1, 2, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15, 18, 17,
    20, 19, 22, 21, 24, 23,
]


class DensePoseTransformData:
    """Horizontal-flip transform data: the hardcoded label symmetries plus
    the within-part U/V chart symmetry lookup tables (reference
    ``data/structures.py::DensePoseTransformData`` :11-64, loaded from the
    external ``UV_symmetry_transforms.mat``).

    ``uv_symmetries`` maps ``"U_transforms"``/``"V_transforms"`` to
    ``(24, 256, 256)`` float arrays: for a point in part ``i`` (1..24) at
    chart coordinates (u, v), the flipped chart coordinates are
    ``T[i-1][int(v*255), int(u*255)]``.
    """

    MASK_LABEL_SYMMETRIES = MASK_LABEL_SYMMETRIES
    POINT_LABEL_SYMMETRIES = POINT_LABEL_SYMMETRIES

    def __init__(self, uv_symmetries: dict):
        self.mask_label_symmetries = self.MASK_LABEL_SYMMETRIES
        self.point_label_symmetries = self.POINT_LABEL_SYMMETRIES
        self.uv_symmetries = {
            key: np.asarray(val, np.float32) for key, val in uv_symmetries.items()
        }

    @staticmethod
    def load(io) -> "DensePoseTransformData":
        """Load from the reference's .mat layout: each key holds a
        (1, 24) object array of (256, 256) tables (reference :43-64)."""
        import scipy.io

        raw = scipy.io.loadmat(io)
        uv_symmetries = {}
        for key in ("U_transforms", "V_transforms"):
            src = raw[key]
            uv_symmetries[key] = np.stack(
                [np.asarray(src[0, i], np.float32) for i in range(src.shape[1])]
            )
        return DensePoseTransformData(uv_symmetries)

    def apply_uv(self, i_old: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Remap chart (u, v) through the per-part symmetry tables.

        ``i_old`` are the PRE-swap part labels — the reference indexes the
        tables by the original label (structures.py:194-208).  Background
        (label 0) passes through unchanged."""
        i_old = np.asarray(i_old)
        u_loc = np.clip((np.asarray(u) * 255.0), 0, 255).astype(np.int64)
        v_loc = np.clip((np.asarray(v) * 255.0), 0, 255).astype(np.int64)
        part = np.clip(i_old.astype(np.int64) - 1, 0, 23)
        u_new = self.uv_symmetries["U_transforms"][part, v_loc, u_loc]
        v_new = self.uv_symmetries["V_transforms"][part, v_loc, u_loc]
        fg = i_old > 0
        return (
            np.where(fg, u_new, u).astype(np.float32),
            np.where(fg, v_new, v).astype(np.float32),
        )


class DensePoseDataRelative:
    """Host-side container for one instance's dense-pose GT annotation
    (reference ``densepose/data/structures.py::DensePoseDataRelative``
    :68-230): annotated points in 256-normalized gt-box coordinates
    (``x``/``y`` in [0, 255]), their part labels ``i`` (1..24) and chart
    coordinates ``u``/``v`` in [0, 1], plus the 256x256 coarse
    segmentation raster ``segm`` with values 0..14 decoded from the
    14 per-part RLEs.

    numpy arrays instead of torch tensors — this object only feeds
    host-side tooling (``query_db`` visualization, dataset inspection);
    the jitted training path consumes the fixed-shape packing produced by
    ``DensePoseDatasetMapper`` instead.
    """

    X_KEY = "dp_x"
    Y_KEY = "dp_y"
    U_KEY = "dp_U"
    V_KEY = "dp_V"
    I_KEY = "dp_I"
    S_KEY = "dp_masks"
    N_BODY_PARTS = 14
    N_PART_LABELS = 24
    MASK_SIZE = 256

    def __init__(self, annotation: dict, cleanup: bool = False):
        is_valid, reason = self.validate_annotation(annotation)
        assert is_valid, f"Invalid DensePose annotations: {reason}"
        self.x = np.asarray(annotation[self.X_KEY], np.float32)
        self.y = np.asarray(annotation[self.Y_KEY], np.float32)
        self.i = np.asarray(annotation[self.I_KEY], np.float32)
        self.u = np.asarray(annotation[self.U_KEY], np.float32)
        self.v = np.asarray(annotation[self.V_KEY], np.float32)
        self.segm = self.extract_segmentation_mask(annotation)
        if cleanup:
            self.cleanup_annotation(annotation)

    @classmethod
    def extract_segmentation_mask(cls, annotation: dict) -> np.ndarray:
        """14 per-part RLE specs -> (256, 256) float raster, part id i+1
        painted over zeros in list order (reference :128-143)."""
        from detectron2_centernet_tpu.structures.rle import rle_to_mask

        poly_specs = annotation[cls.S_KEY]
        if isinstance(poly_specs, np.ndarray):
            return poly_specs
        segm = np.zeros((cls.MASK_SIZE, cls.MASK_SIZE), np.float32)
        for part_id in range(cls.N_BODY_PARTS):
            spec = poly_specs[part_id] if part_id < len(poly_specs) else None
            if spec:
                segm[rle_to_mask(spec) > 0] = part_id + 1
        return segm

    @classmethod
    def validate_annotation(cls, annotation: dict):
        for key in (cls.X_KEY, cls.Y_KEY, cls.I_KEY, cls.U_KEY, cls.V_KEY,
                    cls.S_KEY):
            if key not in annotation:
                return False, f"no {key} data in the annotation"
        return True, None

    @classmethod
    def cleanup_annotation(cls, annotation: dict) -> None:
        for key in (cls.X_KEY, cls.Y_KEY, cls.I_KEY, cls.U_KEY, cls.V_KEY,
                    cls.S_KEY):
            annotation.pop(key, None)

    def apply_hflip(self, transform_data: "DensePoseTransformData" = None) -> None:
        """Mirror the annotation in the gt-box frame (reference
        ``_transform_pts``/``_transform_segm`` :173-230): x -> 256 - x,
        left/right point-label swap, segm mirror + mask-label swap.  When
        ``transform_data`` (the external .mat lookup) is given, u/v are
        remapped through the within-part chart symmetry as well; without
        it they stay in the mirrored chart — a documented deviation."""
        self.x = self.MASK_SIZE - self.x
        if transform_data is not None:
            self.u, self.v = transform_data.apply_uv(self.i, self.u, self.v)
        pt_sym = np.asarray(POINT_LABEL_SYMMETRIES, np.float32)
        self.i = pt_sym[self.i.astype(np.int64)]
        mask_sym = np.asarray(MASK_LABEL_SYMMETRIES, np.float32)
        self.segm = mask_sym[self.segm[:, ::-1].astype(np.int64)]


def _bilinear_resize(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """align_corners=False bilinear resize of a (S, S) float raster."""
    s_h, s_w = arr.shape
    ys = (np.arange(h, dtype=np.float64) + 0.5) * (s_h / h) - 0.5
    xs = (np.arange(w, dtype=np.float64) + 0.5) * (s_w / w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, s_h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, s_w - 1)
    y1 = np.clip(y0 + 1, 0, s_h - 1)
    x1 = np.clip(x0 + 1, 0, s_w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = arr[np.ix_(y0, x0)]
    b = arr[np.ix_(y0, x1)]
    c = arr[np.ix_(y1, x0)]
    d = arr[np.ix_(y1, x1)]
    return (
        a * (1 - fy) * (1 - fx)
        + b * (1 - fy) * fx
        + c * fy * (1 - fx)
        + d * fy * fx
    )


def _nearest_resize(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    s_h, s_w = arr.shape
    ys = np.clip(((np.arange(h) + 0.5) * (s_h / h)).astype(np.int64), 0, s_h - 1)
    xs = np.clip(((np.arange(w) + 0.5) * (s_w / w)).astype(np.int64), 0, s_w - 1)
    return arr[np.ix_(ys, xs)]


def resample_iuv_to_bbox(
    labels: np.ndarray, u: np.ndarray, v: np.ndarray, box_xywh: Sequence[float]
) -> np.ndarray:
    """(S, S) head rasters -> (3, h, w) uint8 IUV in box coordinates.

    Channel 0 = part index (0 = background, 1..24 = chart parts); channels
    1/2 = U/V scaled to [0, 255], zeroed on background (reference
    ``_output_to_result``, structures.py:555-595)."""
    x, y, w, h = box_xywh
    w = max(int(w), 1)
    h = max(int(h), 1)
    i_box = _nearest_resize(np.asarray(labels), h, w).astype(np.uint8)
    u_box = _bilinear_resize(np.asarray(u, np.float64), h, w)
    v_box = _bilinear_resize(np.asarray(v, np.float64), h, w)
    out = np.zeros((3, h, w), np.uint8)
    fg = i_box > 0
    out[0] = i_box
    out[1][fg] = np.clip(u_box[fg] * 255.0, 0, 255).astype(np.uint8)
    out[2][fg] = np.clip(v_box[fg] * 255.0, 0, 255).astype(np.uint8)
    return out


class DensePoseResult:
    """Per-image packed DensePose results (PNG-compressed IUV + boxes).

    ``results[i]`` is ``(shape, base64_png)``; ``boxes_xywh[i]`` the
    detection box — same access protocol as the reference class."""

    def __init__(
        self,
        boxes_xywh: np.ndarray,
        labels: Sequence[np.ndarray],
        u: Sequence[np.ndarray],
        v: Sequence[np.ndarray],
    ):
        boxes_xywh = np.asarray(boxes_xywh, np.float64).reshape(-1, 4)
        self.boxes_xywh: List[List[float]] = boxes_xywh.tolist()
        self.results: List[Tuple[tuple, str]] = []
        for i, box in enumerate(boxes_xywh):
            iuv = resample_iuv_to_bbox(labels[i], u[i], v[i], box)
            self.results.append((iuv.shape, self.encode_png_data(iuv)))

    @staticmethod
    def encode_png_data(arr: np.ndarray) -> str:
        """(3, M, N) uint8 -> base64 PNG (max compression), reference
        ``encode_png_data`` (structures.py:597-618)."""
        assert arr.ndim == 3 and arr.shape[0] == 3, arr.shape
        assert arr.dtype == np.uint8, arr.dtype
        from PIL import Image

        im = Image.fromarray(np.moveaxis(arr, 0, -1))
        f = BytesIO()
        im.save(f, format="png", optimize=True)
        return base64.encodebytes(f.getvalue()).decode()

    @staticmethod
    def decode_png_data(shape: tuple, s: str) -> np.ndarray:
        """base64 PNG -> (3, M, N) uint8 (reference :620-629)."""
        from PIL import Image

        f = BytesIO(base64.decodebytes(s.encode()))
        im = Image.open(f)
        data = np.moveaxis(np.asarray(im, dtype=np.uint8), -1, 0)
        return data.reshape(shape)

    def __len__(self) -> int:
        return len(self.results)

    def __getitem__(self, item: int):
        return self.results[item], self.boxes_xywh[item]

    def __str__(self) -> str:
        return "DensePoseResult: N={} [{}]".format(
            len(self.results),
            ", ".join(str(list(r[0])) for r in self.results),
        )


class DensePoseResultExtractor:
    """Instances -> (DensePoseResult, boxes_xywh) for visualizers/dumps
    (reference ``vis/extractor.py::DensePoseResultExtractor``)."""

    def __call__(self, instances, select=None):
        if not hasattr(instances, "dp_labels") or len(instances) == 0:
            return None, None
        boxes = np.asarray(instances.pred_boxes.tensor)
        boxes_xywh = boxes.copy()
        boxes_xywh[:, 2] -= boxes_xywh[:, 0]
        boxes_xywh[:, 3] -= boxes_xywh[:, 1]
        labels = [np.asarray(m) for m in instances.dp_labels]
        u = [np.asarray(m) for m in instances.dp_u]
        v = [np.asarray(m) for m in instances.dp_v]
        if select is not None:
            keep = np.nonzero(np.asarray(select))[0]
            boxes_xywh = boxes_xywh[keep]
            labels = [labels[i] for i in keep]
            u = [u[i] for i in keep]
            v = [v[i] for i in keep]
        return DensePoseResult(boxes_xywh, labels, u, v), boxes_xywh
