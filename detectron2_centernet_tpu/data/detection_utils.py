"""Data-side utilities: image IO, annotation handling, affine geometry.

Counterpart of the reference's ``detectron2/data/detection_utils.py`` with the
TPU redesign applied: per-image work stays host-side numpy (decode, affine
warp via cv2, box transform), but everything that used to be a per-object
python loop *inside model forward* (gaussian target rendering,
detection_utils.py:600-705) lives on-device in ``ops/target_gen.py``.

The affine-warp convention follows the CenterNet training recipe: one 2x3
matrix M maps original-image pixels to network-input pixels; boxes warp with
the same M; its inverse un-maps predicted boxes at the host boundary
(models/meta_arch/centernet.py ``postprocess``).
"""

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageOps

from ..structures import BoxMode

logger = logging.getLogger(__name__)


def convert_PIL_to_numpy(image: Image.Image, format: Optional[str]) -> np.ndarray:
    """Reference detection_utils.py:38-70."""
    if format is not None:
        conversion_format = "RGB" if format in ("BGR", "YUV-BT.601") else format
        image = image.convert(conversion_format)
    image = np.asarray(image)
    if format == "L":
        image = np.expand_dims(image, -1)
    elif format == "BGR":
        image = image[:, :, ::-1]
    elif format == "YUV-BT.601":
        image = image / 255.0
        _M_RGB2YUV = np.array(
            [[0.299, 0.587, 0.114], [-0.14713, -0.28886, 0.436], [0.615, -0.51499, -0.10001]]
        )
        image = np.dot(image, _M_RGB2YUV.T)
    return image


# When True, read_image always decodes through PIL. libjpeg-turbo (cv2)
# and PIL differ in chroma upsampling/IDCT by up to +-1 LSB per pixel, so
# pixel-exact parity with goldens produced through the reference's
# PIL-based read_image needs this on.  Set automatically by DatasetMapper
# under cfg.TEST.EXACT_MODE.
FORCE_PIL_DECODE = False


def read_image(file_name: str, format: Optional[str] = None) -> np.ndarray:
    """Read an image, apply EXIF rotation, convert to the given format
    (reference detection_utils.py:120-186).

    BGR/RGB take the cv2 fast path (libjpeg-turbo decode + EXIF orientation,
    ~1.2 ms/img cheaper than PIL on this host, and the output is contiguous
    — the PIL-based BGR conversion produced a negative-stride channel view
    that roughly doubled the downstream cv2.warpAffine cost). Decoded pixels
    can differ from PIL's by +-1; set FORCE_PIL_DECODE (TEST.EXACT_MODE
    does) for pixel-exact parity with PIL-decoded reference goldens. Other
    formats (L, YUV-BT.601) keep the PIL path for exact reference
    semantics."""
    if format in ("BGR", "RGB") and not FORCE_PIL_DECODE:
        import cv2

        img = cv2.imread(file_name, cv2.IMREAD_COLOR)  # BGR, EXIF applied
        if img is not None:
            if format == "RGB":
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            return img
        # fall through to PIL for formats cv2 can't decode
    with open(file_name, "rb") as f:
        image = Image.open(f)
        try:
            image = ImageOps.exif_transpose(image)
        except Exception:
            pass
        out = convert_PIL_to_numpy(image, format)
        # BGR conversion above is a negative-stride view; downstream cv2
        # ops are much faster on contiguous memory
        return np.ascontiguousarray(out) if format == "BGR" else out


def check_image_size(dataset_dict: dict, image: np.ndarray) -> None:
    """Reference detection_utils.py:189-220."""
    h, w = image.shape[:2]
    if "width" in dataset_dict or "height" in dataset_dict:
        if (dataset_dict.get("width"), dataset_dict.get("height")) != (w, h):
            raise ValueError(
                f"Mismatched image shape for {dataset_dict.get('file_name', '')}: "
                f"file is {w}x{h}, annotation says "
                f"{dataset_dict.get('width')}x{dataset_dict.get('height')}."
            )
    dataset_dict.setdefault("width", w)
    dataset_dict.setdefault("height", h)


# ---------------------------------------------------------------------------
# Affine warp geometry (CenterNet-style scale+shift crop).
# ---------------------------------------------------------------------------

def get_affine_transform(
    center: np.ndarray,  # (2,) crop center in source pixels
    scale: float,  # source crop extent (max side, pixels)
    out_size: Tuple[int, int],  # (out_h, out_w)
) -> np.ndarray:
    """2x3 matrix mapping source pixels -> output pixels.

    Axis-aligned scale+translate (CenterNet uses no rotation): the square
    region of side ``scale`` centred at ``center`` maps onto the output so
    that the longer normalization matches the ctdet letterbox.
    """
    out_h, out_w = out_size
    s = np.float64(scale)
    sx = out_w / s
    sy = out_h / s
    tx = out_w / 2 - sx * center[0]
    ty = out_h / 2 - sy * center[1]
    return np.array([[sx, 0, tx], [0, sy, ty]], np.float64)


def invert_affine(m: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine matrix."""
    a = m[:, :2]
    t = m[:, 2]
    ainv = np.linalg.inv(a)
    return np.concatenate([ainv, (-ainv @ t)[:, None]], axis=1)


def apply_affine_to_points(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """pts (..., 2) through a 2x3 matrix."""
    return pts @ m[:, :2].T + m[:, 2]


def apply_affine_to_boxes(m: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """XYXY boxes (N, 4) -> axis-aligned envelope of all four warped
    corners (exact for axis-aligned affines; the tight-rotated-bbox
    behavior of the reference's RotationTransform.apply_box,
    transform.py:284-313, for rotations)."""
    if len(boxes) == 0:
        return boxes
    corners = np.stack(
        [
            boxes[:, [0, 1]], boxes[:, [2, 1]],
            boxes[:, [0, 3]], boxes[:, [2, 3]],
        ],
        axis=1,
    )  # (N, 4, 2)
    warped = apply_affine_to_points(m, corners)
    lo = warped.min(axis=1)
    hi = warped.max(axis=1)
    return np.concatenate([lo, hi], axis=1)


def unwarp_boxes(m: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Map XYXY boxes from warped (network-input) space back to source space
    through the inverse of a 2x3 warp, reordering corners (mirrored warps
    swap them)."""
    if len(boxes) == 0:
        return boxes
    return apply_affine_to_boxes(invert_affine(np.asarray(m, np.float64)), boxes)


def warp_image(image: np.ndarray, m: np.ndarray, out_size: Tuple[int, int]) -> np.ndarray:
    """Apply the 2x3 affine with bilinear sampling (cv2.warpAffine)."""
    import cv2

    if not image.flags["C_CONTIGUOUS"]:
        image = np.ascontiguousarray(image)  # cv2 is ~2x slower on views
    out_h, out_w = out_size
    return cv2.warpAffine(
        image, m.astype(np.float64), (out_w, out_h), flags=cv2.INTER_LINEAR
    )


def fast_letterbox(
    image: np.ndarray, out_size: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Centered aspect-preserving letterbox via ``cv2.resize`` + paste —
    ~3x cheaper than the equivalent ``warpAffine`` on the eval hot path
    (one host core feeds the chip; docs/DESIGN.md host roofline).

    Returns ``(canvas, m_eff)`` where ``m_eff`` is the EXACT source->canvas
    affine the operation applied: ``resize`` uses the half-pixel-center
    convention and the paste rectangle is integer-aligned, so the effective
    scale/translation differ from ``letterbox_transform``'s by <1 px.
    Downstream box un-mapping uses ``m_eff`` and stays self-consistent.
    """
    import cv2

    from .transforms import letterbox_transform

    h, w = image.shape[:2]
    out_h, out_w = out_size
    m = letterbox_transform(h, w, out_size)
    # paste rectangle of the source extent under the requested warp
    x0, y0 = m[0, 2], m[1, 2]
    x1, y1 = m[0, 0] * w + x0, m[1, 1] * h + y0
    xi0, yi0 = max(int(round(x0)), 0), max(int(round(y0)), 0)
    xi1, yi1 = min(int(round(x1)), out_w), min(int(round(y1)), out_h)
    rw, rh = max(xi1 - xi0, 1), max(yi1 - yi0, 1)
    resized = cv2.resize(image, (rw, rh), interpolation=cv2.INTER_LINEAR)
    canvas_shape = (out_h, out_w) + image.shape[2:]
    canvas = np.zeros(canvas_shape, image.dtype)
    canvas[yi0:yi0 + rh, xi0:xi0 + rw] = resized
    # effective affine: x_dst = s*(x_src + 0.5) - 0.5 + xi0
    sx, sy = rw / w, rh / h
    m_eff = np.array(
        [[sx, 0.0, xi0 + 0.5 * sx - 0.5], [0.0, sy, yi0 + 0.5 * sy - 0.5]],
        np.float64,
    )
    return canvas, m_eff


def letterbox_and_flip_variants(image: np.ndarray, sizes, flip: bool):
    """Yield (warped f32 image, warp matrix, flipped?, size) for each TTA
    variant: one square letterbox per size, plus the horizontal flip of each
    (models/test_time_augmentation.py).  The flip is composed INTO the warp
    matrix, so inverting the matrix un-maps flipped detections too — no
    separate unflip step (and no portrait/landscape asymmetry)."""
    h, w = image.shape[:2]
    for size in sizes:
        m = get_affine_transform(
            np.array([w / 2.0, h / 2.0]), float(max(h, w)), (size, size)
        )
        img_f32 = image.astype(np.float32)
        yield warp_image(img_f32, m, (size, size)), m, False, size
        if flip:
            f = np.array([[-1.0, 0.0, size - 1.0], [0.0, 1.0, 0.0]])
            mf = np.concatenate(
                [f[:, :2] @ m[:, :2], (f[:, :2] @ m[:, 2] + f[:, 2])[:, None]], axis=1
            )
            yield warp_image(img_f32, mf, (size, size)), mf, True, size


# ---------------------------------------------------------------------------
# Annotations -> fixed-capacity arrays
# ---------------------------------------------------------------------------

def annotations_to_boxes(
    annos: List[dict],
) -> Tuple[np.ndarray, np.ndarray]:
    """List of annotation dicts -> (boxes XYXY (N,4) f32, classes (N,) i64).

    The array analog of the reference's ``annotations_to_instances``
    (detection_utils.py:362-450) for the box task.
    """
    boxes = np.array(
        [BoxMode.convert(a["bbox"], a["bbox_mode"], BoxMode.XYXY_ABS) for a in annos],
        np.float32,
    ).reshape(-1, 4)
    classes = np.array([a["category_id"] for a in annos], np.int64)
    return boxes, classes


def filter_empty_boxes(
    boxes: np.ndarray, classes: np.ndarray, min_size: float = 1e-5
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop degenerate boxes (reference filter_empty_instances, :456-480)."""
    keep = (boxes[:, 2] - boxes[:, 0] > min_size) & (boxes[:, 3] - boxes[:, 1] > min_size)
    return boxes[keep], classes[keep]


def pad_to_capacity(
    boxes: np.ndarray, classes: np.ndarray, capacity: int
) -> Dict[str, np.ndarray]:
    """Fixed-slot padding: returns gt_boxes (M,4), gt_classes (M,), gt_valid (M,).

    Objects beyond ``capacity`` are dropped (the reference's gen_heatmap also
    caps at 128 objects, detection_utils.py:611-616).
    """
    n = min(len(boxes), capacity)
    out_boxes = np.zeros((capacity, 4), np.float32)
    out_classes = np.zeros((capacity,), np.int32)
    out_valid = np.zeros((capacity,), bool)
    out_boxes[:n] = boxes[:n]
    out_classes[:n] = classes[:n]
    out_valid[:n] = True
    return {"gt_boxes": out_boxes, "gt_classes": out_classes, "gt_valid": out_valid}
