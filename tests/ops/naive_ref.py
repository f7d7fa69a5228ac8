"""Naive numpy oracles for op parity tests.

Deliberately slow per-pixel/per-object loops written straight from the op
definitions (the testing pattern of reference tests/layers/test_roi_align.py:
compare the fast kernel against an obvious implementation on tiny inputs).
"""

import math

import numpy as np


def naive_modulated_deform_conv(x, offset, mask, weight, bias=None, stride=1, dilation=1):
    """x (N,H,W,Ci), offset (N,Ho,Wo,2K) [2k]=dy [2k+1]=dx, mask (N,Ho,Wo,K),
    weight (KH,KW,Ci,Co). SAME padding, zero outside."""
    n, h, w, ci = x.shape
    kh, kw, _, co = weight.shape
    pad_h = dilation * (kh - 1) // 2
    pad_w = dilation * (kw - 1) // 2
    ho = (h + 2 * pad_h - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * pad_w - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((n, ho, wo, co), np.float64)

    def sample(img, py, px):
        # bilinear with zero outside
        y0, x0 = math.floor(py), math.floor(px)
        val = np.zeros(ci, np.float64)
        for yy, xx in ((y0, x0), (y0, x0 + 1), (y0 + 1, x0), (y0 + 1, x0 + 1)):
            if 0 <= yy < h and 0 <= xx < w:
                wgt = (1 - abs(py - yy)) * (1 - abs(px - xx))
                val += wgt * img[yy, xx]
        return val

    for b in range(n):
        for i in range(ho):
            for j in range(wo):
                acc = np.zeros(co, np.float64)
                for ky in range(kh):
                    for kx in range(kw):
                        t = ky * kw + kx
                        py = i * stride - pad_h + ky * dilation + offset[b, i, j, 2 * t]
                        px = j * stride - pad_w + kx * dilation + offset[b, i, j, 2 * t + 1]
                        v = sample(x[b], py, px) * mask[b, i, j, t]
                        acc += v @ weight[ky, kx]
                out[b, i, j] = acc
    if bias is not None:
        out += bias
    return out.astype(np.float32)


def ref_gaussian_radius(det_size, min_overlap=0.7):
    """Scalar gaussian radius, the reference 3-case formula
    (detection_utils.py:654-680)."""
    height, width = det_size
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * c1)) / 2
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    # the reference divides all roots by 2 (detection_utils.py:654-680)
    r2 = (b2 + np.sqrt(b2 ** 2 - 16 * c2)) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def naive_centernet_targets(boxes, classes, num_classes, out_h, out_w, max_objs=128, down_ratio=4):
    """Per-object stamping loop with the reference's window/clip/max rules."""
    hm = np.zeros((out_h, out_w, num_classes), np.float32)
    wh = np.zeros((max_objs, 2), np.float32)
    reg = np.zeros((max_objs, 2), np.float32)
    ind = np.zeros(max_objs, np.int64)
    reg_mask = np.zeros(max_objs, np.float32)
    for k in range(min(len(boxes), max_objs)):
        bb = np.asarray(boxes[k], np.float32) / down_ratio
        hgt, wdt = bb[3] - bb[1], bb[2] - bb[0]
        if hgt <= 0 or wdt <= 0:
            continue
        radius = max(0, int(ref_gaussian_radius((math.ceil(hgt), math.ceil(wdt)))))
        ct = np.array([(bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2], np.float32)
        ct_int = ct.astype(np.int32)
        cx, cy = int(ct_int[0]), int(ct_int[1])
        d = 2 * radius + 1
        sigma = d / 6.0
        for yy in range(max(0, cy - radius), min(out_h, cy + radius + 1)):
            for xx in range(max(0, cx - radius), min(out_w, cx + radius + 1)):
                g = math.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma * sigma))
                c = int(classes[k])
                hm[yy, xx, c] = max(hm[yy, xx, c], g)
        wh[k] = wdt, hgt
        ind[k] = cy * out_w + cx
        reg[k] = ct - ct_int
        reg_mask[k] = 1
    return {"hm": hm, "wh": wh, "reg": reg, "ind": ind, "reg_mask": reg_mask}


def naive_ctdet_decode(hm, wh, reg, k=100, down_ratio=4):
    """hm (H,W,C) single image; peak-suppress, global top-k, box assembly."""
    h, w, c = hm.shape
    # 3x3 max filter with -inf padding
    padded = np.full((h + 2, w + 2, c), -np.inf, hm.dtype)
    padded[1:-1, 1:-1] = hm
    keep = np.ones_like(hm, bool)
    for dy in range(3):
        for dx in range(3):
            keep &= hm >= padded[dy : dy + h, dx : dx + w]
    scores_map = np.where(keep, hm, 0.0)
    flat = scores_map.transpose(2, 0, 1).reshape(-1)  # (C*H*W) class-major
    order = np.argsort(-flat, kind="stable")[:k]
    scores = flat[order]
    classes = order // (h * w)
    pix = order % (h * w)
    ys = (pix // w).astype(np.float32)
    xs = (pix % w).astype(np.float32)
    regs = reg.reshape(h * w, 2)[pix]
    xs = xs + regs[:, 0]
    ys = ys + regs[:, 1]
    whs = wh.reshape(h * w, 2)[pix]
    boxes = np.stack(
        [xs - whs[:, 0] / 2, ys - whs[:, 1] / 2, xs + whs[:, 0] / 2, ys + whs[:, 1] / 2],
        axis=1,
    ) * down_ratio
    return boxes, scores, classes
