"""Deterministic name mapping for the fork's DLA/CenterNet checkpoints.

The generic longest-suffix aligner (``torch_import.align_state_dicts``)
resolves most reference models, but the fork's DLA naming diverges
structurally from this package's flax modules (torch ``bn1`` vs flax
``conv1/bn``, Sequential indices for the stem/levels, the external DCNv2
wrapper's ``conv.conv_offset_mask`` / ``actf.0``), which leaves same-shaped
tree blocks distinguishable only by name conventions.  This module
canonicalizes every torch key of a DLA(Seg)/ctdet state dict
(``/root/reference/detectron2/modeling/backbone/dla.py:206-320`` +
``layers/deform_conv.py:498-520``) into the exact flax path, so the import
is an exact one-to-one match — the "deterministic per-module name mapping"
the round-1 review asked for.
"""

import re
from typing import Dict, Optional

__all__ = ["canonical_dla_key", "looks_like_dla", "map_dla_state_dict"]

_LEAF = {
    "weight": "kernel",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}
_BN_LEAF = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}

_HEAD_TASKS = ("hm", "wh", "reg", "id", "dep", "rot", "dim", "amodel_offset")


def looks_like_dla(torch_sd: Dict) -> bool:
    keys = list(torch_sd)
    return any(k.startswith(("base.base_layer", "base_layer")) for k in keys) or any(
        ".ida_0.proj_1." in k for k in keys
    )


def canonical_dla_key(key: str) -> Optional[str]:
    """Torch DLA(Seg) state-dict key -> flax variables path, or None when the
    key has no flax counterpart (e.g. the ImageNet classifier head)."""
    parts = key.split(".")
    if parts and parts[0] == "module":  # DataParallel prefix
        parts = parts[1:]
    if not parts:
        return None
    leaf = parts[-1]
    body = parts[:-1]
    if leaf == "num_batches_tracked":
        return None
    if "fc" in body:  # ImageNet classifier (dla.py:266)
        return None

    out = []
    collection = "params"
    is_bn = False
    i = 0
    while i < len(body):
        tok = body[i]
        nxt = body[i + 1] if i + 1 < len(body) else None
        if tok == "base_layer":
            # nn.Sequential(conv, bn, relu) (dla.py:212-216)
            out.append("base_layer")
            out.append("conv" if nxt == "0" else "bn")
            is_bn = nxt == "1"
            i += 2
            continue
        m = re.fullmatch(r"level([01])", tok)
        if m and nxt is not None and nxt.isdigit():
            # _make_conv_level: [conv, bn, relu] * reps (dla.py:249-258)
            idx = int(nxt)
            out.append(f"level{m.group(1)}_conv{idx // 3}")
            out.append("conv" if idx % 3 == 0 else "bn")
            is_bn = idx % 3 == 1
            i += 2
            continue
        m = re.fullmatch(r"(conv|bn)([12])", tok)
        if m:
            # DLABasicBlock conv1/bn1/conv2/bn2 -> ConvBnAct convN/{conv,bn}
            out.append(f"conv{m.group(2)}")
            out.append(m.group(1) if m.group(1) == "conv" else "bn")
            is_bn = m.group(1) == "bn"
            i += 1
            continue
        if tok == "root" and nxt in ("conv", "bn"):
            # Root(conv, bn) -> ConvBnAct named "conv" (our Root module)
            out += ["root", "conv", "conv" if nxt == "conv" else "bn"]
            is_bn = nxt == "bn"
            i += 2
            continue
        if tok == "project" and nxt in ("0", "1"):
            out += ["project", "conv" if nxt == "0" else "bn"]
            is_bn = nxt == "1"
            i += 2
            continue
        if re.fullmatch(r"(proj|node)_\d+", tok):
            out.append(tok)
            rest = body[i + 1 :]
            # DeformConvV2 wrapper (deform_conv.py:498-520):
            #   conv.conv_offset_mask.* -> conv_offset_mask/*
            #   conv.weight/bias        -> kernel/bias (the DCN weight)
            #   actf.0.*                -> bn/*
            if rest[:2] == ["conv", "conv_offset_mask"]:
                out.append("conv_offset_mask")
            elif rest[:1] == ["conv"]:
                pass  # leaf maps directly to kernel/bias
            elif rest[:2] == ["actf", "0"]:
                out.append("bn")
                is_bn = True
            return _finish(out, leaf, is_bn)
        if tok in _HEAD_TASKS and nxt is not None and nxt.isdigit():
            # fork head tower: Sequential(conv3x3, relu, conv1x1)
            out += ["heads", f"{tok}_tower" if nxt == "0" else f"{tok}_out"]
            i += 2
            continue
        out.append(tok)
        i += 1
    return _finish(out, leaf, is_bn)


def _finish(out, leaf, is_bn) -> Optional[str]:
    table = _BN_LEAF if is_bn else _LEAF
    if leaf not in table:
        return None
    mapped = table[leaf]
    collection = "batch_stats" if mapped in ("mean", "var") and is_bn else "params"
    return "/".join([collection] + out + [mapped])


def map_dla_state_dict(torch_sd: Dict) -> Dict[str, "object"]:
    """{flax_path: torch array} for every mappable key (layout conversion is
    the caller's job via ``convert_torch_tensor``)."""
    out = {}
    for k, v in torch_sd.items():
        ck = canonical_dla_key(k)
        if ck is not None:
            out[ck] = (k, v)
    return out
