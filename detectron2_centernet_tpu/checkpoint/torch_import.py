"""Import reference torch checkpoints (.pth/.pkl) into flax pytrees.

Counterpart of the reference's ``checkpoint/c2_model_loading.py`` (fuzzy
name alignment, ``align_and_update_state_dicts`` :211-313) for the torch→JAX
direction: needed to load the reference model zoo (ImageNet DLA-34, trained
ctdet .pth) for mAP-parity validation (SURVEY.md §7 hard part #5).

Layout conversions:
  * conv weight  OIHW -> HWIO
  * depthwise ConvTranspose2d (O,1,KH,KW grouped) -> our (KH,KW,1,O) kernel
  * linear weight (O,I) -> (I,O)
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias + mean/var

Alignment strategy: DLA-family checkpoints match through the exact
deterministic name map (``dla_import``); everything else through
shape-checked longest-common-token-suffix matching (letter/digit boundary
tokens, norm-wrapper normalization, densely renumbered Sequential indices),
one-to-one with a logged match table — the reference's
``align_and_update_state_dicts`` behavior.
"""

import logging
import pickle
from typing import Any, Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["load_torch_state_dict", "convert_torch_tensor", "align_state_dicts", "load_torch_weights"]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth (torch.load) or .pkl (pickle) into {name: ndarray}."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    if isinstance(data, dict) and "state_dict" in data:
        data = data["state_dict"]
    out = {}
    for k, v in data.items():
        if hasattr(v, "numpy"):
            v = v.detach().cpu().numpy() if hasattr(v, "detach") else v.numpy()
        if isinstance(v, np.ndarray):
            out[k] = v
    return out


def convert_torch_tensor(name: str, arr: np.ndarray) -> np.ndarray:
    """Torch layout -> flax layout, keyed on name/shape heuristics.

    ConvTranspose2d weights ("deconv"/"up" names) additionally need a
    spatial FLIP: torch's transposed conv correlates the dilated input with
    the spatially reversed kernel, while our flax deconvs (nn.ConvTranspose
    / BilinearUpsample's input-dilated conv) correlate with the kernel
    as-is.  Torch deconv weight layout is (in, out/groups, kH, kW):
      * dense deconv  (I, O, KH, KW)  -> flip(kh,kw) -> (KH, KW, I, O)
      * depthwise up  (C, 1, KH, KW)  -> flip(kh,kw) -> (KH, KW, 1, C)
    (verified numerically vs torch; symmetric bilinear-init kernels hid
    the flip until whole-model parity tests caught it)."""
    if arr.ndim == 4:
        d0, d1, kh, kw = arr.shape
        segs = name.split(".")
        owner = segs[-2] if len(segs) >= 2 else ""
        if name.endswith("weight"):
            # grouped depthwise up-kernel (C,1,KH,KW) — unambiguous shape;
            # 'up*'-owned (DLA IDAUp) or explicit 'deconv' names
            if ("deconv" in name or owner.startswith("up")) and d1 == 1 and d0 > 1:
                flipped = arr[:, :, ::-1, ::-1]
                return np.ascontiguousarray(np.transpose(flipped, (2, 3, 1, 0)))
            # dense ConvTranspose2d (I,O,KH,KW) -> (KH,KW,I,O): requires an
            # explicit 'deconv' name — an 'up*'-owned name alone could be a
            # regular Conv2d (e.g. 'upsample.conv') whose channels a blind
            # deconv transpose would silently swap
            if "deconv" in name:
                flipped = arr[:, :, ::-1, ::-1]
                return np.ascontiguousarray(np.transpose(flipped, (2, 3, 0, 1)))
        return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
    if arr.ndim == 2:
        return arr.T  # (O, I) -> (I, O)
    return arr


_SKIP_SUFFIXES = ("num_batches_tracked",)


def _flatten_boundary_channels(torch_sd: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Detect conv -> flatten -> fc boundaries from state-dict ORDER: the
    first 2-D ``.weight`` whose previous ``.weight`` is 4-D consumes a
    flattened NCHW feature. Our flax modules flatten NHWC, so that fc
    weight's input dim must be permuted from (C, H, W)-major to
    (H, W, C)-major at import (H = W assumed: every pooled roi feature in
    this framework is square). The flattened feature may come from a conv
    EARLIER than the immediately-preceding one (Mask R-CNN's box-head fc
    follows the RPN's 12-channel anchor_deltas conv in state-dict order but
    consumes the 256-channel pooled FPN feature), so candidate channel
    counts are walked newest-first until one divides the fc input into a
    square spatial extent. Returns {torch_key: conv_out_channels}."""
    out: Dict[str, int] = {}
    last_w_ndim = 0
    couts: List[int] = []  # 4-D couts in state-dict order
    for k, v in torch_sd.items():
        if not k.endswith("weight") or v.ndim not in (2, 4):
            continue
        if v.ndim == 2 and last_w_ndim == 4:
            for c in reversed(couts):
                hw = v.shape[1] // c if c and v.shape[1] % c == 0 else 0
                side = int(round(hw ** 0.5)) if hw else 0
                if side and side * side == hw:
                    out[k] = c
                    break
        if v.ndim == 4:
            # conv OIHW -> out = d0; deconv (I, O, kh, kw) -> out = d1
            segs = k.split(".")
            owner = segs[-2] if len(segs) >= 2 else ""
            is_deconv = "deconv" in k or owner.startswith("up")
            couts.append(v.shape[1] if is_deconv else v.shape[0])
        last_w_ndim = v.ndim
    # Propagate to numeric siblings: cascade heads repeat the same
    # pool->flatten->fc tower per stage (roi_heads.box_head.{0,1,2}.fc1),
    # but only stage 0's fc1 follows a 4-D weight in state-dict order —
    # stage 1+ follow the previous stage's 2-D predictor. A same-shaped key
    # that differs from a flagged boundary key only in numeric segments
    # consumes the same pooled feature and needs the same permute.
    import re

    def depattern(key: str) -> str:
        return re.sub(r"(^|\.)\d+(\.|$)", r"\1#\2", key)

    flagged = {depattern(k): (c, torch_sd[k].shape) for k, c in out.items()}
    for k, v in torch_sd.items():
        if k in out or not k.endswith("weight") or v.ndim != 2:
            continue
        hit = flagged.get(depattern(k))
        if hit is not None and hit[1] == v.shape:
            out[k] = hit[0]
    return out


def _permute_flattened_fc_t(arr_oi: np.ndarray, c: int) -> np.ndarray:
    """Torch (O, I=(C,H,W)-major) fc weight -> flax Dense kernel (I, O)
    with the input dim re-ordered to the NHWC flatten."""
    o, i = arr_oi.shape
    hw = i // c
    side = int(round(hw ** 0.5))
    w = arr_oi.reshape(o, c, side, side).transpose(0, 2, 3, 1).reshape(o, i)
    return w.T  # flax Dense kernel (I, O)


def _flatten_pytree(tree: Any, prefix: str = "") -> List[Tuple[str, np.ndarray]]:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        out.append((prefix + name, np.asarray(leaf)))
    return out


_TOKEN_SYNONYMS = {
    # flax param naming -> torch naming, so shape-ambiguous norm leaves
    # (scale/bias/mean/var are all (C,)) resolve deterministically
    "kernel": "weight",
    "scale": "weight",
    "running": "",
    # both sides name norm layers inconsistently ("bn" submodule inside a
    # "*_norm" wrapper here; "norm"/"bn" in torch) — unify and collapse
    "bn": "norm",
}


def _token_seq(name: str) -> List[str]:
    """Ordered token sequence for suffix matching: split on separators AND
    letter/digit boundaries (so flax "block1" aligns with a torch
    Sequential index "1"), synonyms applied."""
    import re

    raw = re.findall(r"[a-z]+|\d+", name.lower())
    out = []
    for t in raw:
        t = _TOKEN_SYNONYMS.get(t, t)
        if t and (not out or out[-1] != t or t.isdigit()):
            out.append(t)
    return out


def _renumber_sequential(keys: List[str]) -> Dict[str, str]:
    """Map each torch key to a variant where pure-numeric path segments are
    densely renumbered per parent (Sequential indices skip parameterless
    layers like ReLU, so ``subnet.{0,2,4}`` becomes ``subnet.{0,1,2}``)."""
    from collections import defaultdict

    children = defaultdict(set)
    for k in keys:
        parts = k.split(".")
        for i, p in enumerate(parts):
            if p.isdigit():
                children[".".join(parts[:i])].add(int(p))
    rank = {
        parent: {v: r for r, v in enumerate(sorted(vals))}
        for parent, vals in children.items()
    }
    out = {}
    for k in keys:
        parts = k.split(".")
        new = []
        for i, p in enumerate(parts):
            if p.isdigit():
                new.append(str(rank[".".join(parts[:i])][int(p)]))
            else:
                new.append(p)
        out[k] = ".".join(new)
    return out


def _suffix_len(a: List[str], b: List[str]) -> int:
    n = 0
    while n < len(a) and n < len(b) and a[-1 - n] == b[-1 - n]:
        n += 1
    return n


def align_state_dicts(
    torch_sd: Dict[str, np.ndarray], flax_leaves: List[Tuple[str, np.ndarray]]
) -> Dict[str, np.ndarray]:
    """Shape-checked longest-suffix alignment, one-to-one, with a logged
    match table (reference ``align_and_update_state_dicts``,
    c2_model_loading.py:211-313).

    Score for a (flax, torch) pair with equal shapes = length of the common
    token suffix of their normalized names, with the shared token count and
    same relative position as deterministic tiebreaks; pairs are taken
    best-score first, each torch weight used once.

    DLA-family state dicts (the fork's ctdet checkpoints) first go through
    the exact deterministic name map in ``dla_import`` — their torch naming
    (bn1/Sequential indices/DCNv2 wrappers) leaves same-shaped tree blocks
    ambiguous to any fuzzy matcher.
    """
    from .dla_import import looks_like_dla, map_dla_state_dict

    result: Dict[str, np.ndarray] = {}
    used_torch_keys = set()
    if looks_like_dla(torch_sd):
        canon = map_dla_state_dict(torch_sd)
        flax_by_name = dict(flax_leaves)
        for ck, (tk, tv) in canon.items():
            coll, body = ck.split("/", 1)
            cands = [
                fn
                for fn in flax_by_name
                if fn == ck
                or (fn.startswith(coll + "/") and fn.endswith("/" + body))
            ]
            if len(cands) != 1:
                continue
            arr = convert_torch_tensor(tk, tv)
            if arr.shape == flax_by_name[cands[0]].shape:
                result[cands[0]] = arr
                used_torch_keys.add(tk)
        if result:
            logger.info(
                "deterministic DLA name map matched %d/%d leaves",
                len(result), len(flax_leaves),
            )

    # deterministic map for the CenterNet resnet/vovnet deconv neck
    # (reference _make_deconv_layer, centernet.py:268-296): Sequential
    # [deconv, BN, ReLU] x N — the BNs are shape-identical so fuzzy suffix
    # matching can cross stage boundaries; map them by position instead
    flax_by_name = dict(flax_leaves)
    _BN_LEAF = {
        "weight": "scale", "bias": "bias",
        "running_mean": "mean", "running_var": "var",
    }
    for tk, tv in torch_sd.items():
        if tk in used_torch_keys or not tk.startswith("deconv_layers."):
            continue
        parts = tk.split(".")
        idx, leaf = int(parts[1]), parts[2]
        stage, role = divmod(idx, 3)
        if role == 0 and leaf == "weight":
            suffix = f"deconv{stage}/kernel"
        elif role == 1 and leaf in _BN_LEAF:
            suffix = f"deconv{stage}_bn/{_BN_LEAF[leaf]}"
        else:
            continue
        cands = [fn for fn in flax_by_name if fn.endswith("/" + suffix) or fn == suffix]
        if len(cands) != 1 or cands[0] in result:
            continue
        arr = convert_torch_tensor(tk, tv)
        if arr.shape == flax_by_name[cands[0]].shape:
            result[cands[0]] = arr
            used_torch_keys.add(tk)

    remaining = {
        k: v
        for k, v in torch_sd.items()
        if not k.endswith(_SKIP_SUFFIXES) and k not in used_torch_keys
    }
    renumbered = _renumber_sequential(list(remaining))
    boundary = _flatten_boundary_channels(torch_sd)
    torch_items = [
        (
            k,
            _permute_flattened_fc_t(v, boundary[k])
            if k in boundary
            else convert_torch_tensor(k, v),
            _token_seq(k),
            _token_seq(renumbered[k]),
        )
        for k, v in remaining.items()
    ]
    fl = [
        (fname, farr, _token_seq(fname))
        for fname, farr in flax_leaves
        if fname not in result
    ]

    pairs = []  # (-suffix, -overlap, pos_dist, fi, ti)
    for fi, (fname, farr, fseq) in enumerate(fl):
        for ti, (tname, tarr, tseq, tseq_rn) in enumerate(torch_items):
            if tarr.shape != farr.shape:
                continue
            # torch Sequential indices skip parameterless layers (ReLU
            # interleaving): subnet.{0,2,4,6} means layers {0,1,2,3}.  The
            # densely renumbered indices are the structural truth, so they
            # are the primary score; literal indices only break ties.
            suf = _suffix_len(fseq, tseq_rn)
            suf_raw = _suffix_len(fseq, tseq)
            # overlap on the RENUMBERED tokens: flax names use dense indices,
            # so a raw Sequential index ("subnet.4" = structural layer 2)
            # sharing a digit with the wrong flax leaf must not outrank the
            # structurally-correct pairing (caught by SemSegFPNHead towers,
            # whose GN leaves tie at suffix 1 and are decided by overlap)
            overlap = len(set(fseq) & set(tseq_rn))
            overlap_raw = len(set(fseq) & set(tseq))
            if suf == 0 and suf_raw == 0 and max(overlap, overlap_raw) == 0:
                # no name similarity at all: shape + position alone must not
                # wire unrelated tensors together (the reference
                # align_and_update_state_dicts leaves these unmatched and
                # warns; the warning happens in the unmatched loop below)
                continue
            pos = abs(fi / max(len(fl), 1) - ti / max(len(torch_items), 1))
            pairs.append((-suf, -suf_raw, -overlap, -overlap_raw, pos, fi, ti))
    pairs.sort()

    used_t = [False] * len(torch_items)
    used_f = [False] * len(fl)
    table = []
    for nsuf, _, _, _, _, fi, ti in pairs:
        if used_f[fi] or used_t[ti]:
            continue
        used_f[fi] = used_t[ti] = True
        fname, farr, _ = fl[fi]
        tname, tarr, _, _ = torch_items[ti]
        result[fname] = tarr
        table.append((fname, tname, farr.shape, -nsuf))
    for fname, farr, _ in fl:
        if fname not in result:
            logger.warning("No torch weight matches %s %s", fname, farr.shape)
    for ti, (tn, _, _, _) in enumerate(torch_items):
        if not used_t[ti]:
            logger.info("Torch weight %s unused", tn)
    if table:
        width = max(len(f) for f, *_ in table)
        logger.info(
            "weight match table:\n%s",
            "\n".join(
                f"  {f:<{width}} <- {t}  {tuple(s)} (suffix {n})"
                for f, t, s, n in table
            ),
        )
    logger.info("Aligned %d/%d flax leaves from torch checkpoint", len(result), len(flax_leaves))
    return result


def load_torch_weights(path: str, state: Any) -> Any:
    """Load a torch checkpoint into a TrainState/variables pytree, matching
    leaves by shape+name. Unmatched leaves keep their current values."""
    import jax

    torch_sd = load_torch_state_dict(path)

    def update_tree(tree):
        leaves = _flatten_pytree(tree)
        aligned = align_state_dicts(torch_sd, leaves)
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new_leaves = []
        for path_, leaf in flat:
            name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path_)
            new_leaves.append(aligned.get(name, np.asarray(leaf)))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    if hasattr(state, "params"):
        # TrainState: only params + batch_stats come from torch weights
        return state.replace(
            params=update_tree(state.params),
            batch_stats=update_tree(state.batch_stats),
        )
    return update_tree(state)
