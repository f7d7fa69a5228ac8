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

Alignment strategy: flatten both sides into ordered (path, array) lists and
match greedily by shape with a name-similarity tiebreak, logging everything
unmatched — the same observable behavior as the reference's shape-checked
longest-suffix matching.
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
    """Torch layout -> flax layout, keyed on name/shape heuristics."""
    if arr.ndim == 4:
        o, i, kh, kw = arr.shape
        if i == 1 and ("up" in name or "deconv" in name) and o > 1:
            # grouped depthwise deconv (O,1,KH,KW) -> (KH,KW,1,O)
            return np.transpose(arr, (2, 3, 1, 0))
        return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
    if arr.ndim == 2:
        return arr.T  # (O, I) -> (I, O)
    return arr


_SKIP_SUFFIXES = ("num_batches_tracked",)


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
}


def _name_tokens(name: str) -> set:
    import re

    raw = set(re.split(r"[./_\[\]]+", name.lower())) - {""}
    return {_TOKEN_SYNONYMS.get(t, t) for t in raw} - {""}


def align_state_dicts(
    torch_sd: Dict[str, np.ndarray], flax_leaves: List[Tuple[str, np.ndarray]]
) -> Dict[str, np.ndarray]:
    """Greedy shape+name alignment: returns {flax_path: converted array}."""
    torch_items = [
        (k, convert_torch_tensor(k, v))
        for k, v in torch_sd.items()
        if not k.endswith(_SKIP_SUFFIXES)
    ]
    used = [False] * len(torch_items)
    result: Dict[str, np.ndarray] = {}
    for fname, farr in flax_leaves:
        candidates = [
            i for i, (tn, ta) in enumerate(torch_items) if not used[i] and ta.shape == farr.shape
        ]
        if not candidates:
            logger.warning("No torch weight matches %s %s", fname, farr.shape)
            continue
        ftok = _name_tokens(fname)
        best = max(candidates, key=lambda i: len(ftok & _name_tokens(torch_items[i][0])))
        used[best] = True
        result[fname] = torch_items[best][1]
    for i, (tn, _) in enumerate(torch_items):
        if not used[i]:
            logger.info("Torch weight %s unused", tn)
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
