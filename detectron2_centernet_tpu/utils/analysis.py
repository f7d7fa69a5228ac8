"""Model analysis (reference ``detectron2/utils/analysis.py:55-164`` flop /
activation / parameter counting via fvcore).

JAX version: parameter counts from the pytree; FLOPs from XLA's own cost
analysis of the compiled program (more truthful than op-walking — it counts
what actually runs after fusion).
"""

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

__all__ = ["parameter_count", "parameter_count_table", "flop_count"]


def parameter_count(params: Any) -> Dict[str, int]:
    """{module path: #params}, '' = total (reference fvcore parameter_count)."""
    counts: Dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        total += n
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        for depth in range(1, len(keys)):
            prefix = ".".join(keys[:depth])
            counts[prefix] = counts.get(prefix, 0) + n
    counts[""] = total
    return counts


def parameter_count_table(params: Any, max_depth: int = 3) -> str:
    counts = parameter_count(params)
    rows = [("model", counts[""])]
    for k in sorted(counts):
        if k and k.count(".") < max_depth:
            rows.append((" " + k, counts[k]))
    width = max(len(r[0]) for r in rows) + 2
    lines = [f"{'name':<{width}} #params", "-" * (width + 10)]
    for name, n in rows:
        human = f"{n / 1e6:.2f}M" if n >= 1e6 else (f"{n / 1e3:.1f}K" if n >= 1e3 else str(n))
        lines.append(f"{name:<{width}} {human}")
    return "\n".join(lines)


def flop_count(fn: Callable, *example_args) -> Optional[float]:
    """FLOPs of the compiled program (XLA cost analysis). None if the
    backend doesn't report it."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", None))
    except Exception:
        return None
