"""Environment provenance dump (reference ``detectron2/utils/collect_env.py``)."""

import sys


def collect_env_info() -> str:
    import numpy as np

    lines = [
        f"Python: {sys.version.split()[0]}",
        f"numpy: {np.__version__}",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        lines.append(f"devices: {jax.devices()}")
        lines.append(f"default backend: {jax.default_backend()}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    try:
        import flax

        lines.append(f"flax: {flax.__version__}")
    except Exception:
        pass
    try:
        import optax

        lines.append(f"optax: {optax.__version__}")
    except Exception:
        pass
    return "\n".join(lines)
