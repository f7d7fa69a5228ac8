"""Config system: yacs-compatible CfgNode + the detectron2 default tree.

Public surface mirrors ``detectron2.config`` (reference config/config.py:79-107):
``get_cfg()``, ``CfgNode``, ``set_global_cfg``/``global_cfg``, ``configurable``.
"""

import functools
import inspect

from .cfgnode import CfgNode
from .compat import downgrade_config, upgrade_config
from .defaults import build_default_cfg

__all__ = ["CfgNode", "configurable", "downgrade_config", "get_cfg", "global_cfg", "set_global_cfg", "upgrade_config"]


def get_cfg() -> CfgNode:
    """Return a fresh copy of the default config tree."""
    return build_default_cfg()


global_cfg = CfgNode()


def set_global_cfg(cfg: CfgNode) -> None:
    global global_cfg
    global_cfg.clear()
    global_cfg.update(cfg)


def configurable(init_func=None, *, from_config=None):
    """Decorator making a function/``__init__`` callable with a CfgNode.

    Same contract as the reference's ``detectron2/config/config.py:110-199``:
    a decorated ``__init__`` requires a classmethod ``from_config(cfg, ...)``
    on the class that translates a cfg into explicit kwargs; a decorated plain
    function takes ``from_config=`` explicitly.  Callers may then pass either
    a cfg (as first positional arg or ``cfg=`` kwarg) or the explicit args.
    """
    if init_func is not None:
        assert (
            inspect.isfunction(init_func)
            and from_config is None
            and init_func.__name__ == "__init__"
        ), "Incorrect use of @configurable. Check API documentation."

        @functools.wraps(init_func)
        def wrapped(self, *args, **kwargs):
            try:
                fc = type(self).from_config
            except AttributeError as e:
                raise AttributeError(
                    "Class with @configurable __init__ must have a from_config classmethod."
                ) from e
            if _called_with_cfg(*args, **kwargs):
                explicit = _get_args_from_config(fc, *args, **kwargs)
                init_func(self, **explicit)
            else:
                init_func(self, *args, **kwargs)

        return wrapped

    if from_config is None:
        raise TypeError("from_config must be given for functional @configurable")
    assert inspect.isfunction(from_config)

    def wrapper(orig_func):
        @functools.wraps(orig_func)
        def wrapped(*args, **kwargs):
            if _called_with_cfg(*args, **kwargs):
                explicit = _get_args_from_config(from_config, *args, **kwargs)
                return orig_func(**explicit)
            return orig_func(*args, **kwargs)

        wrapped.from_config = from_config
        return wrapped

    return wrapper


def _called_with_cfg(*args, **kwargs) -> bool:
    if len(args) and isinstance(args[0], CfgNode):
        return True
    if isinstance(kwargs.pop("cfg", None), CfgNode):
        return True
    return False


def _get_args_from_config(from_config_func, *args, **kwargs):
    signature = inspect.signature(from_config_func)
    if list(signature.parameters.keys())[0] != "cfg":
        name = (
            from_config_func.__self__.__name__ + "."
            if inspect.ismethod(from_config_func)
            else ""
        )
        raise TypeError(f"{name}{from_config_func.__name__} must take 'cfg' first")
    supports_var_kw = any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in signature.parameters.values()
    )
    if supports_var_kw:
        return from_config_func(*args, **kwargs)
    supported = set(signature.parameters.keys())
    extra = {k: kwargs.pop(k) for k in list(kwargs) if k not in supported}
    ret = from_config_func(*args, **kwargs)
    ret.update(extra)
    return ret
