"""Picklable function wrapper (reference ``detectron2/utils/serialize.py``):
wraps a callable so closures survive pickling to loader workers."""

import pickle


class PicklableWrapper:
    def __init__(self, obj) -> None:
        self._obj = obj

    def __reduce__(self):
        try:
            import cloudpickle

            s = cloudpickle.dumps(self._obj)
            return cloudpickle.loads, (s,)
        except ImportError:
            return PicklableWrapper, (self._obj,)

    def __call__(self, *args, **kwargs):
        return self._obj(*args, **kwargs)

    def __getattr__(self, attr):
        if attr not in ("_obj",):
            return getattr(self._obj, attr)
        return getattr(self, attr)
