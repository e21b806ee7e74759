"""Minimal reimplementation of the public `trouting` type-routing
decorator API (github.com/soldni/trouting), enough to run the
reference library: @trouting marks a default method;
@method.add_interface(argname=Type-or-tuple) registers per-type
implementations; calls dispatch on isinstance of that argument."""

import functools
import inspect


class trouting:  # noqa: N801  (mirrors the library's lowercase name)
    def __init__(self, func):
        self._default = func
        self._registry = []  # (param_name, types, func), registration order
        functools.update_wrapper(self, func)

    def add_interface(self, **spec):
        def deco(fn):
            for name, types in spec.items():
                if not isinstance(types, tuple):
                    types = (types,)
                self._registry.append((name, types, fn))
            return self

        return deco

    def _resolve(self, args, kwargs):
        # args excludes self; map param name -> value via the default
        # function's signature
        sig = inspect.signature(self._default)
        params = [p for p in sig.parameters if p != "self"]
        for name, types, fn in self._registry:
            if name in kwargs:
                value = kwargs[name]
            else:
                try:
                    idx = params.index(name)
                except ValueError:
                    continue
                if idx >= len(args):
                    continue
                value = args[idx]
            if isinstance(value, types):
                return fn
        return self._default

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self

        @functools.wraps(self._default)
        def bound(*args, **kwargs):
            fn = self._resolve(args, kwargs)
            return fn(obj, *args, **kwargs)

        return bound

    def __call__(self, *args, **kwargs):
        # unbound call: first arg is self
        fn = self._resolve(args[1:], kwargs)
        return fn(*args, **kwargs)
