"""Minimal `necessary` (github.com/soldni/necessary): context manager
checking importability of one or more modules; soft=True yields the
availability flag, hard mode raises ImportError with the message."""

import importlib.util


class necessary:  # noqa: N801
    def __init__(self, modules, soft=False, message=None, errors=None):
        if isinstance(modules, str):
            modules = [modules]
        self.modules = list(modules)
        self.soft = soft
        self.message = message
        self.available = all(
            importlib.util.find_spec(m.split(".")[0]) is not None
            for m in self.modules
        )
        if not self.available and not soft:
            self._raise()

    def _raise(self):
        name = ", ".join(self.modules)
        msg = (
            self.message.format(module_name=name)
            if self.message
            else f"module(s) {name} required but not installed"
        )
        raise ImportError(msg)

    def __bool__(self):
        return self.available

    def __enter__(self):
        return self.available

    def __exit__(self, *exc):
        return False


class Necessary:
    """Class decorator form: raises at INSTANTIATION when the modules
    are missing (matches the library's lazy behavior closely enough
    for import + non-gated usage)."""

    def __init__(self, modules, soft=False, message=None, errors=None):
        self.check = necessary(modules, soft=True, message=message)
        self.message = message
        self.modules = self.check.modules

    def __call__(self, cls):
        if self.check.available:
            return cls
        shim = self

        class _Unavailable(cls):  # type: ignore[misc,valid-type]
            def __init__(self, *a, **kw):
                shim.check._raise()

        _Unavailable.__name__ = cls.__name__
        _Unavailable.__qualname__ = getattr(
            cls, "__qualname__", cls.__name__
        )
        return _Unavailable
