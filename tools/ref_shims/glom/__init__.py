"""Minimal glom subset — import-time + basic path access only.
GlomMapper tests are excluded from shim validation."""


class Path:
    def __init__(self, *parts):
        self.parts = parts


class Spec:
    def __init__(self, spec):
        self.spec = spec


class GlomError(Exception):
    pass


class PathAccessError(GlomError):
    pass


def glom(obj, spec, **kw):
    if isinstance(spec, Spec):
        spec = spec.spec
    if isinstance(spec, Path):
        parts = spec.parts
    elif isinstance(spec, str):
        parts = spec.split(".")
    else:
        raise GlomError(f"unsupported spec {spec!r}")
    cur = obj
    for p in parts:
        try:
            if isinstance(cur, (list, tuple)):
                cur = cur[int(p)]
            else:
                cur = cur[p]
        except (KeyError, IndexError, TypeError, ValueError) as e:
            if "default" in kw:
                return kw["default"]
            raise PathAccessError(str(e))
    return cur


class Glommer:
    def glom(self, obj, spec, **kw):
        return glom(obj, spec, **kw)

    def register(self, *a, **kw):
        pass
