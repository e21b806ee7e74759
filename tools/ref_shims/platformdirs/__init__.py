"""Minimal platformdirs: cache dir under the system tempdir."""

import os
import tempfile


def user_cache_dir(appname="app", *a, **kw):
    d = os.path.join(tempfile.gettempdir(), f"{appname}_cache")
    os.makedirs(d, exist_ok=True)
    return d
