"""IDENTITY FAKE of ftfy — import-time only.  FtfyMapper is excluded
from shim validation and baseline measurement."""


class TextFixerConfig:
    def __init__(self, *a, **kw):
        pass


def fix_text(text, config=None, **kw):
    return text
