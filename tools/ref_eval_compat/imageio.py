"""Environment compat stub for `imageio` (not installable in this image).
scripts/util.py imports it at module scope; the evaluate_*.py entry points
never write images. Any actual use raises loudly."""


def imwrite(*a, **k):
    raise NotImplementedError("imageio stub: not exercised by evaluate_*.py")


def imread(*a, **k):
    raise NotImplementedError("imageio stub: not exercised by evaluate_*.py")
