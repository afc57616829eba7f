"""Environment compat stub for the `plyfile` package (not installable in
this image). The reference's scripts/util_3d.py imports PlyData/PlyElement
at module scope but the three evaluate_*.py entry points never touch PLY
files (they evaluate .txt id files) — so an import-satisfying stub keeps
the scripts byte-unmodified. Any actual use raises loudly."""


class PlyData:
    @staticmethod
    def read(*a, **k):
        raise NotImplementedError(
            "plyfile stub: PLY i/o is not exercised by the evaluate_*.py "
            "scripts; install the real plyfile package for PLY reading")


class PlyElement:
    @staticmethod
    def describe(*a, **k):
        raise NotImplementedError("plyfile stub")
