#!/usr/bin/env python
"""Run an UNMODIFIED /root/reference/scripts/evaluate_*.py script under
environment-level compat shims (VERDICT r3 item 2: shim the *environment*,
never the scripts).

Shims applied before the script runs:
  - numpy 1.x scalar aliases removed in numpy>=1.24 (np.float, np.bool, ...)
    restored as the builtins they aliased (the documented migration).
  - stub `plyfile` / `imageio` modules (tools/ref_eval_compat/) satisfying
    scripts/util*.py module-scope imports; the evaluators never use them.

Usage:
    python tools/run_ref_eval.py <reference_script.py> [script args...]

The script runs via runpy with __name__ == "__main__" and its own argv, so
its bytes on disk are executed exactly as checked in.
"""

import os
import runpy
import sys

import numpy as np

_ALIASES = {"float": float, "bool": bool, "int": int, "long": int,
            "object": object, "str": str, "unicode": str, "complex": complex}
for _name, _builtin in _ALIASES.items():
    if not hasattr(np, _name):
        setattr(np, _name, _builtin)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ref_eval_compat"))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    # `python script.py` puts the script's directory on sys.path (where the
    # scripts find their sibling util/util_3d modules); runpy does not — add
    # it, mirroring the interpreter's own behavior.
    sys.path.insert(0, os.path.dirname(os.path.abspath(script)))
    runpy.run_path(script, run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
