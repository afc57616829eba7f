"""fuse_models executes end-to-end against stub PoissonRecon/SurfaceTrimmer
binaries that replay reference-style stdout and record their argv
(VERDICT r3 item 7: the wrapper's depth-parse + trim arithmetic were
untested because the real binaries are absent on this machine).

Reference behavior being gated: scripts/run_poisson_reconstruction.py:13-52
(fixed flag set; depth parsed from the last 'Cycle[0] ...' stdout line not
ending in '0', token 1 falling back to token 2; trim level = depth - 1.5).
"""

import json
import os
import stat
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rescan_tpu.pipeline import fuse_models  # noqa: E402

# representative PoissonRecon --verbose tail (the solver's per-cycle lines)
POISSON_STDOUT = """\
Input Points / Samples: 51200 / 40960
Leaf Nodes / Active Nodes / Ghost Nodes: 186368 / 102400 / 84968
Memory Usage: 312.504 MB
Cycle[0] Depth[9/9]:\t2.341 (s), 312.5 (MB) / 512.0 (MB)\t1
Cycle[0] Depth[9/9]:\t0.000 (s), 312.5 (MB) / 512.0 (MB)\t0
# Got kernel density: 1.2 (s), 312.5 (MB)
Vertices / Polygons: 23072 / 46080
"""


def _make_stub(path, record_file, stdout_text, touch_out=True):
    script = f"""#!{sys.executable}
import json, os, sys
argv = sys.argv[1:]
with open({record_file!r}, "a") as f:
    f.write(json.dumps(argv) + "\\n")
if {touch_out!r} and "--out" in argv:
    open(argv[argv.index("--out") + 1], "w").write("ply-stub")
sys.stdout.write({stdout_text!r})
"""
    with open(path, "w") as f:
        f.write(script)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture
def stubs(tmp_path):
    rec_p = str(tmp_path / "poisson_argv.jsonl")
    rec_t = str(tmp_path / "trimmer_argv.jsonl")
    poisson = str(tmp_path / "PoissonRecon")
    trimmer = str(tmp_path / "SurfaceTrimmer")
    _make_stub(poisson, rec_p, POISSON_STDOUT)
    _make_stub(trimmer, rec_t, "")
    models = tmp_path / "models"
    models.mkdir()
    (models / "chair.003.ply").write_text("fake ply A")
    (models / "table.005.ply").write_text("fake ply B")
    (models / "temp_old.ply").write_text("must be skipped")  # 'temp' in name
    return dict(poisson=poisson, trimmer=trimmer, models=str(models),
                rec_p=rec_p, rec_t=rec_t)


def _argvs(rec_file):
    with open(rec_file) as f:
        return [json.loads(line) for line in f]


def _flags(argv):
    """argv -> {--flag: value-or-None} (valueless flags map to None)."""
    d = {}
    i = 0
    while i < len(argv):
        if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
            d[argv[i]] = argv[i + 1]
            i += 2
        else:
            d[argv[i]] = None
            i += 1
    return d


def test_fuse_models_end_to_end(stubs):
    fuse_models.fuse_models(stubs["poisson"], stubs["trimmer"],
                            stubs["models"])
    p_calls = _argvs(stubs["rec_p"])
    t_calls = _argvs(stubs["rec_t"])
    assert len(p_calls) == 2 and len(t_calls) == 2  # temp*.ply skipped

    tmp_ply = os.path.join(stubs["models"], "temp.ply")
    ins = set()
    for argv in p_calls:
        d = _flags(argv)
        ins.add(d["--in"])
        # the reference's exact flag values (run_poisson_reconstruction.py:15)
        assert d["--out"] == tmp_ply
        assert d["--width"] == "0.01" and d["--scale"] == "1.25"
        assert d["--pointWeight"] == "0.1" and d["--samplesPerNode"] == "5"
        assert d["--data"] == "1.5"
        assert "--colors" in argv and "--density" in argv
        assert "--verbose" in argv
    assert ins == {os.path.join(stubs["models"], f)
                   for f in ("chair.003.ply", "table.005.ply")}

    for argv in t_calls:
        d = _flags(argv)
        assert d["--in"] == tmp_ply
        assert d["--out"] in ins  # trims back over the original model file
        assert d["--trim"] == "7.5"  # depth 9 - subs_lvl 1.5
        assert d["--smooth"] == "0"


def test_depth_parse_variants(tmp_path):
    rec = str(tmp_path / "argv.jsonl")
    exe = str(tmp_path / "stub")

    def depth_for(stdout_text):
        _make_stub(exe, rec, stdout_text)
        return fuse_models.run_poisson_recon(exe, "in.ply",
                                             str(tmp_path / "out.ply"))

    # last non-'0'-terminated Cycle[0] line wins (reversed scan)
    assert depth_for("Cycle[0] Depth[5/9]: x 1\nCycle[0] Depth[9/9]: y 1\n") == 9
    # trailing '0' lines are skipped
    assert depth_for("Cycle[0] Depth[8/8]: x 1\nCycle[0] Depth[8/8]: y 0\n") == 8
    # depth token may be the second token (reference's fallback path)
    assert depth_for("Cycle[0] B-spline: Depth[7/9] z 2\n") == 7
    # no parsable line -> None (caller skips the model)
    assert depth_for("Vertices / Polygons: 10 / 20\n") is None


def test_unparsable_depth_skips_trimmer(stubs, capsys):
    _make_stub(stubs["poisson"], stubs["rec_p"], "no cycle lines here\n")
    fuse_models.fuse_models(stubs["poisson"], stubs["trimmer"],
                            stubs["models"])
    assert not os.path.exists(stubs["rec_t"])  # trimmer never invoked
    assert "skipping" in capsys.readouterr().out


def test_cli_entry(stubs):
    r = fuse_models.main([stubs["models"], stubs["poisson"], stubs["trimmer"]])
    assert r == 0
    assert len(_argvs(stubs["rec_p"])) == 2
