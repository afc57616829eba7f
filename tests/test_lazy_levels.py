"""Deferred LoD builds (_LazyLevels) must be bit-identical to eager ones
and join transparently on any access pattern (pos(), direct levels[...],
compute_levels re-entry)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rescan_tpu import config  # noqa: E402
from rescan_tpu.core.pointcloud import PointCloud  # noqa: E402
from rescan_tpu.utils import synthetic  # noqa: E402


def _scene(tmp_path, name="s.ply"):
    spec = synthetic.SceneSpec(room_size=(1.5, 1.5), wall_height=0.8,
                               objects=[("chair", (0.7, 0.7),
                                         (0.3, 0.4, 0.3), 0.2)])
    p = str(tmp_path / name)
    synthetic.save_scene_ply(p, spec, resolution=8)
    return p


def test_deferred_levels_bit_identical(tmp_path):
    p = _scene(tmp_path)
    eager = PointCloud.from_ply(p)
    lazy = PointCloud.from_ply(p, defer_levels_from=3)
    for lvl in range(config.N_LEVELS):
        for k in ("positions", "normals", "class_ids", "instance_ids"):
            np.testing.assert_array_equal(eager.levels[lvl][k],
                                          lazy.levels[lvl][k],
                                          err_msg=f"level {lvl} field {k}")


def test_direct_levels_indexing_joins(tmp_path):
    p = _scene(tmp_path)
    lazy = PointCloud.from_ply(p, defer_levels_from=1)
    # direct list indexing (the pipeline's scene.levels[lvl][...] pattern)
    assert lazy.levels[4] is not None
    assert len(lazy.levels[4]["positions"]) > 0
    assert len(lazy.levels[1]["positions"]) >= len(lazy.levels[4]["positions"])


def test_compute_levels_reentry_joins_pending(tmp_path):
    p = _scene(tmp_path)
    lazy = PointCloud.from_ply(p, defer_levels_from=1)
    lazy.compute_levels()  # must join the pending build, then rebuild
    eager = PointCloud.from_ply(p)
    for lvl in range(config.N_LEVELS):
        np.testing.assert_array_equal(eager.levels[lvl]["positions"],
                                      lazy.levels[lvl]["positions"])


def test_pos_accessor_joins(tmp_path):
    p = _scene(tmp_path)
    lazy = PointCloud.from_ply(p, defer_levels_from=2)
    assert lazy.pos(3).shape[1] == 3
    assert lazy.nrm(4).shape[1] == 3
