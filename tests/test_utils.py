"""Aux subsystem tests: profiling helpers, camera math, comm runtime."""

import numpy as np

from emox.comm.runtime import is_master, process_info
from emox.data.camera import Camera, Checkerboard
from emox.utils.profiling import StepTimer, device_memory_stats


class TestProfiling:
    def test_step_timer(self):
        import time

        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                time.sleep(0.01)
        assert t.steps_per_sec > 0
        s = t.summary()
        assert s["n"] == 2 and s["mean_ms"] >= 10

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestCamera:
    def test_heuristic_intrinsics(self):
        cam = Camera(width=640, height=480)
        assert abs(cam.focal - 1.28 * 480) < 1e-6
        assert cam.matrix[0, 2] == 320 and cam.matrix[1, 2] == 240

    def test_project_center(self):
        cam = Camera(width=100, height=100)
        pts = np.array([[0.0, 0.0, 10.0]])
        px = cam.project(pts)
        np.testing.assert_allclose(px[0], [50.0, 50.0], atol=1e-6)

    def test_checkerboard_object_points(self):
        b = Checkerboard(rows=3, cols=4, square_size=2.0)
        pts = b.object_points()
        assert pts.shape == (12, 3)
        assert pts[:, 2].max() == 0.0
        assert pts[:, :2].max() == 6.0  # (cols-1)*square


class TestRuntime:
    def test_single_process_info(self):
        info = process_info()
        assert info.process_index == 0 and info.process_count == 1
        assert info.local_devices >= 1
        assert is_master()
