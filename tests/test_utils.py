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


class TestTransientRetry:
    """Trainer failure containment for the tunnel/backend outage class:
    transient compile/dispatch errors are retried in place (fast tier —
    pure control flow, no compiled programs)."""

    def test_is_transient_classification(self):
        from emox.train.trainer import _is_transient

        transient = RuntimeError(
            "INTERNAL: http://127.0.0.1:8083/remote_compile: read body: "
            "response body closed before all bytes were read")
        assert _is_transient(transient)
        assert _is_transient(RuntimeError("UNAVAILABLE: Socket closed"))
        assert not _is_transient(RuntimeError("INVALID_ARGUMENT: shape mismatch"))
        assert not _is_transient(RuntimeError("RESOURCE_EXHAUSTED: out of memory"))

    def test_step_with_retry_rides_transient(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from emox.train import trainer as trainer_mod

        calls = {"n": 0}

        class _Log:
            def log(self, step, metrics):
                pass

        class _Stub:
            state = type("S", (), {"step": jnp.zeros((), jnp.int32)})()
            logger = _Log()

            def _train_step(self, state, batch, key):
                calls["n"] += 1
                if calls["n"] < 3:
                    raise jax.errors.JaxRuntimeError(
                        "INTERNAL: remote_compile: response body closed")
                return state, {"loss": 0.25}

        monkeypatch.setattr(trainer_mod.time, "sleep", lambda s: None)
        m = trainer_mod.Trainer._step_with_retry(_Stub(), {}, None)
        assert m["loss"] == 0.25 and calls["n"] == 3

    def test_step_with_retry_reraises_non_transient(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import pytest

        from emox.train import trainer as trainer_mod

        class _Log:
            def log(self, step, metrics):
                pass

        class _Stub:
            state = type("S", (), {"step": jnp.zeros((), jnp.int32)})()
            logger = _Log()

            def _train_step(self, state, batch, key):
                raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: bad shape")

        monkeypatch.setattr(trainer_mod.time, "sleep", lambda s: None)
        with pytest.raises(jax.errors.JaxRuntimeError):
            trainer_mod.Trainer._step_with_retry(_Stub(), {}, None)
