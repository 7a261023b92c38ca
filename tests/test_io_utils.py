"""Tests for checkpointing, writers, validation oracle, filters, timers."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.io import save_checkpoint, load_checkpoint, CSVWriter, FrameWriter
from chrono_tpu.utils import validation
from chrono_tpu.utils.filters import (
    butterworth_lowpass, running_average, PID,
)


class TestCheckpoint:
    def test_dem_roundtrip(self, tmp_path):
        from chrono_tpu.dem import DEMSystem
        from chrono_tpu.utils.samplers import grid_sample_box

        sys_ = DEMSystem(radius=0.05, box=((0, 0, 0), (0.5, 0.5, 0.5)))
        pts = grid_sample_box((0.06, 0.06, 0.06), (0.44, 0.44, 0.44), 0.12)
        sys_.create_particles(pts)
        sys_.advance(0.05)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, sys_.state, metadata={"time": float(sys_.state.time)})
        # resume into a fresh template
        sys2 = DEMSystem(radius=0.05, box=((0, 0, 0), (0.5, 0.5, 0.5)))
        sys2.create_particles(pts)
        restored = load_checkpoint(path, sys2.state)
        np.testing.assert_array_equal(np.asarray(restored.pos),
                                      np.asarray(sys_.state.pos))
        np.testing.assert_array_equal(np.asarray(restored.tan_disp),
                                      np.asarray(sys_.state.tan_disp))
        # resumed sim continues identically to uninterrupted one
        sys2.state = restored
        sys_.advance(0.05)
        sys2.advance(0.05)
        np.testing.assert_allclose(sys_.positions, sys2.positions, atol=1e-6)

    def test_mbs_roundtrip(self, tmp_path):
        from chrono_tpu.physics import SystemBuilder

        b = SystemBuilder()
        g = b.add_ground()
        b.add_body(mass=1.0, pos=(1, 0, 0))
        model, state = b.finalize()
        path = str(tmp_path / "mbs.npz")
        save_checkpoint(path, state)
        restored = load_checkpoint(path, state)
        np.testing.assert_array_equal(np.asarray(restored.q),
                                      np.asarray(state.q))


class TestWriters:
    def test_csv_roundtrip(self, tmp_path):
        w = CSVWriter(str(tmp_path / "out.csv"), ["t", "x", "y"])
        for i in range(5):
            w.append(i * 0.1, i * 1.0, -i * 2.0)
        w.write()
        cols, data = CSVWriter.read(str(tmp_path / "out.csv"))
        assert cols == ["t", "x", "y"]
        np.testing.assert_allclose(data[:, 1], np.arange(5.0))

    def test_frame_writer(self, tmp_path):
        fw = FrameWriter(str(tmp_path / "frames"))
        fw.write_frame(0.0, pos=np.zeros((10, 3)))
        fw.write_frame(0.1, pos=np.ones((10, 3)))
        frame = FrameWriter.read_frame(str(tmp_path / "frames"), 1)
        np.testing.assert_allclose(frame["pos"], 1.0)


class TestValidation:
    def test_norms(self):
        err = np.asarray([3.0, -4.0])
        assert validation.l2_norm(err) == 5.0
        assert validation.inf_norm(err) == 4.0
        np.testing.assert_allclose(validation.rms_norm(err),
                                   np.sqrt(12.5))

    def test_csv_validation(self, tmp_path):
        sim = CSVWriter(str(tmp_path / "sim.csv"), ["t", "x"])
        gold = CSVWriter(str(tmp_path / "gold.csv"), ["t", "x"])
        for i in range(10):
            t = i * 0.1
            sim.append(t, np.sin(t) + 0.01)
            gold.append(t, np.sin(t))
        sim.write()
        gold.write()
        out = validation.validate_csv(str(tmp_path / "sim.csv"),
                                      str(tmp_path / "gold.csv"))
        np.testing.assert_allclose(out["x"], 0.01, rtol=1e-4)


class TestFilters:
    def test_lowpass_dc_gain(self):
        f = butterworth_lowpass(5.0, 1000.0)
        xs = jnp.ones(2000)
        ys = f.filter(xs)
        np.testing.assert_allclose(float(ys[-1]), 1.0, atol=1e-3)

    def test_lowpass_attenuates(self):
        f = butterworth_lowpass(5.0, 1000.0)
        t = jnp.arange(2000) / 1000.0
        xs = jnp.sin(2 * jnp.pi * 100.0 * t)   # 100 Hz ≫ cutoff
        ys = f.filter(xs)
        assert float(jnp.abs(ys[500:]).max()) < 0.01

    def test_running_average(self):
        ys = running_average(jnp.arange(10.0), 3)
        np.testing.assert_allclose(np.asarray(ys)[0], 1.0)

    def test_pid_converges(self):
        pid = PID(kp=jnp.asarray(2.0), ki=jnp.asarray(5.0))
        x = 0.0
        for _ in range(2000):
            u, pid = pid.step(1.0 - x, 0.01)
            x += 0.01 * u  # first-order plant
        np.testing.assert_allclose(x, 1.0, atol=1e-2)


def test_hdf5_writer_roundtrip(tmp_path):
    from chrono_tpu.io.writers import HDF5Writer

    path = str(tmp_path / "out.h5")
    w = HDF5Writer(path)
    rng = np.random.default_rng(0)
    frames = []
    for k in range(3):
        pos = rng.standard_normal((100, 3)).astype(np.float32)
        w.write_frame(0.1 * k, pos=pos, vel=pos * 2)
        frames.append(pos)
    w.close()
    back = HDF5Writer.read(path)
    assert len(back) == 3
    for k, (t, data) in enumerate(back):
        np.testing.assert_allclose(t, 0.1 * k)
        np.testing.assert_allclose(data["pos"], frames[k])
        np.testing.assert_allclose(data["vel"], frames[k] * 2)
