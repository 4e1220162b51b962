"""Tests for observability: TB writer, timers, results export."""

import os

import numpy as np

from nerf_workspaces_explorer_tpu.obs import StepTimer, TensorboardWriter
from nerf_workspaces_explorer_tpu.obs.export import (
    PUBLISHED_CHARTS,
    export_training_curves,
)
from nerf_workspaces_explorer_tpu.obs.tb import _NullSummaryWriter


def test_step_timer_phases():
    timer = StepTimer()
    with timer.phase("a"):
        pass
    with timer.phase("a"):
        pass
    with timer.phase("b"):
        pass
    assert timer.counts["a"] == 2
    assert timer.mean("a") >= 0.0
    assert set(timer.summary()) == {"a", "b"}
    timer.reset()
    assert not timer.totals


def test_tensorboard_writer_roundtrip(tmp_path):
    writer = TensorboardWriter(str(tmp_path), {"a": 1}, log_interval=100)
    writer.write_scalars(0, [1.0, 2.0], ["x", "y"])
    writer.write_scalars(10, [3.0], ["x"])
    writer.write_histogram(0, np.ones(8), "h")
    writer.write_image("img", np.zeros((1, 4, 4, 3)), 0)
    writer.flush()
    assert os.path.isdir(str(tmp_path / "tensorboard_logs"))


def test_null_writer_records_scalars():
    writer = _NullSummaryWriter("/tmp/none")
    writer.add_scalar("Train/Loss/total_loss", 0.5, 0)
    writer.add_scalar("Train/Loss/total_loss", 0.25, 100)
    assert writer.scalars["Train/Loss/total_loss"] == [(0, 0.5), (100, 0.25)]


def test_export_training_curves(tmp_path):
    scalars = {
        tag: [(0, 1.0), (500, 0.5), (1000, 0.25)] for tag in PUBLISHED_CHARTS.values()
    }
    written = export_training_curves(scalars, str(tmp_path / "results"))
    assert len(written) == 9  # the reference's nine published charts
    names = {os.path.basename(p) for p in written}
    assert "Test_Metric_batch_PSNR.svg" in names
    content = open(written[0]).read()
    assert content.startswith("<svg") and "polyline" in content


def test_export_skips_missing_tags(tmp_path):
    written = export_training_curves(
        {"Train/Loss/total_loss": [(0, 1.0)]}, str(tmp_path)
    )
    assert len(written) == 1


def test_trace_context_writes_trace(tmp_path):
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.obs import trace_context

    with trace_context(str(tmp_path / "trace")):
        float(jnp.ones(8).sum())
    # jax writes plugins/profile/<ts>/*; just check something appeared.
    assert any((tmp_path / "trace").rglob("*")), "no trace files written"


def test_trace_context_noop_without_dir():
    from nerf_workspaces_explorer_tpu.obs import trace_context

    with trace_context(None):
        pass
