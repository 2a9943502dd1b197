"""Aux subsystem tests: tuner, profiling, plotting, benchmark table."""

import numpy as np


def test_tuner_improves_on_quadratic(tmp_path):
    from kuzu.tools.tuner import Tuner

    target = {"lr0": 0.01, "momentum": 0.9}

    def train_fn(hyps):
        # fitness peaks at the target hyps
        return -sum((hyps.get(k, 0) - v) ** 2 / v**2 for k, v in target.items())

    tuner = Tuner(
        train_fn,
        space={"lr0": (1e-5, 0.1, 0.5), "momentum": (0.6, 0.98, 0.3)},
        save_dir=tmp_path,
        seed=0,
    )
    best_fit, best_hyps = tuner.run(iterations=15, init_hyps={"lr0": 0.05, "momentum": 0.7})
    first_fit = tuner.history[0][0]
    assert best_fit >= first_fit
    assert (tmp_path / "tune_results.csv").exists()
    assert (tmp_path / "best_hyps.yaml").exists()


def test_profiling_flops_and_timing():
    import jax.numpy as jnp

    from kuzu.tools.profiling import StageTimer, flops_of, timed

    def f(x):
        return x @ x

    x = jnp.ones((128, 128))
    fl = flops_of(f, x)
    assert abs(fl - 2 * 128**3) / (2 * 128**3) < 0.1
    t = timed(f, x, reps=2)
    assert t["median_ms"] > 0
    st = StageTimer()
    with st.stage("a"):
        pass
    with st.stage("a"):
        pass
    assert st.counts["a"] == 2
    assert "a" in st.summary()


def test_plotting_outputs(tmp_path):
    from kuzu.tools.plotting import (
        ConfusionMatrix,
        plot_batch,
        plot_label_histogram,
        plot_pr_curve,
        plot_results_csv,
    )

    p1 = plot_pr_curve(
        np.linspace(0, 1, 10), np.linspace(1, 0.5, 10), tmp_path / "pr.png"
    )
    assert p1.exists()

    cm = ConfusionMatrix(nc=2)
    gt = np.array([[0.0, 0, 10, 10]])
    cm.update(gt, np.array([0.9]), np.array([0]), gt, np.array([0]))
    cm.update(
        np.zeros((0, 4)), np.zeros(0), np.zeros(0, int), gt, np.array([1])
    )  # missed GT
    assert cm.matrix[0, 0] == 1
    assert cm.matrix[1, 2] == 1  # class-1 GT missed -> background column
    assert cm.plot(tmp_path / "cm.png").exists()

    imgs = np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3))
    boxes = [np.array([[2.0, 2, 20, 20]])] * 4
    assert plot_batch(imgs, boxes, tmp_path / "batch.png").exists()
    assert plot_label_histogram(np.array([0, 0, 1]), tmp_path / "hist.png").exists()

    (tmp_path / "results.csv").write_text(
        "epoch,train/loss,val/acc\n0,1.0,0.5\n1,0.5,0.7\n"
    )
    assert plot_results_csv(tmp_path / "results.csv", tmp_path / "curves.png").exists()


def test_benchmark_table_format():
    from kuzu.tools.benchmarks import format_table

    rows = [{"model": "x", "ms": 1.5}, {"model": "yolo", "ms": 12.25}]
    t = format_table(rows)
    assert "model" in t and "yolo" in t
    assert format_table([]) == "(no results)"
