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


def test_e2e_page_quality_matching_and_cer(tmp_path):
    """e2e page CER: matched columns score edit distance, missed GT counts
    as full deletions, spurious predictions as full insertions."""
    import numpy as np

    from kuzu.tools.production import e2e_page_quality

    (tmp_path / "col/images/val").mkdir(parents=True)
    (tmp_path / "col/images/val/p0.jpg").write_bytes(b"")
    (tmp_path / "column_info.csv").write_text(
        "column_image,original_image,box_in_original,unicode_ids\n"
        'columns/extra/x0.png,extra,"0,0,30,100",U+4E00\n'
        'columns/val/a.png,val/p0.jpg,"10,10,40,200",U+4E00 U+4E01 U+4E09\n'
        'columns/val/b.png,val/p0.jpg,"60,10,90,200",U+4E09 U+4E0A\n'
    )

    class FakePipe:
        def process_pages(self, paths):
            assert len(paths) == 1
            return [{
                "columns": [
                    # matches GT a (IoU 1.0), text has 1 edit vs 一丁三
                    {"box": [10, 10, 40, 200], "text": "一丁七"},
                    # spurious column, 2 chars -> 2 insertions
                    {"box": [300, 10, 330, 200], "text": "xy"},
                ]
            }]

    res = e2e_page_quality(tmp_path, FakePipe())
    assert res["e2e_columns_gt"] == 2
    assert res["e2e_columns_matched"] == 1
    assert res["e2e_columns_spurious"] == 1
    # edits: 1 (matched, 七 vs 三... both differ at pos 2) + 2 (missed GT b)
    # + 2 (spurious) = 5; gt chars = 5
    assert abs(res["e2e_cer"] - 5 / 5) < 1e-9
