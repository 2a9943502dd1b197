import jax.numpy as jnp
import numpy as np

from kuzu.core.checkpoint import CheckpointManager, partial_load


def _state():
    return {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
        "step": jnp.asarray(5),
    }


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck")
    state = _state()
    mgr.save(state, fitness=0.5, metadata={"epoch": 1})
    restored = mgr.restore("last", like=state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert mgr.metadata("last")["epoch"] == 1


def test_best_tracking(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck")
    s = _state()
    mgr.save(s, fitness=0.3)
    assert mgr.exists("best")
    s2 = {**s, "step": jnp.asarray(6)}
    mgr.save(s2, fitness=0.1)  # worse: best unchanged
    best = mgr.restore("best", like=s)
    assert int(best["step"]) == 5
    mgr.save(s2, fitness=0.9)  # better: best updated
    best = mgr.restore("best", like=s)
    assert int(best["step"]) == 6
    # persistence of best_fitness across manager instances
    mgr2 = CheckpointManager(tmp_path / "ck")
    assert mgr2.best_fitness == 0.9


def test_partial_load_shape_match():
    target = {"a": jnp.zeros((2, 3)), "b": jnp.zeros((4,)), "c": jnp.zeros((5,))}
    source = {"a": jnp.ones((2, 3)), "b": jnp.ones((9,)), "d": jnp.ones((5,))}
    out, loaded, total = partial_load(target, source, verbose=False)
    assert loaded == 1 and total == 3
    np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["b"]), 0.0)  # shape mismatch kept
    np.testing.assert_array_equal(np.asarray(out["c"]), 0.0)  # missing kept
