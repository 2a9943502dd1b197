import jax.numpy as jnp
import numpy as np
import pytest

from kuzu.ops.ctc import ctc_greedy_decode, ctc_loss


def test_ctc_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    B, T, C, L = 4, 20, 12, 7
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    label_lens = rng.integers(1, L + 1, size=B)
    labels = np.zeros((B, L), dtype=np.int64)
    for i, n in enumerate(label_lens):
        labels[i, :n] = rng.integers(1, C, size=n)
    logit_lens = rng.integers(L * 2 + 1, T + 1, size=B)

    ours = float(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(logit_lens),
            jnp.asarray(label_lens),
        )
    )
    t_logp = torch.from_numpy(logits).log_softmax(-1).transpose(0, 1)  # (T,B,C)
    ref = torch.nn.CTCLoss(blank=0, reduction="mean")(
        t_logp,
        torch.from_numpy(labels),
        torch.from_numpy(logit_lens),
        torch.from_numpy(label_lens),
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def test_ctc_loss_gradients_finite(rng):
    import jax

    B, T, C, L = 2, 10, 6, 3
    logits = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, C, size=(B, L)))
    g = jax.grad(
        lambda x: ctc_loss(x, labels, jnp.full((B,), T), jnp.full((B,), L))
    )(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_ctc_greedy_decode_collapse():
    # timesteps: a a blank a b b -> a a b
    C = 4
    path = [1, 1, 0, 1, 2, 2]
    logits = np.full((1, len(path), C), -5.0, dtype=np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 5.0
    seq, lens = ctc_greedy_decode(jnp.asarray(logits))
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(seq)[0, :3], [1, 1, 2])


def test_ctc_greedy_decode_respects_length():
    C = 4
    path = [1, 0, 2, 3]
    logits = np.full((1, len(path), C), -5.0, dtype=np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 5.0
    seq, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.array([2]))
    assert int(lens[0]) == 1
    assert int(seq[0, 0]) == 1
