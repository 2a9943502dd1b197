import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kuzu.models.trocr import TrOCR, beam_generate, greedy_generate


@pytest.fixture(scope="module")
def tiny_model():
    model = TrOCR(
        vocab_size=20,
        image_size=(64, 32),
        patch_size=(16, 16),
        enc_dim=32,
        enc_depth=1,
        enc_heads=2,
        dec_dim=32,
        dec_depth=2,
        dec_heads=2,
        max_len=8,
    )
    images = jnp.zeros((2, 64, 32, 3), jnp.float32)
    tokens = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), images, tokens)["params"]
    return model, params


def test_forward_shapes(tiny_model):
    model, params = tiny_model
    images = jnp.ones((2, 64, 32, 3))
    tokens = jnp.ones((2, 8), jnp.int32)
    logits = model.apply({"params": params}, images, tokens)
    assert logits.shape == (2, 8, 20)


def test_teacher_forcing_is_causal(tiny_model):
    """Changing a later token must not affect earlier logits."""
    model, params = tiny_model
    images = jnp.ones((1, 64, 32, 3))
    t1 = jnp.array([[2, 5, 6, 7, 0, 0, 0, 0]], jnp.int32)
    t2 = t1.at[0, 3].set(9)
    l1 = model.apply({"params": params}, images, t1)
    l2 = model.apply({"params": params}, images, t2)
    np.testing.assert_allclose(
        np.asarray(l1[:, :3]), np.asarray(l2[:, :3]), atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[:, 3]), np.asarray(l2[:, 3]))


def test_greedy_matches_uncached_argmax(tiny_model):
    """Cached scan generation == Python loop with full-sequence forward."""
    model, params = tiny_model
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 32, 3)).astype(np.float32))
    out = np.asarray(greedy_generate(model, params, images, max_len=8))

    # reference loop: re-run the full teacher-forced forward each step
    bos, eos = 2, 3
    seqs = np.full((2, 9), 0, np.int64)
    seqs[:, 0] = bos
    done = np.zeros(2, bool)
    for t in range(8):
        logits = model.apply(
            {"params": params}, images, jnp.asarray(seqs[:, : t + 1], jnp.int32)
        )
        nxt = np.asarray(logits[:, -1].argmax(-1))
        nxt = np.where(done, 0, nxt)
        seqs[:, t + 1] = nxt
        done |= nxt == eos
    np.testing.assert_array_equal(out, seqs[:, 1:])


def test_beam_search_runs_and_beats_greedy_score(tiny_model):
    model, params = tiny_model
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 32, 3)).astype(np.float32))
    beam = np.asarray(beam_generate(model, params, images, max_len=8, num_beams=4))
    assert beam.shape == (2, 8)

    def seq_logprob(seq):
        """Score a generated sequence under teacher forcing."""
        toks = np.concatenate([[2], seq[seq != 0]])
        logits = model.apply(
            {"params": params}, images[:1], jnp.asarray(toks[None, :-1], jnp.int32)
        )
        lp = jax.nn.log_softmax(np.asarray(logits)[0], -1)
        return sum(lp[i, t] for i, t in enumerate(toks[1:]))

    greedy = np.asarray(greedy_generate(model, params, images, max_len=8))
    # beam-4 must never be worse than greedy on total log-prob (same lengths)
    g, b = greedy[0], beam[0]
    if (g != 0).sum() == (b != 0).sum():
        assert seq_logprob(b) >= seq_logprob(g) - 1e-4


def test_generate_stops_at_eos(tiny_model):
    model, params = tiny_model
    images = jnp.zeros((1, 64, 32, 3))
    out = np.asarray(greedy_generate(model, params, images, max_len=8))[0]
    if 3 in out:
        after = out[np.argmax(out == 3) + 1 :]
        assert (after == 0).all()
