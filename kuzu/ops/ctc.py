"""CTC loss and greedy decoding in pure JAX (log-semiring scan).

TPU-native replacement for the cuDNN ``nn.CTCLoss`` kernel the reference uses
(``scripts/ocr_model.py:83,121``, ``ocr_lightning/model.py:52``,
``src/models/character_detection/csa_vit_model.py:828``). The forward
(alpha) recursion runs as a `lax.scan` over time with a static extended-label
length, so the whole loss jits and differentiates; blank id is 0 to match the
reference's vocab convention (<PAD>=0 doubles as CTC blank).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _ctc_loss_single(
    log_probs: jnp.ndarray,  # (T, C) log-softmax
    labels: jnp.ndarray,  # (L,) int, 0-padded
    logit_length: jnp.ndarray,  # scalar int
    label_length: jnp.ndarray,  # scalar int
    blank: int,
) -> jnp.ndarray:
    T, _ = log_probs.shape
    L = labels.shape[0]
    S = 2 * L + 1
    # extended label sequence: blank, l1, blank, l2, ..., blank
    ext = jnp.full((S,), blank, dtype=labels.dtype)
    ext = ext.at[1::2].set(labels)
    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    # transition from s-2 allowed when ext[s] != blank and ext[s] != ext[s-2]
    ext_m2 = jnp.concatenate([jnp.full((2,), blank, dtype=ext.dtype), ext[:-2]])
    allow_skip = is_label & (ext != ext_m2)

    ext_len = 2 * label_length + 1

    def emit(t):
        return log_probs[t, ext]  # (S,)

    alpha0 = jnp.full((S,), NEG_INF)
    alpha0 = alpha0.at[0].set(emit(0)[0])
    alpha0 = alpha0.at[1].set(jnp.where(label_length > 0, emit(0)[1], NEG_INF))

    def step(alpha, t):
        a_shift1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        a_shift2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        a_shift2 = jnp.where(allow_skip, a_shift2, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(alpha, a_shift1), a_shift2)
        new_alpha = merged + emit(t)
        # freeze the recursion past logit_length so padding frames are no-ops
        new_alpha = jnp.where(t < logit_length, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    # total prob = alpha[ext_len-1] + alpha[ext_len-2]
    last = alpha[jnp.clip(ext_len - 1, 0, S - 1)]
    second = jnp.where(
        ext_len >= 2, alpha[jnp.clip(ext_len - 2, 0, S - 1)], NEG_INF
    )
    return -jnp.logaddexp(last, second)


@partial(jax.jit, static_argnames=("blank", "reduction"))
def ctc_loss(
    logits: jnp.ndarray,  # (B, T, C) raw
    labels: jnp.ndarray,  # (B, L) int, 0-padded
    logit_lengths: jnp.ndarray,  # (B,)
    label_lengths: jnp.ndarray,  # (B,)
    blank: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Batched CTC negative log-likelihood.

    ``reduction='mean'`` averages per-sample loss over label length then over
    batch — matching torch ``nn.CTCLoss(reduction='mean')`` semantics.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    losses = jax.vmap(_ctc_loss_single, in_axes=(0, 0, 0, 0, None))(
        log_probs, labels, logit_lengths, label_lengths, blank
    )
    if reduction == "none":
        return losses
    if reduction == "sum":
        return losses.sum()
    denom = jnp.clip(label_lengths.astype(losses.dtype), 1, None)
    return (losses / denom).mean()


@partial(jax.jit, static_argnames=("blank",))
def ctc_greedy_decode(
    logits: jnp.ndarray, logit_lengths: jnp.ndarray | None = None, blank: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy CTC decode: argmax, collapse repeats, strip blanks.

    Returns (sequences (B, T) 0-padded, lengths (B,)). Fixed-shape: scatter
    compaction instead of Python-level filtering
    (cf. reference ``_greedy_decode`` ``scripts/ocr_model.py:201``).
    """
    B, T, _ = logits.shape
    preds = logits.argmax(axis=-1)  # (B, T)
    if logit_lengths is None:
        logit_lengths = jnp.full((B,), T)
    t_idx = jnp.arange(T)

    def decode_one(p, n):
        prev = jnp.concatenate([jnp.full((1,), -1, dtype=p.dtype), p[:-1]])
        keep = (p != blank) & (p != prev) & (t_idx < n)
        pos = jnp.cumsum(keep) - 1
        out = jnp.zeros((T + 1,), dtype=p.dtype)
        out = out.at[jnp.where(keep, pos, T)].set(jnp.where(keep, p, 0))
        return out[:T], keep.sum()

    return jax.vmap(decode_one)(preds, logit_lengths)
