"""LM test harness: interactive / batch masked-prediction demos.

Capability parity with the reference's LM probing scripts (P25:
``test_trained_model.py``, ``demo_test_model.py``, ``quick_test.py``,
``scripts/test_language_model.py``): restore a trained char-MLM run, mask
characters (explicit '〓' marks or random positions), show top-k predictions
and restorations, report masked accuracy over a batch file.

Usage:
  python -m kuzu.tools.lm_demo --model runs/lm/x --text "くもき〓むろこけ"
  python -m kuzu.tools.lm_demo --model runs/lm/x --file corpus.txt --mask-prob 0.15
  python -m kuzu.tools.lm_demo --model runs/lm/x            # interactive
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

MASK_CHAR = "〓"


def _load(model_dir: str):
    from kuzu.core.config import load_config
    from kuzu.tasks.lm import LMPredictor

    p = LMPredictor(load_config(overrides={"model": str(model_dir)}))
    p._setup()
    return p


def topk_predictions(predictor, text: str, k: int = 5) -> list[list[tuple[str, float]]]:
    """Top-k (char, prob) per masked position in ``text``."""
    import jax.numpy as jnp

    tok = predictor.tokenizer
    ids = tok.encode(text, max_length=predictor.max_len)
    pos = [
        i + 1 for i, c in enumerate(tok.normalize(text)) if c == MASK_CHAR
    ]  # +1: BOS
    for p in pos:
        if p < predictor.max_len:
            ids[p] = tok.mask_id
    logits = predictor.model.apply(
        {"params": predictor.params},
        jnp.asarray(ids[None]),
        jnp.asarray((ids != tok.pad_id)[None].astype(np.float32)),
    )
    probs = np.asarray(__import__("jax").nn.softmax(logits[0], axis=-1))
    out = []
    for p in pos:
        order = np.argsort(-probs[p])[:k]
        out.append([(tok.inv.get(int(i), "?"), float(probs[p][i])) for i in order])
    return out


def batch_eval(predictor, file: str, mask_prob: float = 0.15, seed: int = 0) -> dict:
    """Randomly mask a corpus file; report restoration accuracy."""
    rng = np.random.default_rng(seed)
    tok = predictor.tokenizer
    lines = [
        ln.strip()
        for ln in Path(file).read_text(encoding="utf-8").splitlines()
        if ln.strip()
    ]
    total = correct = 0
    for ln in lines:
        chars = list(tok.normalize(ln))[: predictor.max_len - 2]
        if not chars:
            continue
        mask_idx = [i for i in range(len(chars)) if rng.random() < mask_prob]
        if not mask_idx:
            mask_idx = [int(rng.integers(len(chars)))]
        masked = "".join(
            MASK_CHAR if i in mask_idx else c for i, c in enumerate(chars)
        )
        restored = predictor(masked)[0]
        for i in mask_idx:
            total += 1
            if i < len(restored) and restored[i] == chars[i]:
                correct += 1
    return {"masked_acc": correct / max(total, 1), "n_masks": total, "n_lines": len(lines)}


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser("kuzu LM demo")
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", help="text with 〓 masks")
    ap.add_argument("--file", help="corpus file for batch eval")
    ap.add_argument("--mask-prob", type=float, default=0.15)
    ap.add_argument("--topk", type=int, default=5)
    args = ap.parse_args(argv)
    predictor = _load(args.model)

    if args.file:
        res = batch_eval(predictor, args.file, args.mask_prob)
        print(
            f"masked accuracy {res['masked_acc']:.3f} over {res['n_masks']} masks "
            f"({res['n_lines']} lines)"
        )
        return 0
    if args.text:
        texts = [args.text]
    else:
        print(f"interactive mode — type text with {MASK_CHAR} masks, empty line quits")
        texts = iter(sys.stdin.readline, "")
    for t in texts:
        t = t.strip()
        if not t:
            break
        restored = predictor(t)[0]
        print(f"restored: {restored}")
        if MASK_CHAR in t:
            for i, preds in enumerate(topk_predictions(predictor, t, args.topk)):
                pretty = "  ".join(f"{c}({p:.2f})" for c, p in preds)
                print(f"  mask {i}: {pretty}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
