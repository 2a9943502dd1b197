"""Subword tokenizer training on the HF ``tokenizers`` library.

Capability parity with the reference's tokenizer-training scripts (P24):
- one-char WordLevel (``train_tokenizer_one_char.py:32-145``: NFKC
  normalizer, isolate-every-char pre-tokenizer, WordLevelTrainer) — also
  available dependency-free as ``kuzu.data.tokenizer.CharTokenizer``;
- BPE (``scripts/train_tokenizer_hf.py``);
- Unigram/SentencePiece-style (``scripts/train_tokenizer_sentencepiece.py``);
- corpus concatenation helper (``scripts/concatenate_files.py``).

All return a saved ``tokenizers.Tokenizer`` JSON that HF
``PreTrainedTokenizerFast`` can wrap.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable

SPECIALS = ["<pad>", "<unk>", "<s>", "</s>", "<mask>"]


def concatenate_corpus(inputs: Iterable[str | Path], out_path: str | Path) -> int:
    """Concatenate text files into one training corpus; returns line count."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(out_path, "w", encoding="utf-8") as out:
        for p in inputs:
            for line in Path(p).read_text(encoding="utf-8").splitlines():
                if line.strip():
                    out.write(line.strip() + "\n")
                    n += 1
    return n


def train_one_char_tokenizer(
    corpus: Iterable[str], out_path: str | Path, vocab_size: int = 8000
) -> Path:
    """WordLevel one-char tokenizer: NFKC + isolate every char."""
    from tokenizers import Regex, Tokenizer, models, normalizers, pre_tokenizers, trainers

    tok = Tokenizer(models.WordLevel(unk_token="<unk>"))
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Split(
        Regex(r"[\s\S]"), behavior="isolated"
    )
    trainer = trainers.WordLevelTrainer(
        vocab_size=vocab_size, special_tokens=SPECIALS
    )
    tok.train_from_iterator(corpus, trainer)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tok.save(str(out_path))
    return out_path


def train_bpe_tokenizer(
    corpus: Iterable[str], out_path: str | Path, vocab_size: int = 16000
) -> Path:
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(vocab_size=vocab_size, special_tokens=SPECIALS)
    tok.train_from_iterator(corpus, trainer)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tok.save(str(out_path))
    return out_path


def train_unigram_tokenizer(
    corpus: Iterable[str], out_path: str | Path, vocab_size: int = 16000
) -> Path:
    """Unigram model — the sentencepiece-style trainer."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers

    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=vocab_size, special_tokens=SPECIALS, unk_token="<unk>"
    )
    tok.train_from_iterator(corpus, trainer)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tok.save(str(out_path))
    return out_path


def load_hf_tokenizer(path: str | Path):
    """Wrap a saved tokenizer for use with HF-style APIs when available."""
    try:
        from transformers import PreTrainedTokenizerFast

        return PreTrainedTokenizerFast(
            tokenizer_file=str(path),
            pad_token="<pad>", unk_token="<unk>", bos_token="<s>",
            eos_token="</s>", mask_token="<mask>",
        )
    except ImportError:
        from tokenizers import Tokenizer

        return Tokenizer.from_file(str(path))
