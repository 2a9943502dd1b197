"""VLM fine-tuning entry (LoRA SFT on kuzushiji columns).

Capability parity with the reference ``scripts/qwen3_vl_cft_sft.py`` (P34:
Qwen3-VL-8B 4-bit LoRA SFT on the kuzushiji-column dataset via unsloth/TRL).
Two backends:

- ``native`` (default on this stack): LoRA-SFT kuzu's own vision
  encoder-decoder (TrOCR) on the TPU — the base checkpoint freezes and
  rank-r adapters train via the generic PEFT path (``kuzu/core/lora.py``,
  ``lora_rank=`` on any trainer). Same recipe shape as the reference
  (frozen multi-modal base + adapters + SFT records), on-device instead of
  delegated to a GPU torch stack.
- ``unsloth``: the reference's exact path, used verbatim when the
  unsloth/TRL packages exist (they are not in the kuzu TPU image).

``build_sft_records`` is shared: column_info.csv -> chat-format records.
"""

from __future__ import annotations

from pathlib import Path


def build_sft_records(
    column_info_csv: str | Path,
    instruction: str = "Transcribe the kuzushiji text in this image.",
) -> list[dict]:
    """column_info.csv -> chat-format SFT records (image path + target text)."""
    import pandas as pd

    from kuzu.data.tokenizer import decode_unicode_ids

    df = pd.read_csv(column_info_csv)
    root = Path(column_info_csv).parent
    records = []
    for _, row in df.iterrows():
        records.append(
            {
                "image": str(root / str(row["column_image"])),
                "messages": [
                    {"role": "user", "content": instruction},
                    {
                        "role": "assistant",
                        "content": decode_unicode_ids(str(row["unicode_ids"])),
                    },
                ],
            }
        )
    return records


def finetune_vlm(
    column_info_csv: str | Path,
    base_model: str | Path | None = None,
    output_dir: str | Path = "runs/vlm_sft",
    lora_rank: int = 16,
    max_steps: int = 1000,
    backend: str = "auto",
    **overrides,
):
    """LoRA SFT a vision-language model on kuzushiji columns.

    ``base_model``: a kuzu recognize run dir (native backend: its weights
    become the frozen base; omit to adapt from scratch) or an HF model id
    (unsloth backend). ``backend='auto'`` picks unsloth when installed,
    else the TPU-native path.
    """
    if backend == "auto":
        try:
            import unsloth  # noqa: F401

            backend = "unsloth"
        except ImportError:
            backend = "native"
    if backend == "native":
        return _finetune_native(
            column_info_csv, base_model, output_dir, lora_rank, max_steps,
            **overrides,
        )
    return _finetune_unsloth(
        column_info_csv, base_model or "Qwen/Qwen3-VL-8B-Instruct",
        output_dir, lora_rank, max_steps,
    )


def _finetune_native(
    column_info_csv, base_model, output_dir, lora_rank, max_steps, **overrides
):
    """TPU-native LoRA SFT: frozen TrOCR base + rank-r adapters."""
    from kuzu.api.model import Model

    out = Path(output_dir)
    kw = dict(
        data=str(column_info_csv),
        lora_rank=int(lora_rank),
        optimizer="adamw",
        project=str(out.parent),
        name=out.name,
        exist_ok=True,
    )
    if base_model:
        kw["pretrained"] = str(base_model)
    # max_steps -> epochs against the split size (the trainer's unit)
    import pandas as pd

    n_train = max(int(len(pd.read_csv(column_info_csv)) * 0.8), 1)
    batch = int(overrides.get("batch", 16))
    steps_per_epoch = max(n_train // batch, 1)
    kw["epochs"] = max(int(max_steps) // steps_per_epoch, 1)
    kw.update(overrides)
    model = Model("trocr", task="recognize")
    result = model.train(**kw)
    # the trainer's own save_dir is authoritative (overrides may carry
    # project/name; re-deriving the layout here would return a wrong path)
    return Path(model._trainer.save_dir), result


def _finetune_unsloth(column_info_csv, base_model, output_dir, lora_rank, max_steps):
    """Reference path, only where the unsloth/TRL GPU stack exists."""
    try:
        from trl import SFTTrainer
        from unsloth import FastVisionModel
    except ImportError as e:
        raise ImportError(
            "backend='unsloth' needs the 'unsloth' and 'trl' packages (GPU "
            "torch stack), which are not part of the kuzu TPU environment. "
            "Use backend='native' for the on-device LoRA SFT path."
        ) from e
    records = build_sft_records(column_info_csv)
    model, tokenizer = FastVisionModel.from_pretrained(
        base_model, load_in_4bit=True
    )
    model = FastVisionModel.get_peft_model(model, r=lora_rank)
    trainer = SFTTrainer(
        model=model,
        tokenizer=tokenizer,
        train_dataset=records,
        max_steps=max_steps,
        output_dir=str(output_dir),
    )
    trainer.train()
    trainer.save_model(str(output_dir))
    return output_dir
