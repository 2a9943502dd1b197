"""VLM fine-tuning entry (Qwen-VL LoRA SFT) — dependency-gated.

Capability parity with the reference ``scripts/qwen3_vl_cft_sft.py`` (P34:
Qwen3-VL-8B 4-bit LoRA SFT on the kuzushiji-column dataset via unsloth/TRL).
A multi-billion-parameter torch VLM is outside this framework's TPU compute
path; this module provides the same entry point and dataset plumbing, and
delegates to unsloth/TRL when those packages are installed (they are not in
the base image — the function raises a clear, actionable error instead).

The kuzu-native alternative for column->text is the TrOCR recognize task,
which trains and serves on the TPU.
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
    base_model: str = "Qwen/Qwen3-VL-8B-Instruct",
    output_dir: str | Path = "runs/vlm_sft",
    lora_rank: int = 16,
    max_steps: int = 1000,
):
    """LoRA SFT a vision-language model on kuzushiji columns."""
    try:
        from unsloth import FastVisionModel  # noqa: F401
        from trl import SFTTrainer  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "VLM fine-tuning needs the 'unsloth' and 'trl' packages (GPU torch "
            "stack), which are not part of the kuzu TPU environment. Install "
            "them on a GPU host, or use the TPU-native recognizer instead: "
            "`python -m kuzu.api.cli train recognize data=<column_info.csv>`."
        ) from e
    # (executed only where unsloth/trl exist)
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
