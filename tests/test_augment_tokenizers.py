import numpy as np
import pytest


def _img(rng):
    return rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)


def test_photometric_augs_preserve_shape_dtype(rng):
    from kuzu.data.augment_extra import (
        coarse_dropout,
        gauss_noise,
        grid_distortion,
        jpeg_compression,
        motion_blur,
    )

    img = _img(rng)
    for fn in (gauss_noise, motion_blur, jpeg_compression, grid_distortion, coarse_dropout):
        out = fn(img, rng)
        assert out.shape == img.shape, fn.__name__
        assert out.dtype == np.uint8, fn.__name__
        assert not np.array_equal(out, img), fn.__name__  # actually did something


def test_apply_photometric_composes(rng):
    from kuzu.data.augment_extra import apply_photometric

    img = _img(rng)
    out = apply_photometric(img, rng, p_noise=1, p_blur=1, p_jpeg=1, p_distort=1, p_dropout=1)
    assert out.shape == img.shape
    out2 = apply_photometric(img, rng, 0, 0, 0, 0, 0)
    np.testing.assert_array_equal(out2, img)  # all off = identity


def test_hf_tokenizer_trainers(tmp_path):
    pytest.importorskip("tokenizers")
    from kuzu.tools.train_tokenizers import (
        concatenate_corpus,
        load_hf_tokenizer,
        train_bpe_tokenizer,
        train_one_char_tokenizer,
        train_unigram_tokenizer,
    )

    (tmp_path / "a.txt").write_text("ありがとうございます\nとうきょうにいく\n", encoding="utf-8")
    (tmp_path / "b.txt").write_text("ありえないこと\n", encoding="utf-8")
    n = concatenate_corpus([tmp_path / "a.txt", tmp_path / "b.txt"], tmp_path / "corpus.txt")
    assert n == 3
    corpus = (tmp_path / "corpus.txt").read_text(encoding="utf-8").splitlines()

    p1 = train_one_char_tokenizer(corpus, tmp_path / "one_char.json")
    tok = load_hf_tokenizer(p1)
    enc = tok.encode("ありがとう")
    ids = enc.ids if hasattr(enc, "ids") else enc
    assert len(ids) == 5  # one token per char

    p2 = train_bpe_tokenizer(corpus, tmp_path / "bpe.json", vocab_size=60)
    assert p2.exists()
    p3 = train_unigram_tokenizer(corpus, tmp_path / "uni.json", vocab_size=40)
    assert p3.exists()


def test_loader_single_process_sharding_noop():
    from kuzu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.float32(i)}

    dl = DataLoader(DS(), 4, shuffle=False, num_workers=0)
    assert dl.process_count == 1 and dl.local_batch == 4
    batches = list(dl)
    assert batches[0]["x"].shape == (4,)


def test_ocr_dataset_augmentation_deterministic_and_epoch_varying(tmp_path):
    """Train-time OCR augmentation: per-(seed, epoch, idx) deterministic,
    varies across epochs, off for val (from-scratch TrOCR needs it; the
    reference starts from pretrained weights and does not)."""
    import numpy as np
    from PIL import Image

    from kuzu.data.ocr_datasets import ColumnInfoDataset
    from kuzu.data.tokenizer import CharTokenizer

    img = tmp_path / "c.png"
    Image.fromarray(
        (np.random.default_rng(0).random((80, 20, 3)) * 255).astype(np.uint8)
    ).save(img)
    csv = tmp_path / "column_info.csv"
    csv.write_text(
        "column_image,original_image,box_in_original,unicode_ids\n"
        + "\n".join(f"c.png,x,\"0,0,20,80\",U+4E00 U+4E01" for _ in range(10))
    )
    tok = CharTokenizer.train(["一丁"])

    mk = lambda aug: ColumnInfoDataset(
        csv, tok, split="train", image_size=(128, 32), augment=aug
    )
    a, b = mk(True), mk(True)
    assert np.allclose(a[0]["image"], b[0]["image"])  # deterministic
    assert not np.allclose(a[0]["image"], a[1]["image"])  # per-idx variation
    b.set_epoch(1)
    assert not np.allclose(a[0]["image"], b[0]["image"])  # per-epoch variation
    plain = mk(False)
    assert np.allclose(plain[0]["image"], plain[1]["image"])  # no aug on val
