import pytest

from kuzu.core.config import Config, load_config, parse_overrides


def test_attribute_access_and_nesting():
    cfg = Config({"a": {"b": 1}, "c": [1, {"d": 2}]})
    assert cfg.a.b == 1
    assert cfg.c[1].d == 2
    cfg.a.b = 5
    assert cfg["a"]["b"] == 5


def test_merge_precedence():
    cfg = Config({"lr0": 0.01, "aug": {"mosaic": 1.0, "fliplr": 0.5}})
    cfg.merge({"aug": {"mosaic": 0.0}, "epochs": 3})
    assert cfg.aug.mosaic == 0.0
    assert cfg.aug.fliplr == 0.5
    assert cfg.epochs == 3


def test_parse_overrides_types():
    cfg = parse_overrides(["epochs=5", "lr0=0.1", "save=false", "name=exp1", "mesh.data=4"])
    assert cfg.epochs == 5 and isinstance(cfg.epochs, int)
    assert cfg.lr0 == 0.1
    assert cfg.save is False
    assert cfg.name == "exp1"
    assert cfg.mesh.data == 4


def test_load_defaults_and_override(tmp_path):
    cfg = load_config(overrides=["epochs=7"])
    assert cfg.epochs == 7
    assert cfg.task == "detect"
    assert cfg.mesh.model == 1


def test_unknown_key_suggestion():
    with pytest.raises(KeyError, match="epochs"):
        load_config(overrides=["epoch=3"], strict=True)


def test_save_roundtrip(tmp_path):
    cfg = load_config(overrides=["name=x"])
    p = tmp_path / "cfg.yaml"
    cfg.to_yaml(p)
    cfg2 = load_config(p)
    assert cfg2.name == "x"
