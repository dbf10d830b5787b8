import os

from ipercore_tpu.services.options import (
    AttrDict, setup, update_extra_args, recursive_update_item, save_cfg, load_toml,
    parse_args,
)


def test_attrdict_nested_access():
    d = AttrDict({"a": {"b": {"c": 1}}})
    assert d.a.b.c == 1
    d.a.b.c = 2
    assert d["a"]["b"]["c"] == 2


def test_recursive_update_dotted():
    cfg = AttrDict({"Train": {"lr_G": 1e-4}, "image_size": 512})
    assert recursive_update_item(cfg, "Train.lr_G", "0.01")
    assert cfg.Train.lr_G == 0.01
    assert recursive_update_item(cfg, "image_size", "256")
    assert cfg.image_size == 256
    assert not recursive_update_item(cfg, "No.Such.Key", 1)


def test_update_extra_args_types():
    cfg = AttrDict({"Train": {"use_face": True, "lambda_rec": 10.0}, "num_source": 2})
    update_extra_args(cfg, ["--Train.use_face", "false", "--num_source", "4", "--Train.lambda_rec", "5.5"])
    assert cfg.Train.use_face is False
    assert cfg.num_source == 4
    assert cfg.Train.lambda_rec == 5.5


def test_setup_defaults_and_save_roundtrip(tmp_path):
    cfg = setup(None, ["--image_size", "256"])
    assert cfg.image_size == 256
    assert cfg.Generator.TSFNet.num_filters == [64, 128, 256]
    p = str(tmp_path / "opts.toml")
    save_cfg(cfg, p)
    back = load_toml(p)
    assert back["image_size"] == 256
    assert back["Train"]["lambda_rec"] == 10.0


def test_parse_args_cli():
    cfg = parse_args(["--src_path", "path?=/a,name?=n", "--image_size", "128",
                      "--Train.lambda_tsf", "3.0"])
    assert cfg.src_path == "path?=/a,name?=n"
    assert cfg.image_size == 128
    assert cfg.Train.lambda_tsf == 3.0
