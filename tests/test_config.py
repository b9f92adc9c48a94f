import pytest

from wav2letter_tpu.config import Config, parse_argv, parse_cfg_file


def test_defaults_and_update():
    cfg = Config()
    assert cfg.batchsize == 1
    assert cfg.criterion == "ctc"
    cfg.update({"batchsize": "16", "lr": "0.5", "mfsc": "true"})
    assert cfg.batchsize == 16 and cfg.lr == 0.5 and cfg.mfsc is True


def test_precedence(tmp_path):
    ff = tmp_path / "f.cfg"
    ff.write_text("--batchsize=8\n--lr=0.1\n# comment\n\n--criterion=asg\n")
    ckpt = {"batchsize": 2, "lr": 9.0, "momentum": 0.5}
    cfg = Config.from_sources(
        argv=["--lr=0.7"], flagsfile=str(ff), checkpoint_cfg=ckpt
    )
    assert cfg.lr == 0.7  # CLI wins
    assert cfg.batchsize == 8  # flagsfile beats checkpoint
    assert cfg.momentum == 0.5  # checkpoint beats default
    assert cfg.criterion == "asg"


def test_serialize_roundtrip():
    cfg = Config()
    cfg.update({"unkscore": float("-inf"), "lr": 0.3})
    blob = cfg.serialize()
    cfg2 = Config.deserialize(blob)
    assert cfg2.unkscore == float("-inf")
    assert cfg2.lr == 0.3


def test_deprecated_aliases():
    cfg = Config()
    cfg.update({"silweight": 1.5})
    assert cfg.silscore == 1.5
    cfg.update({"memstepsize": 1000})  # ignored, no error


def test_unknown_flag_raises():
    with pytest.raises(KeyError):
        Config().update({"not_a_flag": 1})


def test_feature_helpers():
    cfg = Config()
    cfg.update({"mfsc": True, "filterbanks": 40})
    assert cfg.feature_type() == "mfsc"
    assert cfg.num_features() == 40
    cfg.update({"devwin": 2})
    assert cfg.num_features() == 120


def test_valid_sets():
    cfg = Config()
    cfg.update({"valid": "dev:/a/b.lst,other:/c/d.lst"})
    assert cfg.valid_sets() == [("dev", "/a/b.lst"), ("other", "/c/d.lst")]


def test_runtime_flags_logging():
    """--minloglevel/--logtostderr drive the Python logging setup (glog
    parity); apply_runtime_flags runs at CLI config parse time."""
    import logging

    from wav2letter_tpu.config import Config

    cfg = Config()
    cfg.update(dict(minloglevel=2))
    cfg.apply_runtime_flags()
    assert logging.getLogger().level == logging.ERROR
    cfg.update(dict(minloglevel=0, logtostderr=True))
    cfg.apply_runtime_flags()
    assert logging.getLogger().level == logging.INFO
