import pytest

from monosowa_tpu.config import Config, PipelineFlags, known_actions


def test_config_attribute_access_and_silent_none():
    cfg = Config({"general": {"device": "tpu", "batch_size": 4},
                  "paths": {"labels_path": "/tmp/x"}})
    assert cfg.general.device == "tpu"
    assert cfg.paths.labels_path == "/tmp/x"
    assert cfg.general.nonexistent is None          # silent-None semantics
    assert cfg.missing_section is None


def test_config_merge_defaults():
    defaults = Config({"opt": {"iters": 40, "lr": 0.1}, "flag": True})
    user = Config({"opt": {"iters": 10}})
    merged = user.merged_under(defaults)
    assert merged.opt.iters == 10
    assert merged.opt.lr == 0.1
    assert merged.flag is True


def test_action_flags():
    f = PipelineFlags("optimization")
    assert f.do_optim and f.load_merged_frames and f.load_transformations
    assert not f.generate_raw_lidar
    f2 = PipelineFlags("lidar_scans")
    assert f2.generate_raw_lidar and not f2.do_optim
    f3 = PipelineFlags("demo")
    assert f3.do_optim and f3.do_optim_scale and f3.compute_dimensions
    with pytest.raises(ValueError):
        PipelineFlags("bogus")
    assert "optimization" in known_actions()
