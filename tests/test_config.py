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


def test_pipeline_config_from_yaml_keys():
    """The yaml keys the drivers advertise reach PipelineConfig — incl.
    the point cap (filtering.max_points_per_car; reference caps at 10,000,
    loader.py:188-192) and the pedestrian branch flag."""
    from monosowa_tpu.config import Config
    from monosowa_tpu.sowa.cli import pipeline_config_from

    cfg = Config({
        "filtering": {"max_points_per_car": 10000,
                      "lidar_threshold_during_optim": 640},
        "frames_creation": {"nscans_before": 12, "nscans_after": 7,
                            "extract_pedestrians": True},
        "optimization": {"opt_param3_iters": 24},
        "loss_functions": {"loss_function": "chamfer"},
    })
    p = pipeline_config_from(cfg)
    assert p.max_points == 10000
    assert p.min_standing_points == 640
    assert (p.nscans_before, p.nscans_after) == (12, 7)
    assert p.extract_pedestrians is True
    assert p.fit.n_theta == 24
    assert p.fit.loss_function == "chamfer"
    # defaults
    d = pipeline_config_from(Config({}))
    assert d.max_points == 2048 and d.extract_pedestrians is False
