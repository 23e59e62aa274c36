"""Config-system tests: yacs-compatible semantics incl. deprecated keys so the
reference's released cfg.yml files parse unchanged (SURVEY.md section 5.6)."""
import pytest

from lion_tpu.config import CfgNode, get_default_cfg


def test_default_cfg_key_surface():
    cfg = get_default_cfg()
    # spot-check the load-bearing keys of the released configs
    assert cfg.latent_pts.style_dim == 128
    assert cfg.shapelatent.latent_dim == 256
    assert cfg.ddpm.num_steps == 1000
    assert cfg.ddpm.beta_1 == 1e-4
    assert cfg.ddpm.beta_T == 2e-2
    assert cfg.data.tr_max_sample_points == 2048
    assert cfg.sde.embedding_scale == 1.0
    assert cfg.latent_pts.style_prior == "models.score_sde.resnet.PriorSEDrop"


def test_merge_from_list():
    cfg = get_default_cfg()
    cfg.merge_from_list(["ddpm.num_steps", "100", "data.cates", "airplane",
                         "sde.mixed_prediction", "True"])
    assert cfg.ddpm.num_steps == 100
    assert cfg.data.cates == "airplane"
    assert cfg.sde.mixed_prediction is True


def test_merge_from_list_deprecated_key_skipped():
    cfg = get_default_cfg()
    cfg.merge_from_list(["latent_pts.knn", "5"])  # deprecated -> ignored


def test_merge_unknown_key_raises():
    cfg = get_default_cfg()
    with pytest.raises(AssertionError):
        cfg.merge_from_list(["no.such.key", "1"])


def test_merge_from_file_roundtrip(tmp_path):
    cfg = get_default_cfg()
    cfg.ddpm.num_steps = 123
    p = tmp_path / "cfg.yml"
    cfg.save(str(p))
    cfg2 = get_default_cfg()
    cfg2.merge_from_file(str(p))
    assert cfg2.ddpm.num_steps == 123
    assert cfg2.to_dict() == cfg.to_dict()


def test_merge_from_file_with_deprecated_keys(tmp_path):
    p = tmp_path / "old.yml"
    p.write_text("latent_pts:\n  knn: 5\n  style_dim: 64\n")
    cfg = get_default_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.latent_pts.style_dim == 64
    assert "knn" not in cfg.latent_pts


def test_freeze():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.exp_name = "x"
    cfg.defrost()
    cfg.exp_name = "x"
    assert cfg.exp_name == "x"


def test_type_coercion():
    cfg = CfgNode({"a": 1.0, "b": [1, 2]})
    cfg.merge_from_list(["a", "2", "b", "[3, 4]"])
    assert cfg.a == 2.0 and isinstance(cfg.a, float)
    assert cfg.b == [3, 4]


def test_reference_released_config_parses():
    """The released prior cfg.yml files from the reference must parse."""
    import os
    path = "/root/reference/config/airplane_prior_cfg.yml"
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    cfg = get_default_cfg()
    cfg.merge_from_file(path)
    assert cfg.data.cates == "airplane"
    assert cfg.sde.num_channels_dae == 2048
    assert cfg.shapelatent.latent_dim == 1
    assert cfg.trainer.type == "trainers.train_2prior"
