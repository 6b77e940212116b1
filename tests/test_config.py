"""YAML -> dataclass config parity (shape of ev-NSFnet/config.py)."""

import textwrap

from nsfnet_tpu.config import ConfigManager


def test_defaults_match_reference_production():
    cfg = ConfigManager().config
    assert cfg.physics.Re == 5000.0
    assert cfg.physics.bc_weight == 10.0
    assert cfg.network.layers == 6 and cfg.network.hidden_size == 80
    assert cfg.network.layers_1 == 4 and cfg.network.hidden_size_1 == 40
    assert cfg.training.N_f == 120000
    assert len(cfg.training.training_stages) == 6
    assert cfg.training.training_stages[0].alpha == 0.05
    assert cfg.training.training_stages[-1].lr == 2e-6


def test_yaml_merge_and_stage_forms(tmp_path):
    yaml_text = textwrap.dedent("""
        experiment_name: test_exp
        model_variant: nsfnet
        physics: {Re: 2000, bc_weight: 5}
        network: {layers: 4, hidden_size: 120}
        training:
          N_f: 40000
          sdf_weighting: {enabled: true, min_weight: 0.3}
          training_stages:
            - {alpha: 0.03, epochs: 100, lr: 1.0e-3, name: S1}
            - [0.01, 200, 1.0e-4, S2]
            - {alpha: 0.0, epochs: 50, lr: 1.0, name: polish, optimizer: lbfgs}
        supervision: {enabled: true, num_samples: 100, loss_weight: 0.5}
    """)
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cm = ConfigManager.from_file(str(p))
    c = cm.config
    assert c.experiment_name == "test_exp"
    assert c.model_variant == "nsfnet"
    assert c.physics.Re == 2000 and c.physics.bc_weight == 5
    assert c.network.layers == 4 and c.network.hidden_size == 120
    assert c.training.N_f == 40000
    assert c.training.sdf_weighting.enabled and c.training.sdf_weighting.min_weight == 0.3
    assert len(c.training.training_stages) == 3
    assert c.training.training_stages[1].epochs == 200
    assert c.training.training_stages[2].optimizer == "lbfgs"
    assert c.supervision.enabled and c.supervision.num_samples == 100
    assert cm.validate() == []


def test_validation_catches_errors():
    cm = ConfigManager.from_dict({"physics": {"Re": -1}, "model_variant": "bogus"})
    warnings = cm.validate()
    assert any("Re" in w for w in warnings)
    assert any("model_variant" in w for w in warnings)


def test_resample_flag_parses():
    cm = ConfigManager.from_dict({"training": {"resample_each_stage": True}})
    assert cm.config.training.resample_each_stage is True


def test_unknown_keys_warn():
    # a typo'd key must surface in validate(), not silently train defaults
    cm = ConfigManager.from_dict({
        "traning_stages": [],                         # top-level typo
        "physics": {"Re": 100, "alpha_evn": 0.1},     # nested typo
        "training": {"N_ff": 1,
                     "sdf_weighting": {"min_wieght": 0.3}},
    })
    joined = "\n".join(cm.validate())
    assert "traning_stages" in joined
    assert "physics.alpha_evn" in joined
    assert "training.N_ff" in joined
    assert "training.sdf_weighting.min_wieght" in joined
    # a clean config produces no unknown-key warnings
    assert ConfigManager.from_dict({"physics": {"Re": 100}}).validate() == []


def test_stage_positivity_validated():
    cm = ConfigManager.from_dict({"training": {"training_stages": [
        {"alpha": 0.05, "epochs": 0, "lr": 1e-3, "name": "bad_epochs"},
        {"alpha": 0.05, "epochs": 10, "lr": -1.0, "name": "bad_lr"},
    ]}})
    probs = cm.validate()
    assert any("epochs must be > 0" in p for p in probs)
    assert any("lr must be > 0" in p for p in probs)


def test_stall_floor_derives_by_default():
    """advance_on_stall stages with no explicit stall_min_epochs get a
    derived floor of epochs//4 (the Re=5000 S1/S2 postmortem: an unset
    floor must not mean 'no floor'); explicit values — including an
    explicit 0 opt-out — are respected, and non-stall stages resolve to 0."""
    cm = ConfigManager.from_dict({"training": {"training_stages": [
        {"alpha": 0.05, "epochs": 200000, "lr": 1e-3, "name": "derived",
         "advance_on_stall": True},
        {"alpha": 0.03, "epochs": 200000, "lr": 1e-4, "name": "explicit",
         "advance_on_stall": True, "stall_min_epochs": 123},
        {"alpha": 0.02, "epochs": 200000, "lr": 1e-4, "name": "optout",
         "advance_on_stall": True, "stall_min_epochs": 0},
        {"alpha": 0.01, "epochs": 200000, "lr": 1e-5, "name": "nostall"},
    ]}})
    stages = cm.config.training.training_stages
    assert stages[0].resolved_stall_min() == 50000
    assert stages[1].resolved_stall_min() == 123
    assert stages[2].resolved_stall_min() == 0
    assert stages[3].resolved_stall_min() == 0
    assert cm.validate() == []


def test_rar_schedule_validated():
    cm = ConfigManager.from_dict({"training": {
        "resample_each_stage": True, "rar_pool_mult": 2,
        "rar_schedule": "sometimes"}})
    assert any("rar_schedule" in p for p in cm.validate())
    for ok in ("first", "every"):
        cm = ConfigManager.from_dict({"training": {
            "resample_each_stage": True, "rar_pool_mult": 2,
            "rar_schedule": ok}})
        assert cm.validate() == []


def test_stall_metric_validated():
    # unknown metric name warns
    cm = ConfigManager.from_dict({"training": {"stall_metric": "loss_rate"}})
    assert any("stall_metric" in p for p in cm.validate())
    # eval_error without eval_data (and a stall-gated stage) warns: the
    # detector would silently fall back to the eq-loss track
    cm = ConfigManager.from_dict({"training": {
        "stall_metric": "eval_error",
        "training_stages": [
            {"alpha": 0.05, "epochs": 10, "lr": 1e-3, "name": "S1",
             "advance_on_stall": True}]}})
    assert any("eval_data" in p for p in cm.validate())
    # eval_error with eval_data is clean
    cm = ConfigManager.from_dict({
        "eval_data": "/tmp/dns.mat",
        "training": {"stall_metric": "eval_error"}})
    assert cm.validate() == []
