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
