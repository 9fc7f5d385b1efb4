"""Config loading: YAML scalar coercion + unknown-key validation.

YAML 1.1 parses bare scientific notation ("1e-4", no decimal point) as a
string, and ints where floats are declared; load_config coerces scalars to
the declared dataclass field types so configs written like the reference's
(`learning_rate: 3e-6`, reference config.yaml:8) load correctly.
"""

import pytest

from owlvit_tpu.utils.config import load_config


def _write(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return str(p)


def test_scientific_notation_lr_coerces(tmp_path):
    cfg = load_config(_write(tmp_path, """
training:
  learning_rate: 1e-4
  weight_decay: 0
model:
  name: tiny
"""))
    assert cfg.training.learning_rate == pytest.approx(1e-4)
    assert isinstance(cfg.training.learning_rate, float)
    assert isinstance(cfg.training.weight_decay, float)  # int -> float


def test_int_fields_from_strings(tmp_path):
    cfg = load_config(_write(tmp_path, """
training:
  n_epochs: "7"
"""))
    assert cfg.training.n_epochs == 7


def test_optional_fields_untouched(tmp_path):
    cfg = load_config(_write(tmp_path, """
training:
  checkpoint_dir: /tmp/ck
  lr_final: 1e-7
"""))
    assert cfg.training.checkpoint_dir == "/tmp/ck"
    assert cfg.training.lr_final == pytest.approx(1e-7)


def test_unknown_key_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown keys"):
        load_config(_write(tmp_path, """
training:
  not_a_real_knob: 1
"""))
