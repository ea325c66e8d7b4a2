"""Config substrate tests: interpolation, overrides, _target_ instantiation."""

import functools

import pytest

from diffusion_tpu.config import apply_overrides, instantiate, loads_config

YAML = """
batch_size: 2048
name: run1
dataset:
  train_batch_size: ${batch_size}
  label: "bs=${batch_size}"
  nested:
    again: ${dataset.train_batch_size}
opt:
  _target_: collections.OrderedDict
"""


def test_interpolation_types():
    cfg = loads_config(YAML)
    assert cfg["dataset"]["train_batch_size"] == 2048          # int preserved
    assert cfg["dataset"]["label"] == "bs=2048"                # string substitution
    assert cfg["dataset"]["nested"]["again"] == 2048           # chained


def test_missing_interpolation_raises():
    with pytest.raises(KeyError):
        loads_config("a: ${nope}")


def test_circular_interpolation_raises():
    with pytest.raises(ValueError):
        loads_config("a: ${b}\nb: ${a}")


def test_overrides():
    cfg = loads_config(YAML, overrides=["batch_size=512", "+new.key=3", "~opt"])
    assert cfg["batch_size"] == 512
    assert cfg["dataset"]["train_batch_size"] == 512
    assert cfg["new"]["key"] == 3
    assert "opt" not in cfg


def test_override_missing_key_raises():
    with pytest.raises(KeyError):
        apply_overrides({"a": 1}, ["b=2"])


def test_override_value_parsing():
    cfg = apply_overrides({"a": 1, "b": 1, "c": 1, "d": 1},
                          ["a=null", "b=true", "c=1.5e-3", "d=[1,2]"])
    assert cfg["a"] is None and cfg["b"] is True
    assert cfg["c"] == 1.5e-3 and cfg["d"] == [1, 2]


def test_instantiate_target():
    obj = instantiate({"_target_": "fractions.Fraction", "numerator": 3, "denominator": 4})
    import fractions
    assert obj == fractions.Fraction(3, 4)


def test_instantiate_recursive_and_partial():
    node = {
        "_target_": "builtins.dict",
        "inner": {"_target_": "fractions.Fraction", "numerator": 1, "denominator": 2},
    }
    obj = instantiate(node)
    import fractions
    assert obj["inner"] == fractions.Fraction(1, 2)

    p = instantiate({"_target_": "fractions.Fraction", "_partial_": True, "denominator": 8})
    assert isinstance(p, functools.partial)
    assert p(2) == fractions.Fraction(2, 8)


def test_instantiate_non_recursive():
    node = {
        "_target_": "builtins.dict",
        "_recursive_": False,
        "inner": {"_target_": "fractions.Fraction"},
    }
    obj = instantiate(node)
    assert obj["inner"] == {"_target_": "fractions.Fraction"}  # raw config passed through


def test_instantiate_kwarg_override():
    import fractions
    obj = instantiate({"_target_": "fractions.Fraction", "numerator": 3}, denominator=6)
    assert obj == fractions.Fraction(3, 6)


def test_override_delete_with_value_suffix():
    """hydra's '~a.b=value' form (delete, value informational) must actually
    delete — the '=value' used to stay inside the key path, a silent no-op."""
    from diffusion_tpu.config.loader import apply_overrides
    cfg = {"trainer": {"grad_clip_norm": 1.0, "seed": 3}}
    out = apply_overrides(cfg, ["~trainer.grad_clip_norm=1.0"])
    assert "grad_clip_norm" not in out["trainer"]
    assert out["trainer"]["seed"] == 3


def test_override_through_null_parent():
    """Null placeholder nodes ('logger:\\n  wandb:'): set raises an
    actionable KeyError (not TypeError on NoneType), + creates the subtree,
    ~ is a clean no-op."""
    import pytest

    from diffusion_tpu.config.loader import apply_overrides
    cfg = {"logger": {"wandb": None}}
    with pytest.raises(KeyError, match="null"):
        apply_overrides(cfg, ["logger.wandb.project=x"])
    out = apply_overrides(cfg, ["+logger.wandb.project=x"])
    assert out["logger"]["wandb"] == {"project": "x"}
    out2 = apply_overrides(cfg, ["~logger.wandb.project"])
    assert out2["logger"]["wandb"] is None        # nothing to delete


def test_loads_config_matches_load_config_dialect(tmp_path):
    """The string and file entry points parse identically: mosaic
    'parameters:' unwrapping and the top-level-mapping check apply to both."""
    import pytest

    from diffusion_tpu.config.loader import load_config, loads_config
    text = "parameters:\n  model:\n    lr: 3\n"
    f = tmp_path / "c.yaml"
    f.write_text(text)
    assert loads_config(text) == load_config(str(f)) == {"model": {"lr": 3}}
    with pytest.raises(TypeError, match="mapping"):
        loads_config("- a\n- b\n")
