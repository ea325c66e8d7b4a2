"""Port-rule coverage: the committed golden fixtures must exercise EVERY
HF->Flax mapping rule that porting the full production geometries uses.

The UNet/VAE goldens are generated from tools/torch_ref.py (an in-repo
torch transcription — diffusers itself is not installed here, see
tests/test_hf_parity.py). That provenance is circular by necessity; what
this test removes is the worse failure mode hiding inside it: a port rule
(port_hf.py) that NO fixture exercises, where a layout/transpose bug would
ship silently. Method:

  1. UNIVERSE: abstract-init (jax.eval_shape — no weights materialized) the
     full SD2-base UNet and VAE, reverse-map every parameter path to its
     diffusers tensor name (the bijection pinned by test_port_weights.py),
     and normalize indices away -> the set of structural rules a real
     checkpoint load runs through.
  2. COVERED: classify the torch-style keys stored in each committed
     fixture the same way.
  3. Assert universe ⊆ covered — a new UNet feature that adds a port rule
     without a fixture fails here.

Also asserts port_unet/port_vae consume every tensor a fixture provides
(no silently ignored weights).

Reference the rules must equal: diffusers from_pretrained layouts
(reference diffusion/models/models.py:74-85).
"""

import re

import numpy as np
import pytest

import jax

from tests.test_port_weights import (_flatten, _unet_to_torch_name,
                                     _vae_to_torch_name)

UNET_FIXTURES = ["unet_golden", "unet_golden_asym", "unet_golden_convproj",
                 "unet_golden_pixel"]
VAE_FIXTURES = ["vae_golden", "vae_golden_asym", "vae_golden_widths"]


def _rule(torch_name: str) -> str:
    """Normalize a diffusers tensor name to its structural rule: indices
    become N, so every `down_blocks.*.resnets.*.conv1.weight` is one rule."""
    return re.sub(r"\d+", "N", torch_name)


def _fixture_rules(names) -> set:
    out = set()
    for f in names:
        z = np.load(f"tests/fixtures/{f}.npz", allow_pickle=True)
        out |= {_rule(k[2:]) for k in z.keys() if k.startswith("w:")}
    return out


def _universe_unet() -> set:
    from diffusion_tpu.models.unet import SD2_BASE_UNET, UNet2DCondition

    unet = UNet2DCondition(SD2_BASE_UNET)
    tree = jax.eval_shape(
        unet.init, jax.random.key(0),
        jax.ShapeDtypeStruct((1, 32, 32, 4), "float32"),
        jax.ShapeDtypeStruct((1,), "int32"),
        jax.ShapeDtypeStruct((1, 77, 1024), "float32"))
    flat = _flatten(jax.tree.map(lambda s: np.zeros((), np.float32),
                                 tree, is_leaf=lambda x: hasattr(x, "shape")
                                 and not isinstance(x, dict))["params"])
    return {_rule(_unet_to_torch_name(p)) for p in flat}


def _universe_vae() -> set:
    from diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig())  # SD2 production geometry defaults
    rng = jax.random.key(0)
    tree = jax.eval_shape(
        vae.init, rng, jax.ShapeDtypeStruct((1, 64, 64, 3), "float32"), rng)
    flat = _flatten(jax.tree.map(lambda s: np.zeros((), np.float32),
                                 tree, is_leaf=lambda x: hasattr(x, "shape")
                                 and not isinstance(x, dict))["params"])
    return {_rule(_vae_to_torch_name(p)) for p in flat}


def test_unet_fixtures_cover_all_port_rules():
    missing = _universe_unet() - _fixture_rules(UNET_FIXTURES)
    assert not missing, (
        f"port rules used by the full SD2 UNet but exercised by NO committed "
        f"fixture: {sorted(missing)} — regenerate a fixture with "
        f"tools/capture_goldens.py covering them")


def test_vae_fixtures_cover_all_port_rules():
    missing = _universe_vae() - _fixture_rules(VAE_FIXTURES)
    assert not missing, (
        f"port rules used by the full SD2 VAE but exercised by NO committed "
        f"fixture: {sorted(missing)}")


class _RecordingDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.touched = set()

    def __getitem__(self, k):
        self.touched.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        # membership probes (e.g. optional conv_shortcut) don't count as
        # consumption — only actual reads do
        return super().__contains__(k)


@pytest.mark.parametrize("fixture,porter", [
    *[(f, "port_unet") for f in UNET_FIXTURES],
    *[(f, "port_vae") for f in VAE_FIXTURES],
])
def test_porter_consumes_every_fixture_tensor(fixture, porter):
    """A tensor the fixture ships but the porter never reads would be a
    silently dropped weight on a real checkpoint load."""
    import diffusion_tpu.models.port_hf as port_hf

    z = np.load(f"tests/fixtures/{fixture}.npz", allow_pickle=True)
    sd = _RecordingDict({k[2:]: z[k] for k in z.keys() if k.startswith("w:")})
    getattr(port_hf, porter)(sd)
    unread = set(sd) - sd.touched
    assert not unread, f"{fixture}: tensors never read by {porter}: " \
                       f"{sorted(unread)[:10]}"
