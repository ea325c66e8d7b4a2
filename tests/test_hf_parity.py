"""Live numerical parity vs the HuggingFace stack (SURVEY.md §7 hard-part 1).

transformers (torch CPU) is available in-image, so the CLIP text and vision
towers are checked END-TO-END against transformers.CLIPTextModel /
CLIPVisionModel at tiny geometry: random-init the HF model with a fixed
seed, port its state_dict through tools/port_weights.py, run both stacks on
identical inputs, and compare hidden states. This pins layout mapping,
LayerNorm/GELU semantics, causal masking, and attention math against the
exact code the reference conditions with (reference:
diffusion/models/models.py:82-87 CLIPTextModel; stable_diffusion.py:168).

diffusers is NOT installed here, so UNet/VAE golden parity runs from
committed fixtures when present (tools/capture_goldens.py generates them in
a reference environment); see test_unet_golden_fixture below.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tools.port_weights import port_clip_text

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_hf_text(hidden_act="gelu"):
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act=hidden_act,
        layer_norm_eps=1e-5)
    torch.manual_seed(0)
    return transformers.CLIPTextModel(cfg).eval()


@pytest.mark.parametrize("hidden_act", ["gelu", "quick_gelu"])
def test_clip_text_matches_transformers(hidden_act):
    from diffusion_tpu.models.clip import CLIPTextConfig, CLIPTextModel

    hf = _tiny_hf_text(hidden_act)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = port_clip_text(sd)

    ours = CLIPTextModel(CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act=hidden_act))

    ids = np.random.default_rng(0).integers(1, 99, (2, 77)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    got, _ = ours.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_clip_text_short_sequence_matches():
    """Causal mask + position slicing at non-max length."""
    from diffusion_tpu.models.clip import CLIPTextConfig, CLIPTextModel

    hf = _tiny_hf_text()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = port_clip_text(sd)
    ours = CLIPTextModel(CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77))
    ids = np.random.default_rng(1).integers(1, 99, (1, 11)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    got, _ = ours.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_clip_vision_matches_transformers():
    """CLIP image tower (behind CLIPScore/FID-style metrics) vs HF."""
    from diffusion_tpu.models.clip import CLIPVisionConfig, CLIPVisionModel
    from tools.port_weights import port_clip_vision

    cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
        layer_norm_eps=1e-5)
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = port_clip_vision(sd)

    ours = CLIPVisionModel(CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu"))
    pix = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(pix))
        want_hidden = out.last_hidden_state.numpy()
        want_pooled = out.pooler_output.numpy()
    got_hidden, got_pooled = ours.apply(
        params, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden,
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled,
                               atol=5e-5, rtol=1e-4)


FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _golden(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not captured "
                    f"(generate with tools/capture_goldens.py in a "
                    f"diffusers environment)")
    return np.load(path, allow_pickle=True)


def test_unet_golden_fixture():
    """UNet forward vs a committed diffusers golden (skips until captured)."""
    from diffusion_tpu.models.unet import UNet2DCondition, UNetConfig
    from tools.capture_goldens import TINY_UNET_SPEC, unet_config_from_spec
    from tools.port_weights import port_unet

    data = _golden("unet_golden.npz")
    tensors = {k[len("w:"):]: data[k] for k in data.files if k.startswith("w:")}
    model = UNet2DCondition(unet_config_from_spec(TINY_UNET_SPEC))
    params = port_unet(tensors)
    got = model.apply(params,
                      jnp.asarray(data["sample"].transpose(0, 2, 3, 1)),
                      jnp.asarray(data["timesteps"]),
                      jnp.asarray(data["encoder_hidden_states"]))
    want = data["expected"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_vae_golden_fixture():
    """VAE encode/decode vs a committed diffusers golden (skips until captured)."""
    from diffusion_tpu.models.vae import AutoencoderKL
    from tools.capture_goldens import TINY_VAE_SPEC, vae_config_from_spec
    from tools.port_weights import port_vae

    data = _golden("vae_golden.npz")
    tensors = {k[len("w:"):]: data[k] for k in data.files if k.startswith("w:")}
    model = AutoencoderKL(vae_config_from_spec(TINY_VAE_SPEC))
    params = port_vae(tensors)
    post = model.apply(params, jnp.asarray(data["image"].transpose(0, 2, 3, 1)),
                       method=model.encode)
    np.testing.assert_allclose(np.asarray(post.mean),
                               data["latent_mean"].transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)
    dec = model.apply(params, jnp.asarray(data["latent"].transpose(0, 2, 3, 1)),
                      method=model.decode)
    np.testing.assert_allclose(np.asarray(dec),
                               data["decoded"].transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_clip_metric_tower_matches_transformers(tmp_path):
    """Full CLIPModel (both towers + projections — the CLIPScore tower) vs
    HF, through the npz port path the metric towers actually load
    (port_clip_metric -> npz -> load_inception_params container)."""
    from diffusion_tpu.models.clip import (CLIPModel, CLIPTextConfig,
                                           CLIPVisionConfig)
    from diffusion_tpu.models.inception import load_inception_params
    from tools.port_weights import port_clip_metric

    cfg = transformers.CLIPConfig(
        # eos_token_id=2 is the real openai/clip-vit-large-patch14 config:
        # HF then pools at argmax(input_ids) (modeling_clip.py "PR #24773"
        # legacy branch), which is the behavior our text tower implements
        text_config={"vocab_size": 99, "hidden_size": 32,
                     "intermediate_size": 64, "num_hidden_layers": 2,
                     "num_attention_heads": 4, "max_position_embeddings": 77,
                     "hidden_act": "quick_gelu", "layer_norm_eps": 1e-5,
                     "eos_token_id": 2},
        vision_config={"image_size": 32, "patch_size": 8, "hidden_size": 32,
                       "intermediate_size": 64, "num_hidden_layers": 2,
                       "num_attention_heads": 4, "hidden_act": "quick_gelu",
                       "layer_norm_eps": 1e-5},
        projection_dim=16)
    torch.manual_seed(0)
    hf = transformers.CLIPModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    flat = port_clip_metric(sd)
    npz = tmp_path / "clip_metric.npz"
    np.savez(npz, **flat)
    params = load_inception_params(str(npz))

    ours = CLIPModel(
        CLIPTextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=77, hidden_act="quick_gelu",
                       projection_dim=16),
        CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, hidden_act="quick_gelu",
                         projection_dim=16))

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 99, (2, 77)).astype(np.int64)
    pix = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want_txt = hf.get_text_features(torch.from_numpy(ids)).numpy()
        want_img = hf.get_image_features(torch.from_numpy(pix)).numpy()
    got_txt, got_img = ours.apply(params, jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(pix.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_txt), want_txt,
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_img), want_img,
                               atol=5e-5, rtol=1e-4)
