"""Weight-porter mechanics: our param tree -> diffusers-style tensors ->
port_unet/port_vae/port_clip_text -> identical tree (names, transposes).

Proves the HF->Flax mapping is a bijection on the real layout without
needing downloaded weights (zero-egress)."""

import numpy as np

import jax
import jax.numpy as jnp

from tools.port_weights import port_clip_text, port_unet, port_vae


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unet_to_torch_name(path):
    """our flat path -> diffusers tensor name + layout tag."""
    parts = path.split("/")
    leaf = parts[-1]
    kind = {"kernel": "weight", "bias": "bias", "scale": "weight"}[leaf]

    def attn_inner(rest):
        # rest like ['norm','scale'] or ['blocks_0','attn1','to_q','kernel']
        if rest[0] in ("norm", "proj_in", "proj_out"):
            return f"{rest[0]}.{kind}"
        d = rest[0].split("_")[1]
        inner = rest[1]
        if inner in ("norm1", "norm2", "norm3"):
            return f"transformer_blocks.{d}.{inner}.{kind}"
        if inner in ("attn1", "attn2"):
            proj = rest[2]
            proj = "to_out.0" if proj == "to_out" else proj
            return f"transformer_blocks.{d}.{inner}.{proj}.{kind}"
        if inner == "ff":
            # proj_in/proj_gate both come from the fused diffusers
            # net.0.proj tensor (value first half, gate second — see
            # port_hf.py); _fuse_geglu concatenates them back below
            sub = {"proj_in": "net.0.proj", "proj_gate": "net.0.proj",
                   "proj_out": "net.2"}[rest[2]]
            return f"transformer_blocks.{d}.ff.{sub}.{kind}"
        raise KeyError(path)

    head = parts[0]
    if head == "conv_in":
        return f"conv_in.{kind}"
    if head == "conv_out":
        return f"conv_out.{kind}"
    if head == "conv_norm_out":
        return f"conv_norm_out.{kind}"
    if head == "time_embedding":
        return f"time_embedding.{parts[1]}.{kind}"
    if head.startswith(("down_", "up_")):
        bits = head.split("_")   # down, i, res/attn/downsample/upsample, j?
        tower = "down_blocks" if bits[0] == "down" else "up_blocks"
        i = bits[1]
        role = bits[2]
        if role == "res":
            return f"{tower}.{i}.resnets.{bits[3]}.{parts[1]}.{kind}"
        if role == "attn":
            return f"{tower}.{i}.attentions.{bits[3]}." + attn_inner(parts[1:])
        if role == "downsample":
            return f"{tower}.{i}.downsamplers.0.conv.{kind}"
        if role == "upsample":
            return f"{tower}.{i}.upsamplers.0.conv.{kind}"
    if head.startswith("mid_res_"):
        return f"mid_block.resnets.{head[-1]}.{parts[1]}.{kind}"
    if head == "mid_attn":
        return "mid_block.attentions.0." + attn_inner(parts[1:])
    raise KeyError(path)


def _to_torch_layout(arr):
    if arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
    if arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


def test_unet_port_roundtrip():
    from tests.common import tiny_stable_diffusion
    model = tiny_stable_diffusion()
    params = model.unet.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                             jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 16)))
    flat = _flatten(params["params"])
    torch_style = {}
    for p, a in flat.items():
        name = _unet_to_torch_name(p)
        if "/ff/proj_in/" in p or "/ff/proj_gate/" in p:
            # fuse value+gate back into diffusers' single 2*inner tensor:
            # torch layout is (out, in), value rows first then gate rows
            half = _to_torch_layout(a)
            pair = torch_style.setdefault(name, [None, None])
            pair[0 if "/proj_in/" in p else 1] = half
            continue
        torch_style[name] = _to_torch_layout(a)
    for name, v in torch_style.items():
        if isinstance(v, list):
            torch_style[name] = np.concatenate(v, axis=0)
    ported = port_unet(torch_style)
    flat_back = _flatten(ported["params"])
    assert set(flat_back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat_back[k], flat[k], err_msg=k)


def _vae_to_torch_name(path):
    parts = path.split("/")
    leaf = {"kernel": "weight", "bias": "bias", "scale": "weight"}[parts[-1]]
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return f"{parts[0]}.{leaf}"
    tower = parts[0]  # encoder/decoder
    head = parts[1]
    blocks = "down_blocks" if tower == "encoder" else "up_blocks"
    if head in ("conv_in", "conv_out", "conv_norm_out"):
        return f"{tower}.{head}.{leaf}"
    if head.startswith("mid_res_"):
        return f"{tower}.mid_block.resnets.{head[-1]}.{parts[2]}.{leaf}"
    if head == "mid_attn":
        sub = parts[2]
        sub = "to_out.0" if sub == "to_out" else sub
        return f"{tower}.mid_block.attentions.0.{sub}.{leaf}"
    bits = head.split("_")  # down/up, i, res/downsample/upsample, j?
    i = bits[1]
    if bits[2] == "res":
        return f"{tower}.{blocks}.{i}.resnets.{bits[3]}.{parts[2]}.{leaf}"
    if bits[2] == "downsample":
        return f"{tower}.{blocks}.{i}.downsamplers.0.conv.{leaf}"
    if bits[2] == "upsample":
        return f"{tower}.{blocks}.{i}.upsamplers.0.conv.{leaf}"
    raise KeyError(path)


def test_vae_port_roundtrip():
    from diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    m = AutoencoderKL(VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                                norm_num_groups=4))
    rng = jax.random.key(0)
    params = m.init(rng, jnp.zeros((1, 16, 16, 3)), rng)
    flat = _flatten(params["params"])
    torch_style = {_vae_to_torch_name(p): _to_torch_layout(a)
                   for p, a in flat.items()}
    ported = port_vae(torch_style)
    flat_back = _flatten(ported["params"])
    assert set(flat_back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat_back[k], flat[k], err_msg=k)


def _clip_to_torch_name(path):
    parts = path.split("/")
    if parts[0] == "token_embedding":
        return "text_model.embeddings.token_embedding.weight"
    if parts[0] == "position_embedding":
        return "text_model.embeddings.position_embedding.weight"
    leaf = {"kernel": "weight", "bias": "bias", "scale": "weight"}[parts[-1]]
    if parts[0] == "final_layer_norm":
        return f"text_model.final_layer_norm.{leaf}"
    i = parts[0].split("_")[1]
    mod = parts[1]
    if mod in ("layer_norm1", "layer_norm2"):
        return f"text_model.encoder.layers.{i}.{mod}.{leaf}"
    if mod in ("q_proj", "k_proj", "v_proj", "out_proj"):
        return f"text_model.encoder.layers.{i}.self_attn.{mod}.{leaf}"
    return f"text_model.encoder.layers.{i}.mlp.{mod}.{leaf}"


def test_clip_text_port_roundtrip():
    from tests.common import TINY_TEXT
    from diffusion_tpu.models.clip import CLIPTextModel
    m = CLIPTextModel(TINY_TEXT)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))
    flat = _flatten(params["params"])
    torch_style = {}
    for p, a in flat.items():
        name = _clip_to_torch_name(p)
        arr = a
        if p.endswith("kernel"):
            arr = np.transpose(a, (1, 0))
        torch_style[name] = arr
    ported = port_clip_text(torch_style)
    flat_back = _flatten(ported["params"])
    assert set(flat_back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat_back[k], flat[k], err_msg=k)


def test_inception_port_roundtrip():
    """Our InceptionV3 tree -> synthetic torchvision-style state_dict ->
    port_inception -> identical tree (names + layouts), loadable by
    load_inception_params and runnable."""
    import os
    import tempfile

    from diffusion_tpu.models.inception import (InceptionV3,
                                                load_inception_params)
    from tools.port_weights import port_inception

    model = InceptionV3()
    variables = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 299, 299, 3))),
        jax.random.key(0))
    flat = _flatten(jax.tree.map(
        lambda s: np.zeros(s.shape, np.float32), variables,
        is_leaf=lambda x: hasattr(x, "shape") and not isinstance(x, dict)))

    rng = np.random.default_rng(0)
    state_dict = {}
    for path, v in flat.items():
        coll, rest = path.split("/", 1)
        mod_path, leaf = rest.rsplit("/", 1)
        mod = mod_path.replace("/", ".")
        val = rng.standard_normal(v.shape).astype(np.float32)
        if coll == "params":
            if leaf == "kernel" and val.ndim == 4:            # HWIO -> OIHW
                state_dict[f"{mod}.weight"] = val.transpose(3, 2, 0, 1)
            elif leaf == "kernel":                            # fc (in,out)
                state_dict[f"{mod}.weight"] = val.transpose(1, 0)
            elif leaf == "scale":
                state_dict[f"{mod}.weight"] = val
            else:
                state_dict[f"{mod}.{leaf}"] = val
        else:  # batch_stats
            name = {"mean": "running_mean", "var": "running_var"}[leaf]
            state_dict[f"{mod}.{name}"] = val
    # porter must drop these silently
    state_dict["AuxLogits.conv0.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    state_dict["Mixed_5b.branch1x1.bn.num_batches_tracked"] = np.zeros((), np.float32)

    ported = port_inception(state_dict)
    assert set(ported) == set(flat), (
        set(ported) ^ set(flat))
    for k in flat:
        assert ported[k].shape == flat[k].shape, k

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "inception.npz")
        np.savez(path, **ported)
        tree = load_inception_params(path)
    feats = model.apply(tree, jnp.zeros((1, 299, 299, 3)))
    assert feats.shape == (1, 2048)
