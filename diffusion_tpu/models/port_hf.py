"""HF -> Flax weight porters (torch/safetensors state_dicts -> our pytrees).

The numerical-parity bridge of SURVEY.md §7 hard-part 1: the reference loads
UNet/VAE/CLIP via `from_pretrained` (reference: diffusion/models/models.py:74-89);
here the same checkpoints are ported tensor-by-tensor into the Flax layouts.
Used by tools/port_weights.py (offline CLI producing msgpack/npz files) and
models/pretrained.py (loading `pretrained=True` models at trainer/inference
init, either from ported msgpack or straight from a safetensors dir).

Layout conversions (torch -> flax/NHWC):
  conv weight  OIHW -> HWIO
  linear weight (out,in) -> (in,out)
  norm weight/bias -> scale/bias
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

__all__ = [
    "load_safetensors_dir", "port_unet", "port_vae", "port_clip_text",
    "port_clip_vision", "port_clip_metric", "port_inception",
]


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    tensors: Dict[str, np.ndarray] = {}
    for name in sorted(os.listdir(path)):
        if name.endswith(".safetensors"):
            tensors.update(load_file(os.path.join(path, name)))
    if not tensors:
        raise FileNotFoundError(f"no .safetensors under {path}")
    return tensors


def _set(tree: Dict, flat_key: str, value: np.ndarray) -> None:
    node = tree
    parts = flat_key.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _lin(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def port_unet(t: Dict[str, np.ndarray]) -> Dict:
    """diffusers UNet2DConditionModel names -> models/unet.py names."""
    out: Dict = {}
    n_blocks = 4

    def attn_inner(src_prefix: str, dst_prefix: str) -> None:
        m = {
            "norm.weight": "norm/scale", "norm.bias": "norm/bias",
            "proj_in.weight": "proj_in/kernel", "proj_in.bias": "proj_in/bias",
            "proj_out.weight": "proj_out/kernel", "proj_out.bias": "proj_out/bias",
        }
        for s, d in m.items():
            w = t[f"{src_prefix}.{s}"]
            if w.ndim == 4:
                w = _conv(w)
            elif w.ndim == 2:
                w = _lin(w)
            _set(out, f"{dst_prefix}/{d}", w)
        depth = 0
        while f"{src_prefix}.transformer_blocks.{depth}.norm1.weight" in t:
            sp = f"{src_prefix}.transformer_blocks.{depth}"
            dp = f"{dst_prefix}/blocks_{depth}"
            for ln in ("norm1", "norm2", "norm3"):
                _set(out, f"{dp}/{ln}/scale", t[f"{sp}.{ln}.weight"])
                _set(out, f"{dp}/{ln}/bias", t[f"{sp}.{ln}.bias"])
            for attn in ("attn1", "attn2"):
                for proj in ("to_q", "to_k", "to_v"):
                    _set(out, f"{dp}/{attn}/{proj}/kernel",
                         _lin(t[f"{sp}.{attn}.{proj}.weight"]))
                _set(out, f"{dp}/{attn}/to_out/kernel",
                     _lin(t[f"{sp}.{attn}.to_out.0.weight"]))
                _set(out, f"{dp}/{attn}/to_out/bias",
                     t[f"{sp}.{attn}.to_out.0.bias"])
            # diffusers GEGLU fuses value+gate in one 2*inner Linear and
            # chunks (hidden, gate); our FeedForwardGEGLU keeps them as two
            # column-parallel Denses (models/layers.py) — split here
            w = _lin(t[f"{sp}.ff.net.0.proj.weight"])
            bias = t[f"{sp}.ff.net.0.proj.bias"]
            inner = w.shape[1] // 2
            _set(out, f"{dp}/ff/proj_in/kernel", w[:, :inner])
            _set(out, f"{dp}/ff/proj_in/bias", bias[:inner])
            _set(out, f"{dp}/ff/proj_gate/kernel", w[:, inner:])
            _set(out, f"{dp}/ff/proj_gate/bias", bias[inner:])
            _set(out, f"{dp}/ff/proj_out/kernel", _lin(t[f"{sp}.ff.net.2.weight"]))
            _set(out, f"{dp}/ff/proj_out/bias", t[f"{sp}.ff.net.2.bias"])
            depth += 1

    def resnet(src_prefix: str, dst_prefix: str) -> None:
        for s, d in (("norm1", "norm1"), ("norm2", "norm2")):
            _set(out, f"{dst_prefix}/{d}/scale", t[f"{src_prefix}.{s}.weight"])
            _set(out, f"{dst_prefix}/{d}/bias", t[f"{src_prefix}.{s}.bias"])
        for s, d in (("conv1", "conv1"), ("conv2", "conv2")):
            _set(out, f"{dst_prefix}/{d}/kernel", _conv(t[f"{src_prefix}.{s}.weight"]))
            _set(out, f"{dst_prefix}/{d}/bias", t[f"{src_prefix}.{s}.bias"])
        if f"{src_prefix}.time_emb_proj.weight" in t:
            _set(out, f"{dst_prefix}/time_emb_proj/kernel",
                 _lin(t[f"{src_prefix}.time_emb_proj.weight"]))
            _set(out, f"{dst_prefix}/time_emb_proj/bias",
                 t[f"{src_prefix}.time_emb_proj.bias"])
        if f"{src_prefix}.conv_shortcut.weight" in t:
            _set(out, f"{dst_prefix}/conv_shortcut/kernel",
                 _conv(t[f"{src_prefix}.conv_shortcut.weight"]))
            _set(out, f"{dst_prefix}/conv_shortcut/bias",
                 t[f"{src_prefix}.conv_shortcut.bias"])

    _set(out, "conv_in/kernel", _conv(t["conv_in.weight"]))
    _set(out, "conv_in/bias", t["conv_in.bias"])
    for i in (1, 2):
        _set(out, f"time_embedding/linear_{i}/kernel",
             _lin(t[f"time_embedding.linear_{i}.weight"]))
        _set(out, f"time_embedding/linear_{i}/bias",
             t[f"time_embedding.linear_{i}.bias"])

    for i in range(n_blocks):
        j = 0
        while f"down_blocks.{i}.resnets.{j}.norm1.weight" in t:
            resnet(f"down_blocks.{i}.resnets.{j}", f"down_{i}_res_{j}")
            if f"down_blocks.{i}.attentions.{j}.norm.weight" in t:
                attn_inner(f"down_blocks.{i}.attentions.{j}", f"down_{i}_attn_{j}")
            j += 1
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in t:
            _set(out, f"down_{i}_downsample/conv/kernel",
                 _conv(t[f"down_blocks.{i}.downsamplers.0.conv.weight"]))
            _set(out, f"down_{i}_downsample/conv/bias",
                 t[f"down_blocks.{i}.downsamplers.0.conv.bias"])

    resnet("mid_block.resnets.0", "mid_res_0")
    attn_inner("mid_block.attentions.0", "mid_attn")
    resnet("mid_block.resnets.1", "mid_res_1")

    for i in range(n_blocks):
        j = 0
        while f"up_blocks.{i}.resnets.{j}.norm1.weight" in t:
            resnet(f"up_blocks.{i}.resnets.{j}", f"up_{i}_res_{j}")
            if f"up_blocks.{i}.attentions.{j}.norm.weight" in t:
                attn_inner(f"up_blocks.{i}.attentions.{j}", f"up_{i}_attn_{j}")
            j += 1
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in t:
            _set(out, f"up_{i}_upsample/conv/kernel",
                 _conv(t[f"up_blocks.{i}.upsamplers.0.conv.weight"]))
            _set(out, f"up_{i}_upsample/conv/bias",
                 t[f"up_blocks.{i}.upsamplers.0.conv.bias"])

    _set(out, "conv_norm_out/scale", t["conv_norm_out.weight"])
    _set(out, "conv_norm_out/bias", t["conv_norm_out.bias"])
    _set(out, "conv_out/kernel", _conv(t["conv_out.weight"]))
    _set(out, "conv_out/bias", t["conv_out.bias"])
    return {"params": out}


def port_vae(t: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}

    def resnet(sp: str, dp: str) -> None:
        for s in ("norm1", "norm2"):
            _set(out, f"{dp}/{s}/scale", t[f"{sp}.{s}.weight"])
            _set(out, f"{dp}/{s}/bias", t[f"{sp}.{s}.bias"])
        for s in ("conv1", "conv2"):
            _set(out, f"{dp}/{s}/kernel", _conv(t[f"{sp}.{s}.weight"]))
            _set(out, f"{dp}/{s}/bias", t[f"{sp}.{s}.bias"])
        if f"{sp}.conv_shortcut.weight" in t:
            _set(out, f"{dp}/conv_shortcut/kernel", _conv(t[f"{sp}.conv_shortcut.weight"]))
            _set(out, f"{dp}/conv_shortcut/bias", t[f"{sp}.conv_shortcut.bias"])

    def vae_attn(sp: str, dp: str) -> None:
        _set(out, f"{dp}/group_norm/scale", t[f"{sp}.group_norm.weight"])
        _set(out, f"{dp}/group_norm/bias", t[f"{sp}.group_norm.bias"])
        for proj in ("to_q", "to_k", "to_v"):
            _set(out, f"{dp}/{proj}/kernel", _lin(t[f"{sp}.{proj}.weight"]))
            _set(out, f"{dp}/{proj}/bias", t[f"{sp}.{proj}.bias"])
        _set(out, f"{dp}/to_out/kernel", _lin(t[f"{sp}.to_out.0.weight"]))
        _set(out, f"{dp}/to_out/bias", t[f"{sp}.to_out.0.bias"])

    for tower in ("encoder", "decoder"):
        _set(out, f"{tower}/conv_in/kernel", _conv(t[f"{tower}.conv_in.weight"]))
        _set(out, f"{tower}/conv_in/bias", t[f"{tower}.conv_in.bias"])
        blocks = "down_blocks" if tower == "encoder" else "up_blocks"
        prefix = "down" if tower == "encoder" else "up"
        i = 0
        while f"{tower}.{blocks}.{i}.resnets.0.norm1.weight" in t:
            j = 0
            while f"{tower}.{blocks}.{i}.resnets.{j}.norm1.weight" in t:
                resnet(f"{tower}.{blocks}.{i}.resnets.{j}",
                       f"{tower}/{prefix}_{i}_res_{j}")
                j += 1
            if f"{tower}.{blocks}.{i}.downsamplers.0.conv.weight" in t:
                _set(out, f"{tower}/{prefix}_{i}_downsample/conv/kernel",
                     _conv(t[f"{tower}.{blocks}.{i}.downsamplers.0.conv.weight"]))
                _set(out, f"{tower}/{prefix}_{i}_downsample/conv/bias",
                     t[f"{tower}.{blocks}.{i}.downsamplers.0.conv.bias"])
            if f"{tower}.{blocks}.{i}.upsamplers.0.conv.weight" in t:
                _set(out, f"{tower}/{prefix}_{i}_upsample/conv/kernel",
                     _conv(t[f"{tower}.{blocks}.{i}.upsamplers.0.conv.weight"]))
                _set(out, f"{tower}/{prefix}_{i}_upsample/conv/bias",
                     t[f"{tower}.{blocks}.{i}.upsamplers.0.conv.bias"])
            i += 1
        resnet(f"{tower}.mid_block.resnets.0", f"{tower}/mid_res_0")
        vae_attn(f"{tower}.mid_block.attentions.0", f"{tower}/mid_attn")
        resnet(f"{tower}.mid_block.resnets.1", f"{tower}/mid_res_1")
        _set(out, f"{tower}/conv_norm_out/scale", t[f"{tower}.conv_norm_out.weight"])
        _set(out, f"{tower}/conv_norm_out/bias", t[f"{tower}.conv_norm_out.bias"])
        _set(out, f"{tower}/conv_out/kernel", _conv(t[f"{tower}.conv_out.weight"]))
        _set(out, f"{tower}/conv_out/bias", t[f"{tower}.conv_out.bias"])

    _set(out, "quant_conv/kernel", _conv(t["quant_conv.weight"]))
    _set(out, "quant_conv/bias", t["quant_conv.bias"])
    _set(out, "post_quant_conv/kernel", _conv(t["post_quant_conv.weight"]))
    _set(out, "post_quant_conv/bias", t["post_quant_conv.bias"])
    return {"params": out}


def port_clip_text(t: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    p = "text_model."
    _set(out, "token_embedding/embedding",
         t[p + "embeddings.token_embedding.weight"])
    _set(out, "position_embedding",
         t[p + "embeddings.position_embedding.weight"])
    _clip_encoder_layers(out, t, p)
    _set(out, "final_layer_norm/scale", t[p + "final_layer_norm.weight"])
    _set(out, "final_layer_norm/bias", t[p + "final_layer_norm.bias"])
    return {"params": out}


def _clip_encoder_layers(out: Dict, t: Dict[str, np.ndarray], p: str) -> None:
    """Shared text/vision transformer stack mapping."""
    i = 0
    while f"{p}encoder.layers.{i}.layer_norm1.weight" in t:
        sp = f"{p}encoder.layers.{i}"
        dp = f"layers_{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            _set(out, f"{dp}/{ln}/scale", t[f"{sp}.{ln}.weight"])
            _set(out, f"{dp}/{ln}/bias", t[f"{sp}.{ln}.bias"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(out, f"{dp}/{proj}/kernel", _lin(t[f"{sp}.self_attn.{proj}.weight"]))
            _set(out, f"{dp}/{proj}/bias", t[f"{sp}.self_attn.{proj}.bias"])
        for fc in ("fc1", "fc2"):
            _set(out, f"{dp}/{fc}/kernel", _lin(t[f"{sp}.mlp.{fc}.weight"]))
            _set(out, f"{dp}/{fc}/bias", t[f"{sp}.mlp.{fc}.bias"])
        i += 1


def port_clip_vision(t: Dict[str, np.ndarray]) -> Dict:
    """transformers CLIPVisionModel names -> models/clip.py CLIPVisionModel.
    (The 'pre_layrnorm' typo is transformers' own key.)"""
    out: Dict = {}
    p = "vision_model."
    _set(out, "class_embedding", t[p + "embeddings.class_embedding"])
    _set(out, "patch_embedding/kernel",
         _conv(t[p + "embeddings.patch_embedding.weight"]))
    _set(out, "position_embedding",
         t[p + "embeddings.position_embedding.weight"])
    for ln_src, ln_dst in (("pre_layrnorm", "pre_layrnorm"),
                           ("post_layernorm", "post_layernorm")):
        _set(out, f"{ln_dst}/scale", t[f"{p}{ln_src}.weight"])
        _set(out, f"{ln_dst}/bias", t[f"{p}{ln_src}.bias"])
    _clip_encoder_layers(out, t, p)
    return {"params": out}


def port_clip_metric(t: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Full transformers CLIPModel (ViT-L/14) state_dict -> flat npz dict for
    the CLIPScore tower (metrics/towers.py clip_embed_fn / models/clip.py
    CLIPModel: text_model + vision_model + both projections; logit_scale is
    dropped — CLIPScore normalizes embeddings itself)."""
    text = port_clip_text(t)["params"]
    vision = port_clip_vision(t)["params"]
    tree = {"params": {
        "text_model": text,
        "vision_model": vision,
        "text_projection": {"kernel": _lin(t["text_projection.weight"])},
        "visual_projection": {"kernel": _lin(t["visual_projection.weight"])},
    }}

    flat: Dict[str, np.ndarray] = {}

    def _walk(node, prefix):
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                _walk(v, path)
            else:
                flat[path] = np.asarray(v)

    _walk(tree, "")
    return flat


def port_inception(t: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision/FID InceptionV3 state_dict -> flat npz dict for
    metrics/towers.py (models/inception.py mirrors torchvision module names,
    so the mapping is purely mechanical). Accepts both torchvision
    `inception_v3` weights and the pt-fid variant (1008-class fc); aux
    classifier tensors are dropped (the FID tower never runs them).

    npz keys: `params/<module>/conv/kernel`, `params/<module>/bn/{scale,bias}`,
    `batch_stats/<module>/bn/{mean,var}`, `params/fc/{kernel,bias}` — the
    exact tree load_inception_params rebuilds."""
    out: Dict[str, np.ndarray] = {}
    for name, w in t.items():
        if name.startswith("AuxLogits") or name.endswith("num_batches_tracked"):
            continue
        if name == "fc.weight":
            out["params/fc/kernel"] = _lin(w)
            continue
        if name == "fc.bias":
            out["params/fc/bias"] = w
            continue
        mod, leaf = name.rsplit(".", 1)
        path = mod.replace(".", "/")            # Mixed_5b.branch1x1.conv -> /
        if path.endswith("/conv") and leaf == "weight":
            out[f"params/{path}/kernel"] = _conv(w)
        elif path.endswith("/bn") and leaf == "weight":
            out[f"params/{path}/scale"] = w
        elif path.endswith("/bn") and leaf == "bias":
            out[f"params/{path}/bias"] = w
        elif path.endswith("/bn") and leaf == "running_mean":
            out[f"batch_stats/{path}/mean"] = w
        elif path.endswith("/bn") and leaf == "running_var":
            out[f"batch_stats/{path}/var"] = w
        else:
            raise KeyError(f"unmapped inception tensor {name}")
    return out


