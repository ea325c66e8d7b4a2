"""LoRA param-tree utilities: partition, merge, fold.

Low-Rank Adaptation (Hu et al., 2021) for adapter-only finetuning of the
UNet's attention projections — a capability the reference stack gets from
diffusers/peft; here it is native to the param-tree design:

- models/layers.py `Attention` adds sibling `*_lora_a`/`*_lora_b` Dense
  scopes when `UNetConfig.lora_rank > 0`; base kernel paths are unchanged,
  so ported HF checkpoints load as-is.
- `split_lora` partitions a UNet variables tree into (lora, base). With
  `StableDiffusion.train_lora_only`, the base lands in `frozen["unet_base"]`
  (never given to the optimizer — same mechanism that freezes VAE/CLIP) and
  only the adapter tree is trained/checkpointed/EMA'd: a rank-8 SD2 adapter
  is ~3 MB of optimizer surface instead of 3.5 GB.
- `merge_lora` recombines the two for `unet.apply` — pure tree ops, traced
  once under jit, zero runtime cost.
- `fold_lora` bakes W' = W + (alpha/r)·A@B into the base kernels and drops
  the adapter params, producing a tree for a rank-0 UNet of the same
  geometry — zero-overhead serving of a finetuned adapter.

TPU note: LoRA trees fall under parallel/sharding.py's `min_size` floor and
replicate across the mesh; the frozen base replicates too (no gradient, no
optimizer state, so FSDP sharding would only add all-gathers to the step).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import traverse_util

__all__ = ["is_lora_key", "split_lora", "merge_lora", "fold_lora"]


def is_lora_key(path: Tuple[str, ...]) -> bool:
    """True if a flattened param path belongs to a LoRA adapter."""
    return any(seg.endswith("_lora_a") or seg.endswith("_lora_b")
               for seg in path)


def split_lora(variables: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """UNet variables -> (lora_tree, base_tree). Raises if no LoRA params
    exist (a silent empty trainable tree would train nothing)."""
    flat = traverse_util.flatten_dict(variables)
    lora = {k: v for k, v in flat.items() if is_lora_key(k)}
    base = {k: v for k, v in flat.items() if not is_lora_key(k)}
    if not lora:
        raise ValueError(
            "no LoRA params in the UNet tree — build the model with "
            "lora_rank > 0 (UNetConfig.lora_rank / the builder's lora_rank "
            "knob) before train_lora_only")
    return (traverse_util.unflatten_dict(lora),
            traverse_util.unflatten_dict(base))


def merge_lora(base: Dict[str, Any], lora: Dict[str, Any]) -> Dict[str, Any]:
    """Recombine split trees into the full variables dict for unet.apply."""
    flat = dict(traverse_util.flatten_dict(base))
    flat.update(traverse_util.flatten_dict(lora))
    return traverse_util.unflatten_dict(flat)


def fold_lora(variables: Dict[str, Any],
              alpha: Optional[float] = None,
              config: Any = None) -> Dict[str, Any]:
    """Bake every adapter into its base kernel and drop the LoRA params.

    W' = W + (alpha/r)·A@B — exact for Dense projections (LoRA's deployment
    form), so the folded tree applied through a rank-0 UNet reproduces the
    adapter model bit-for-bit up to one extra rounding.

    The scale MUST match what the model trained with (models/layers.py
    Attention._lora). Prefer passing the UNet `config` (or the model's
    `unet.config`) — its `lora_alpha` is the authoritative value; a bare
    `alpha` default of None means "lora_alpha was unset" (scale 1.0), and
    silently folding a half/double-strength adapter is exactly the bug
    that invites. `alpha` and a conflicting `config` raise.
    """
    if config is not None:
        cfg_alpha = getattr(config, "lora_alpha", None)
        if alpha is not None and cfg_alpha is not None \
                and float(alpha) != float(cfg_alpha):
            raise ValueError(
                f"alpha={alpha} conflicts with config.lora_alpha={cfg_alpha}")
        alpha = cfg_alpha if alpha is None else alpha
    flat = dict(traverse_util.flatten_dict(variables))
    folded = dict(flat)
    for key in flat:
        if not (key[-1] == "kernel" and key[-2].endswith("_lora_a")):
            continue
        scope = key[-2][: -len("_lora_a")]
        b_key = key[:-2] + (scope + "_lora_b", "kernel")
        base_key = key[:-2] + (scope, "kernel")
        if b_key not in flat or base_key not in flat:
            raise ValueError(f"incomplete LoRA triplet around {key}")
        a_k, b_k, w = flat[key], flat[b_key], flat[base_key]
        rank = a_k.shape[-1]
        scale = (float(alpha) if alpha is not None else float(rank)) / rank
        delta = (jnp.asarray(a_k, jnp.float32)
                 @ jnp.asarray(b_k, jnp.float32)) * scale
        folded[base_key] = (jnp.asarray(w, jnp.float32)
                            + delta).astype(jnp.asarray(w).dtype)
        del folded[key], folded[b_key]
    return traverse_util.unflatten_dict(folded)
