"""LoRA adapter finetuning (models/lora.py + layers.py Attention branches).

Beyond the reference (which would reach for diffusers/peft): adapter-only
finetuning native to the param-tree design. Pins: a fresh adapter is exactly
the base model; split/merge round-trips; folding W+=(alpha/r)AB is exact;
training with train_lora_only moves ONLY adapter params and still learns;
builder knobs; misconfiguration fails loudly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from diffusion_tpu.models.lora import fold_lora, is_lora_key, merge_lora
from diffusion_tpu.models.models import stable_diffusion_2, stable_diffusion_tiny
from diffusion_tpu.models.unet import UNet2DCondition


@pytest.fixture(scope="module")
def lora_sd():
    model = stable_diffusion_tiny(lora_rank=4)
    params, frozen = model.init_params(jax.random.key(0), image_size=32)
    return model, params, frozen


def _batch(model, bsz=2, size=32):
    rng = np.random.default_rng(0)
    image = rng.uniform(-1, 1, (bsz, size, size, 3)).astype(np.float32)
    captions = model.tokenizer(["a cute cat"] * bsz)["input_ids"]
    return {"image": jnp.asarray(image), "captions": jnp.asarray(captions)}


def _unet_io(model):
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 4, 4)),
                    jnp.float32)
    t = jnp.asarray([7], jnp.int32)
    ctx = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 77, model.unet.config.cross_attention_dim)), jnp.float32)
    return x, t, ctx


def test_partition_and_roundtrip(lora_sd):
    """train_lora_only: trainable tree is adapters only, base is frozen,
    merge restores the full tree, and the adapter is ~100x smaller."""
    model, params, frozen = lora_sd
    assert model.train_lora_only
    flat_p = traverse_util.flatten_dict(params)
    assert flat_p and all(is_lora_key(k) for k in flat_p)
    flat_b = traverse_util.flatten_dict(frozen["unet_base"])
    assert flat_b and not any(is_lora_key(k) for k in flat_b)

    merged = merge_lora(frozen["unet_base"], params)
    assert (traverse_util.flatten_dict(merged).keys()
            == flat_p.keys() | flat_b.keys())
    n_lora = sum(int(np.prod(v.shape)) for v in flat_p.values())
    n_base = sum(int(np.prod(v.shape)) for v in flat_b.values())
    assert n_lora < n_base / 20


def test_fresh_adapter_is_base_model(lora_sd):
    """B zero-init => the LoRA model's UNet output at init equals the bare
    base tree through a rank-0 module, bit for bit."""
    model, params, frozen = lora_sd
    x, t, ctx = _unet_io(model)
    with_lora = model.unet.apply(model.unet_variables(params, frozen),
                                 x, t, ctx)
    rank0 = UNet2DCondition(
        dataclasses.replace(model.unet.config, lora_rank=0),
        dtype=model.unet.dtype)
    base_only = rank0.apply(frozen["unet_base"], x, t, ctx)
    np.testing.assert_array_equal(np.asarray(with_lora),
                                  np.asarray(base_only))


def test_fold_lora_config_alpha(lora_sd):
    """fold_lora(config=...) reads the authoritative lora_alpha from the
    UNet config (the trained scale), and a conflicting explicit alpha is
    rejected instead of silently mis-scaling the fold."""
    model, params, frozen = lora_sd
    full = model.unet_variables(params, frozen)
    via_cfg = fold_lora(full, config=model.unet.config)
    via_alpha = fold_lora(full, alpha=model.unet.config.lora_alpha)
    jax.tree.map(np.testing.assert_array_equal, via_cfg, via_alpha)
    cfg = dataclasses.replace(model.unet.config, lora_alpha=8.0)
    with pytest.raises(ValueError, match="conflicts"):
        fold_lora(full, alpha=2.0, config=cfg)


def test_fold_lora_exact(lora_sd):
    """With a nonzero adapter, folding W' = W + (alpha/r)AB into the base
    kernels reproduces the adapter model through a rank-0 module."""
    model, params, frozen = lora_sd
    # give the adapter real weight: randomize the zero-init B matrices
    keys = jax.random.split(jax.random.key(3), 64)
    flat = traverse_util.flatten_dict(params)
    flat = {k: (jax.random.normal(keys[i % 64], v.shape, v.dtype) * 0.1
                if k[-2].endswith("_lora_b") else v)
            for i, (k, v) in enumerate(sorted(flat.items()))}
    params = traverse_util.unflatten_dict(flat)

    x, t, ctx = _unet_io(model)
    full = model.unet_variables(params, frozen)
    want = model.unet.apply(full, x, t, ctx)

    folded = fold_lora(full, alpha=model.unet.config.lora_alpha)
    assert not any(is_lora_key(k)
                   for k in traverse_util.flatten_dict(folded))
    rank0 = UNet2DCondition(
        dataclasses.replace(model.unet.config, lora_rank=0),
        dtype=model.unet.dtype)
    got = rank0.apply(folded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # and the adapter actually does something (B != 0 changed the output)
    base = rank0.apply(frozen["unet_base"], x, t, ctx)
    assert np.abs(np.asarray(want) - np.asarray(base)).max() > 0


def test_lora_training_learns_and_touches_only_adapter(lora_sd):
    """SGD on the trainable (adapter) tree reduces the loss; the base tree
    never enters the optimizer by construction."""
    model, params, frozen = lora_sd
    batch = _batch(model)
    rng = jax.random.key(42)

    @jax.jit
    def step(p, r):
        loss, g = jax.value_and_grad(model.loss_fn)(p, frozen, batch, r)
        return jax.tree.map(lambda w, gw: w - 0.1 * gw, p, g), loss

    p, first = params, None
    for _ in range(6):
        p, loss = step(p, rng)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    # something moved, and everything trainable is an adapter param
    moved = jax.tree.map(lambda a, b: bool(np.any(np.asarray(a)
                                                  != np.asarray(b))),
                         params, p)
    assert any(jax.tree.leaves(moved))
    assert all(is_lora_key(k)
               for k in traverse_util.flatten_dict(p))


def test_generate_with_lora(lora_sd):
    model, params, frozen = lora_sd
    prompt_ids = jnp.asarray(model.tokenizer(["a cute cat"])["input_ids"])
    out = model.generate(params, frozen, prompt_ids, height=32, width=32,
                         num_inference_steps=1, seed=0)
    arr = np.asarray(out)
    assert arr.shape == (1, 32, 32, 3) and np.isfinite(arr).all()


def test_builder_knobs():
    m = stable_diffusion_2(lora_rank=8, lora_alpha=16.0)
    assert m.unet.config.lora_rank == 8
    assert m.unet.config.lora_alpha == 16.0
    assert m.train_lora_only
    assert stable_diffusion_2().unet.config.lora_rank == 0
    assert not stable_diffusion_2().train_lora_only
    assert not stable_diffusion_tiny(lora_rank=4,
                                     train_lora_only=False).train_lora_only


def test_train_lora_only_without_rank_fails_loudly():
    model = stable_diffusion_tiny(lora_rank=0, train_lora_only=True)
    with pytest.raises(ValueError, match="lora_rank"):
        model.init_params(jax.random.key(0), image_size=32)
