"""Tensor (Megatron) parallelism end-to-end: the `tp` mesh axis reachable
from the Trainer (and therefore from yaml `trainer.mesh_config: {tp: N}`).

Beyond-reference capability (the reference's only model-parallel story is
torch-FSDP, reference yamls/hydra-yamls/SD-2-base-256.yaml:95-96): here the
attention q/k/v kernels and the GEGLU hidden shard column-parallel over `tp`,
to_out / ff proj_out shard row-parallel (parallel/sharding.py Megatron
table), attention runs head-sharded under shard_map
(ops/attention.py:_tp_dispatch), and the resulting parameter update is
numerically identical to the same step on a tp-less mesh.
"""

import numpy as np
import pytest

import jax
import jax.tree_util as jtu

import diffusion_tpu.ops.attention as attn_mod
from diffusion_tpu.parallel.mesh import create_mesh
from diffusion_tpu.parallel.sharding import param_shardings
from diffusion_tpu.train.optim import adamw
from diffusion_tpu.train.trainer import Trainer
from tests.common import tiny_stable_diffusion

BSZ = 8
SIZE = 32  # latent 4x4 -> 16 spatial tokens in the level-0 self-attention


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.uniform(-1, 1, (BSZ, SIZE, SIZE, 3)).astype(np.float32),
        "captions": rng.integers(0, 500, (BSZ, 77)).astype(np.int32),
    }


def _train_one(mesh, monkeypatch=None):
    calls = []
    if monkeypatch is not None:
        real = attn_mod._tp_dispatch

        def counted(q, k, v, mesh_, axis_name, backend):
            calls.append(q.shape)
            return real(q, k, v, mesh_, axis_name, backend)

        monkeypatch.setattr(attn_mod, "_tp_dispatch", counted)
    tr = Trainer(model=tiny_stable_diffusion(),
                 train_dataloader=[_batch()],
                 optimizers=adamw(lr=1e-3),
                 max_duration="1ba", image_size=SIZE,
                 mesh=mesh, fsdp_config={"min_params": 0})
    tr.fit()
    return tr, calls


def _leaf_specs(shardings, *suffix):
    """All PartitionSpecs whose path ends with the given name suffix."""
    out = []
    for path, s in jtu.tree_leaves_with_path(shardings):
        names = [str(getattr(k, "key", getattr(k, "name", None)))
                 for k in path]
        if names[-len(suffix):] == list(suffix):
            out.append(s.spec)
    return out


@pytest.mark.slow
def test_tp_step_matches_plain(monkeypatch):
    """Head-sharded Megatron step == the identical step on a tp-less mesh:
    tensor parallelism is exact, down to the optimizer update."""
    tr_tp, calls = _train_one(create_mesh(dcn=1, fsdp=2, data=2, tp=2),
                              monkeypatch=monkeypatch)
    assert calls, "head-sharded attention was never dispatched"
    # both UNet attention stages (2 and 4 heads) split over tp=2
    assert {s[2] for s in calls} == {2, 4}

    tr_ref, _ = _train_one(create_mesh(dcn=1, fsdp=2, data=4))
    loss_tp = float(np.asarray(tr_tp.state.loss))
    loss_ref = float(np.asarray(tr_ref.state.loss))
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-6)

    p_tp = jax.tree.leaves(jax.device_get(tr_tp.train_state.params))
    p_ref = jax.tree.leaves(jax.device_get(tr_ref.train_state.params))
    for a, b in zip(p_tp, p_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-5)


def test_param_shardings_follow_megatron_table():
    """Column-parallel kernels carry tp on the output dim, row-parallel on
    the input dim, with fsdp stacked on the free dim; row-parallel biases
    stay tp-replicated (added once, after the allreduce)."""
    mesh = create_mesh(dcn=1, fsdp=2, data=2, tp=2)
    model = tiny_stable_diffusion()
    params, _ = model.init_params(jax.random.key(0), image_size=SIZE)
    sh = param_shardings(params, mesh, shard=True, min_size=0)

    for name in ("to_q", "to_k", "to_v"):
        for spec in _leaf_specs(sh, name, "kernel"):
            assert spec[1] == "tp", (name, spec)
    for spec in _leaf_specs(sh, "to_out", "kernel"):
        assert spec[0] == "tp", spec
    for spec in _leaf_specs(sh, "to_out", "bias"):
        assert "tp" not in jax.tree.leaves(tuple(spec)), spec
    for name in ("proj_in", "proj_gate"):
        for spec in _leaf_specs(sh, "ff", name, "kernel"):
            assert spec[1] == "tp", (name, spec)
    for spec in _leaf_specs(sh, "ff", "proj_out", "kernel"):
        assert spec[0] == "tp", spec
    # Transformer2D's spatial proj_in/proj_out (no `ff` parent) are NOT a
    # Megatron pair — their output feeds the block feature-replicated
    for path, s in jtu.tree_leaves_with_path(sh):
        names = [str(getattr(k, "key", None)) for k in path]
        if (names[-2] in ("proj_in", "proj_out") and names[-1] == "kernel"
                and "ff" not in names):
            assert "tp" not in tuple(s.spec), (names, s.spec)


def test_odd_head_count_gates_attention_tp():
    """SD2's top stage has 5 heads (models/unet.py:45): at tp=2 its q/k/v/
    to_out kernels must stay tp-replicated (a contiguous shard would split
    head 3 mid-features while ops/attention.py refuses to head-shard the
    activations), while the GEGLU pair — no head structure — still shards.
    param_spec's head gate (tp_head_dim) enforces this."""
    from diffusion_tpu.models.unet import UNet2DCondition, UNetConfig
    from diffusion_tpu.parallel.sharding import model_tp_head_dim

    cfg = UNetConfig(in_channels=4, out_channels=4,
                     block_out_channels=(40, 64), layers_per_block=1,
                     block_has_attention=(True, True),
                     attention_head_dim=(5, 8),  # stage 0: 5 heads, odd
                     cross_attention_dim=16, norm_num_groups=8)
    unet = UNet2DCondition(cfg)
    assert cfg.head_dim == (8, 8)
    params = unet.init(jax.random.key(0), np.zeros((1, 8, 8, 4), np.float32),
                       np.zeros((1,), np.int32), np.zeros((1, 5, 16), np.float32))
    mesh = create_mesh(dcn=1, fsdp=1, data=4, tp=2)
    sh = param_shardings(params, mesh, shard=True, min_size=0, tp_head_dim=8)

    def stage_specs(stage, *suffix):
        out = []
        for path, s in jtu.tree_leaves_with_path(sh):
            names = [str(getattr(k, "key", getattr(k, "name", None)))
                     for k in path]
            if names[-len(suffix):] == list(suffix) and any(
                    n.startswith((f"down_{stage}_attn", f"up_{1 - stage}_attn"))
                    or (stage == 1 and n == "mid_attn") for n in names):
                out.append(tuple(s.spec))
        return out

    # 5-head stage: every attention projection replicated over tp
    for name in ("to_q", "to_k", "to_v", "to_out"):
        specs = stage_specs(0, name, "kernel")
        assert specs, name
        for spec in specs:
            assert "tp" not in spec, (name, spec)
    # 8-head stage: head-sharded as usual
    for name in ("to_q", "to_k", "to_v"):
        for spec in stage_specs(1, name, "kernel"):
            assert spec[1] == "tp", (name, spec)
    # GEGLU shards in BOTH stages (inner dims 160/256 divide by 2)
    for stage in (0, 1):
        for name in ("proj_in", "proj_gate"):
            specs = stage_specs(stage, "ff", name, "kernel")
            assert specs, (stage, name)
            for spec in specs:
                assert spec[1] == "tp", (stage, name, spec)

    # model_tp_head_dim reads the uniform width off the adapter's config
    class _M:
        pass
    m = _M()
    m.unet = unet
    assert model_tp_head_dim(m) == 8


def test_tp_bias_shards_despite_min_size():
    """Column-parallel biases pair with tp-sharded kernels: the min_size
    gate (an fsdp economy) must not leave them replicated against their
    sharded outputs."""
    mesh = create_mesh(dcn=1, fsdp=2, data=2, tp=2)
    model = tiny_stable_diffusion()
    params, _ = model.init_params(jax.random.key(0), image_size=SIZE)
    sh = param_shardings(params, mesh, shard=True, min_size=2 ** 16)
    specs = _leaf_specs(sh, "ff", "proj_in", "bias")
    assert specs
    for spec in specs:
        assert spec[0] == "tp", spec


def test_mesh_config_reaches_tp():
    """trainer.mesh_config (the yaml surface) builds the tp mesh."""
    tr = Trainer(model=tiny_stable_diffusion(),
                 train_dataloader=[_batch()],
                 optimizers=adamw(lr=1e-3), max_duration="1ba",
                 image_size=SIZE,
                 mesh_config={"dcn": 1, "fsdp": 2, "data": 2, "tp": 2})
    assert tr.mesh.shape == {"dcn": 1, "fsdp": 2, "data": 2, "sp": 1,
                             "tp": 2}


@pytest.mark.slow
def test_sp_and_tp_compose(monkeypatch):
    """Ring attention over sp with heads sharded over tp on the SAME mesh —
    the 1024px+ regime (tokens and heads both span chips) — stays exact."""
    ring_calls = []
    real_ring = attn_mod._ring_dispatch

    def counted(q, k, v, mesh, axis_name):
        ring_calls.append(q.shape)
        return real_ring(q, k, v, mesh, axis_name)

    monkeypatch.setattr(attn_mod, "_ring_dispatch", counted)
    tr = Trainer(model=tiny_stable_diffusion(),
                 train_dataloader=[_batch()],
                 optimizers=adamw(lr=1e-3),
                 max_duration="1ba", image_size=SIZE,
                 mesh=create_mesh(dcn=1, fsdp=1, data=2, sp=2, tp=2),
                 fsdp_config={"min_params": 0},
                 sequence_parallel_min_seq=16)
    tr.fit()
    assert ring_calls, "ring attention was never dispatched"
    loss = float(np.asarray(tr.state.loss))

    tr_ref, _ = _train_one(create_mesh(dcn=1, fsdp=2, data=4))
    np.testing.assert_allclose(loss, float(np.asarray(tr_ref.state.loss)),
                               rtol=1e-5)
