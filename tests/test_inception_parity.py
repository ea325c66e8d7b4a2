"""FID InceptionV3 tower architecture pinned against a faithful torch
reimplementation (tools/torch_inception.py — pytorch-fid semantics with
torchvision naming), through the same port_inception path real weights use.

Round-2 VERDICT weak #5: the tower fed precomputed features to the metric
goldens, so a branch-order / padding bug would have produced
plausible-but-wrong FID forever. This live test catches exactly that class
(it found the avg-pool count_include_pad mismatch that motivated it).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffusion_tpu.models.inception import InceptionV3, load_inception_params
from diffusion_tpu.models.port_hf import port_inception


@pytest.fixture(scope="module")
def ported(tmp_path_factory):
    from tools.torch_inception import TorchFIDInceptionV3

    torch.manual_seed(0)
    net = TorchFIDInceptionV3().eval()
    # randomize BatchNorm running stats so the bn math is actually pinned
    # (fresh stats are mean=0/var=1, which a broken bn mapping could fake)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    flat = port_inception(sd)
    npz = tmp_path_factory.mktemp("inception") / "inception.npz"
    np.savez(npz, **flat)
    return net, load_inception_params(str(npz))


def test_features_and_logits_match_torch(ported):
    """Full-network parity: image -> 2048-d features and 1008-way logits.

    96x96 input (>=75 keeps every stride-2 stage valid) exercises all
    branches including the border pixels where pool padding semantics bite.
    """
    net, params = ported
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want_feats = net.features(torch.from_numpy(img)).numpy()
        want_logits = net(torch.from_numpy(img)).numpy()

    model = InceptionV3()
    x = jnp.asarray(img.transpose(0, 2, 3, 1))
    got_feats = np.asarray(model.apply(params, x))
    got_logits = np.asarray(model.apply(params, x, return_logits=True))
    np.testing.assert_allclose(got_feats, want_feats, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got_logits, want_logits, atol=2e-4, rtol=1e-3)
