"""Metric math vs closed forms (SURVEY.md §7 hard-part 6): Frechet distance,
streaming mean/cov, IS, CLIPScore cosine."""

import numpy as np
import pytest

from diffusion_tpu.metrics.base import scale_suffix
from diffusion_tpu.metrics.clip_score import CLIPScore
from diffusion_tpu.metrics.fid import FrechetInceptionDistance, frechet_distance
from diffusion_tpu.metrics.inception_score import InceptionScore
from diffusion_tpu.metrics.mse import MeanSquaredError


def test_scale_suffix():
    assert scale_suffix("FrechetInceptionDistance", 3.0) == \
        "FrechetInceptionDistance-scale-3p0"
    assert scale_suffix("CLIPScore", 7.5) == "CLIPScore-scale-7p5"


def test_mse():
    m = MeanSquaredError()
    m.update(np.array([1.0, 2.0]), np.array([0.0, 0.0]))
    m.update(np.array([3.0]), np.array([0.0]))
    assert abs(m.compute() - (1 + 4 + 9) / 3) < 1e-9
    m.reset()
    m.update(np.array([2.0]), np.array([0.0]), mask=np.array([True]))
    assert m.compute() == 4.0


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=8)
    a = rng.normal(size=(8, 8))
    sigma = a @ a.T + np.eye(8)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_distance_diagonal_closed_form():
    # diagonal Gaussians: FID = |mu1-mu2|^2 + sum(s1 + s2 - 2 sqrt(s1 s2))
    mu1, mu2 = np.array([0.0, 0.0]), np.array([1.0, 2.0])
    s1, s2 = np.diag([1.0, 4.0]), np.diag([9.0, 1.0])
    want = 5.0 + (1 + 9 - 2 * 3) + (4 + 1 - 2 * 2)
    assert abs(frechet_distance(mu1, s1, mu2, s2) - want) < 1e-8


def test_fid_streaming_matches_batch():
    """Streaming sum/outer accumulation reproduces np.mean/np.cov."""
    rng = np.random.default_rng(1)
    real = rng.normal(size=(200, 4)) + 1.0
    fake = rng.normal(size=(150, 4)) * 2.0
    fid = FrechetInceptionDistance(feature_fn=lambda x: x, feature_dim=4)
    for chunk in np.array_split(real, 7):
        fid.update(chunk, real=True)
    for chunk in np.array_split(fake, 5):
        fid.update(chunk, real=False)
    got = fid.compute()
    want = frechet_distance(real.mean(0), np.cov(real, rowvar=False),
                            fake.mean(0), np.cov(fake, rowvar=False))
    assert abs(got - want) < 1e-6


def test_inception_score_uniform_is_one():
    m = InceptionScore(logits_fn=lambda x: x, splits=2)
    logits = np.zeros((64, 10))  # uniform p(y|x) => IS == 1
    m.update(logits=logits)
    assert abs(m.compute() - 1.0) < 1e-6


def test_inception_score_confident_distinct():
    # each sample confidently predicts a distinct class => IS ~= n_classes
    n = 10
    logits = np.eye(n) * 50
    logits = np.tile(logits, (5, 1))
    m = InceptionScore(logits_fn=None, splits=1)
    m.update(logits=logits)
    assert m.compute() > 9.0


def test_clip_score_cosine():
    def embed(images, ids):
        return images, ids  # pretend embeddings
    m = CLIPScore(embed_fn=embed)
    img = np.array([[1.0, 0.0], [1.0, 0.0]])
    txt = np.array([[1.0, 0.0], [0.0, 1.0]])  # cos 1 and cos 0
    m.update(img, txt)
    assert abs(m.compute() - 50.0) < 1e-6


def test_towers_refuse_random_weights(monkeypatch):
    """FID/IS/CLIPScore towers must raise without pretrained weights rather
    than silently computing on random inits (VERDICT r1 #2)."""
    from diffusion_tpu.metrics import towers
    monkeypatch.delenv("DIFFUSION_TPU_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.delenv("DIFFUSION_TPU_CLIP_WEIGHTS", raising=False)
    monkeypatch.delenv("DIFFUSION_TPU_ALLOW_RANDOM_TOWERS", raising=False)
    with pytest.raises(RuntimeError, match="port_weights"):
        towers.inception_feature_fn()
    with pytest.raises(RuntimeError, match="port_weights"):
        towers.inception_logits_fn()
    with pytest.raises(RuntimeError, match="port_weights"):
        towers.clip_embed_fn()
