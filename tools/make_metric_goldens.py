#!/usr/bin/env python
"""Generate pinned golden values for FID / InceptionScore / CLIPScore.

The reference trusts torchmetrics for these (reference:
diffusion/models/models.py:11-13,61-72; stable_diffusion.py:244-255). This
environment has no torchmetrics, so the goldens are computed here with torch
using torchmetrics' EXACT published algorithms (same formulas, same
estimators, independent code path from diffusion_tpu/metrics/*):

- FID (torchmetrics.image.fid._compute_fid): unbiased covariance;
  fid = |mu1-mu2|^2 + tr(S1) + tr(S2) - 2*sum(sqrt(eigvals(S1 @ S2)).real)
- InceptionScore: softmax probs, torch.chunk into `splits`,
  kl = p * (log p - log mean_p); score_i = exp(mean kl); report mean_i
- CLIPScore: 100 * cosine(img, txt), mean clamped at 0 at compute time

Writes tests/goldens/metrics_golden.npz (inputs + expected values). The
paired test (tests/test_metric_goldens.py) replays the inputs through the
jax/numpy metrics — any behavioral drift from torchmetrics semantics fails.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "metrics_golden.npz")


def fid_reference(real: np.ndarray, fake: np.ndarray) -> float:
    r = torch.as_tensor(real, dtype=torch.float64)
    f = torch.as_tensor(fake, dtype=torch.float64)
    mu1, mu2 = r.mean(0), f.mean(0)
    s1 = torch.cov(r.T)   # unbiased, matching torchmetrics
    s2 = torch.cov(f.T)
    a = (mu1 - mu2).square().sum()
    b = s1.trace() + s2.trace()
    c = torch.linalg.eigvals(s1 @ s2).sqrt().real.sum()
    return float(a + b - 2 * c)


def inception_score_reference(logits: np.ndarray, splits: int = 10) -> float:
    probs = torch.softmax(torch.as_tensor(logits, dtype=torch.float64), -1)
    scores = []
    for chunk in torch.chunk(probs, splits, dim=0):
        marginal = chunk.mean(0, keepdim=True)
        kl = (chunk * (chunk.log() - marginal.log())).sum(-1)
        scores.append(kl.mean().exp())
    return float(torch.stack(scores).mean())


def clip_score_reference(img: np.ndarray, txt: np.ndarray) -> float:
    i = torch.nn.functional.normalize(
        torch.as_tensor(img, dtype=torch.float64), dim=-1)
    t = torch.nn.functional.normalize(
        torch.as_tensor(txt, dtype=torch.float64), dim=-1)
    score = 100.0 * (i * t).sum(-1)
    return float(torch.clamp(score.mean(), min=0.0))


def main() -> None:
    rng = np.random.default_rng(20260816)
    d = 64
    real = rng.standard_normal((100, d))
    fake = 0.9 * rng.standard_normal((100, d)) + 0.3

    logits = rng.standard_normal((100, 10)) * 3.0

    img_emb = rng.standard_normal((32, 16))
    txt_emb = 0.5 * img_emb + 0.5 * rng.standard_normal((32, 16))
    # a second pair with mostly-negative similarity exercises the clamp
    img_neg = rng.standard_normal((8, 16))
    txt_neg = -img_neg + 0.01 * rng.standard_normal((8, 16))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(
        OUT,
        fid_real=real, fid_fake=fake,
        fid_expected=fid_reference(real, fake),
        is_logits=logits, is_splits=10,
        is_expected=inception_score_reference(logits, 10),
        clip_img=img_emb, clip_txt=txt_emb,
        clip_expected=clip_score_reference(img_emb, txt_emb),
        clip_img_neg=img_neg, clip_txt_neg=txt_neg,
        clip_neg_expected=clip_score_reference(img_neg, txt_neg),
    )
    print(f"wrote {OUT}")
    data = np.load(OUT)
    for k in ("fid_expected", "is_expected", "clip_expected",
              "clip_neg_expected"):
        print(f"  {k} = {float(data[k]):.6f}")


if __name__ == "__main__":
    sys.exit(main())
