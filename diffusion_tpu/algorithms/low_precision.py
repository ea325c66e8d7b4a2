"""Low-precision norm "algorithms" — yaml-surface parity with the reference.

The reference applies composer's module-surgery algorithms
`low_precision_groupnorm` / `low_precision_layernorm` to `model.unet`
(reference: diffusion/train.py:86-108, yamls/hydra-yamls/SD-2-base-256.yaml:
7-13) so norms run in fp16 autocast with fp32 params.

On TPU this is the *default* numerical policy of the networks: every
GroupNorm/LayerNorm in models/layers.py keeps fp32 parameters and fp32
statistics while producing outputs in the module compute dtype (bf16). These
algorithm classes exist so the same yaml `algorithms:` block keeps working;
at INIT they validate the policy rather than rewriting modules.
"""

from __future__ import annotations

from diffusion_tpu.train.events import Algorithm, Event

__all__ = ["LowPrecisionGroupNorm", "LowPrecisionLayerNorm"]


class _LowPrecisionNorm(Algorithm):
    def __init__(self, attribute: str = "unet", precision: str = "amp_bf16"):
        self.attribute = attribute
        self.precision = precision

    def match(self, event: Event, state) -> bool:
        return event == Event.INIT

    def apply(self, event: Event, state, logger) -> None:
        # fp16 requested -> bf16 delivered: the TPU-native low precision.
        # Nothing to rewrite: norms already compute fp32 stats and emit the
        # module dtype (see models/layers.py GroupNorm / LayerNorm usage).
        if logger is not None:
            logger.log_hyperparameters({
                f"algorithms/{type(self).__name__}/attribute": self.attribute,
                f"algorithms/{type(self).__name__}/precision": "amp_bf16",
            })


class LowPrecisionGroupNorm(_LowPrecisionNorm):
    pass


class LowPrecisionLayerNorm(_LowPrecisionNorm):
    pass
