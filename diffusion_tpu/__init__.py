"""tpu-diffusion: a TPU-native (JAX/XLA/Pallas/pjit) latent-diffusion training
and serving framework with the capabilities of the reference MosaicML-based
`diffusion` stack (see SURVEY.md)."""

__version__ = "0.1.0"
