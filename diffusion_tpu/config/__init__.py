from diffusion_tpu.config.loader import (apply_overrides, instantiate, load_config,
                                         loads_config, merge, resolve, select, to_yaml)

__all__ = ["apply_overrides", "instantiate", "load_config", "loads_config",
           "merge", "resolve", "select", "to_yaml"]
