#!/usr/bin/env python
"""CLI entry: `python run.py --config-path yamls --config-name SD-2-base-256.yaml
[dotted.overrides=...]` (reference run.py:14-22 hydra wrapper — errors when no
config is given; overrides use the same key=value syntax)."""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="tpu-diffusion training entry")
    parser.add_argument("--config-path", required=False, help="config directory")
    parser.add_argument("--config-name", required=False, help="config yaml name")
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args()

    if not args.config_path or not args.config_name:
        raise ValueError("Please specify --config-path and --config-name "
                         "(reference parity: run.py requires an explicit config)")

    import os
    from diffusion_tpu.config import load_config
    from diffusion_tpu.train.train import train

    name = args.config_name
    if not name.endswith((".yaml", ".yml")):
        name += ".yaml"
    config = load_config(os.path.join(args.config_path, name), args.overrides)
    train(config)


if __name__ == "__main__":
    main()
