"""Materialize a config with derived parameters to a file
(twin of tools/config_generate.py:1-30).

  python -m airv2x_tpu.tools.config_generate --hypes_yaml <in> --output <out>
"""

from __future__ import annotations

import argparse

from airv2x_tpu.config import load_yaml, save_yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--output", required=True)
    opt = p.parse_args()
    hypes = load_yaml(opt.hypes_yaml)
    save_yaml(hypes, opt.output)
    print(f"derived config written to {opt.output}")


if __name__ == "__main__":
    main()
