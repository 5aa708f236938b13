from __future__ import annotations

from typing import Callable

MODEL_REGISTRY: dict[str, Callable] = {}


def register_model(*names: str):
    def deco(cls):
        for n in names:
            MODEL_REGISTRY[n] = cls
        return cls

    return deco


def build_model(hypes: dict):
    """Instantiate the flax model named by ``hypes['model']['core_method']``.

    The model args additionally carry the preprocess/postprocess sections so
    the on-device voxelization + decode pipeline is self-contained.
    """
    import jax.numpy as jnp

    name = hypes["model"]["core_method"]
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {sorted(MODEL_REGISTRY)}")
    args = dict(hypes["model"]["args"])
    args.setdefault("preprocess", hypes.get("preprocess"))
    args.setdefault("postprocess", hypes.get("postprocess"))
    dtype = {"float32": jnp.float32, "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}[
        str(args.get("dtype", "float32"))
    ]
    return MODEL_REGISTRY[name](args=args, dtype=dtype)
