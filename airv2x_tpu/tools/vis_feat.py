"""Feature-map visualization (debug tool, twin of tools/vis_feat.py).

Runs one forward pass with flax intermediate capture and writes channel-mean
heatmap PNGs of every captured BEV feature map (4-D activations). Useful for
eyeballing encoder/backbone/fusion behavior on a synthetic scene.

Usage:
    python -m airv2x_tpu.tools.vis_feat --hypes_yaml cfg.yaml \\
        --output_dir /tmp/feat_vis [--filter backbone]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="BEV feature-map visualizer")
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--filter", default="",
                   help="only dump features whose path contains this")
    p.add_argument("--max_maps", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _heatmap(path, arr):
    from matplotlib import cm

    from airv2x_tpu.visualization.bev_canvas import CanvasBEV  # noqa: F401

    a = np.abs(np.asarray(arr, np.float32))
    a = a.mean(axis=-1)  # channel mean, NHWC
    while a.ndim > 2:
        a = a[0]
    lo, hi = float(a.min()), float(a.max())
    norm = (a - lo) / (hi - lo + 1e-9)
    img = (cm.viridis(norm)[..., :3] * 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:
        import matplotlib.pyplot as plt

        plt.imsave(path, img)


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.synthetic import make_scene
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout

    hypes = load_yaml(opt.hypes_yaml)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    rng = np.random.default_rng(opt.seed)
    scene, _ = make_scene(
        rng, layout, num_objects=8,
        points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
    )
    batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
    )
    _, state = model.apply(
        variables, batch, train=False, capture_intermediates=True,
        mutable=["intermediates"],
    )

    os.makedirs(opt.output_dir, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    n = 0
    for keypath, value in flat:
        name = "/".join(
            getattr(k, "key", getattr(k, "idx", "?")).__str__()
            for k in keypath
        )
        if opt.filter and opt.filter not in name:
            continue
        v = np.asarray(value)
        if v.ndim < 3:  # only spatial maps
            continue
        fname = name.replace("/", "_").replace("__call__", "out") + ".png"
        _heatmap(os.path.join(opt.output_dir, fname), v)
        print(f"[vis_feat] {fname}  shape={v.shape}")
        n += 1
        if n >= opt.max_maps:
            break
    print(f"[vis_feat] wrote {n} maps to {opt.output_dir}")


if __name__ == "__main__":
    main()
