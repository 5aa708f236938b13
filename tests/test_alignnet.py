"""AlignNet variants, native deformable conv, AutoEncoder compressor.

Twin coverage of sub_modules/feature_alignnet{,_modules}.py + cbam.py,
common_modules/dcn_net.py and common_modules/auto_encoder.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.models.alignnet import (
    AlignNet,
    AutoEncoder,
    DCNNet,
    DeformConv2d,
)


@pytest.mark.parametrize(
    "method,args",
    [
        ("identity", {}),
        ("scaligner", {"num_of_blocks": 2, "num_of_layers": 2, "dim": 16}),
        ("resnet1x1", {"num_of_blocks": 2, "dim": 16}),
        ("resnet3x3", {"num_of_blocks": 1, "dim": 16}),
        ("resnet3x3_deform", {"num_of_blocks": 1, "dim": 16, "deform": True}),
        ("cbam", {"num_of_blocks": 1, "dim": 16}),
        ("convnext", {"num_of_blocks": 1, "dim": 16}),
        ("sdta", {"num_of_blocks": 1, "dim": 16}),
    ],
)
def test_alignnet_variants(method, args):
    core = method.replace("_deform", "")
    net = AlignNet(cfg={"core_method": core, "args": args})
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)),
                    jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    if core != "identity":
        assert float(jnp.abs(out - x).max()) > 0 or core == "convnext"


def test_deform_conv_is_plain_conv_at_init():
    """mmcv zero-inits the offset branch, so at init the deformable conv
    equals a standard conv — preserved by construction."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 8)), jnp.float32)
    dc = DeformConv2d(features=12, kernel=3)
    v = dc.init(jax.random.PRNGKey(0), x)
    out = dc.apply(v, x)

    ref = jax.lax.conv_general_dilated(
        x,
        v["params"]["kernel"],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # non-zero offsets change the output
    v2 = jax.tree.map(lambda a: a, v)
    v2["params"]["offset_conv"]["bias"] = (
        v2["params"]["offset_conv"]["bias"] + 0.75
    )
    out2 = dc.apply(v2, x)
    assert float(jnp.abs(out2 - out).max()) > 1e-3


def test_dcn_net_stack():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
    net = DCNNet(cfg={
        "n_blocks": 2,
        "in_channels": [16, 16],
        "out_channels": [16, 16],
        "kernel_size": [3, 3],
        "stride": [1, 1],
        "padding": [1, 1],
    })
    v = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(v, x)
    assert out.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_autoencoder_shapes():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)
    ae = AutoEncoder(feature_num=32, layer_num=2)
    v = ae.init(jax.random.PRNGKey(0), x, train=False)
    out = ae.apply(v, x, train=False)
    # encoder halves spatial AND channels per level; decoder restores both
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_att_backbone_compression_forward():
    """att_bev_backbone compression>0 inserts AutoEncoder bottlenecks
    (PFA_net / point_pillar_intermediate family)."""
    import copy
    import os

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hypes = load_yaml(os.path.join(repo, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes = copy.deepcopy(hypes)
    hypes["model"]["core_method"] = "PFA_net"
    args = hypes["model"]["args"]
    args["max_cav"] = 3
    args["anchor_number"] = 2
    args["pillar_vfe"] = {
        "use_norm": True, "with_distance": False, "use_absolute_xyz": True,
        "num_filters": [16],
    }
    args["base_bev_backbone"] = {
        "layer_nums": [1, 1], "layer_strides": [2, 2],
        "num_filters": [16, 32], "upsample_strides": [1, 2],
        "num_upsample_filter": [16, 16], "compression": 1,
    }
    args["shrink_header"] = {"use": False}
    model = build_model(hypes)

    rng = np.random.default_rng(4)
    l, n = 3, 256
    pts = rng.uniform(-12, 12, (1, l, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 0, (1, l, n))
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((1, l, n), bool),
        "agent_mask": jnp.asarray([[True, True, False]]),
        "pairwise_t": jnp.broadcast_to(jnp.eye(4), (1, l, 4, 4)),
        "prior_encoding": jnp.zeros((1, l, 3)),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    # setup-list naming: the compressor subtree must exist with params
    assert any(
        "stage_compressors" in "/".join(map(str, path))
        for path, _ in jax.tree_util.tree_flatten_with_path(variables)[0]
    )
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out["psm"])).all()
