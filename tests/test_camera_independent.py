"""Independent-library cross-check for the camera trunks.

The camera parity chain (tests/test_camera_parity.py) rests on hand-built
torch twins standing in for the absent efficientnet_pytorch/torchvision
libraries (lss_submodule.py:50-349 wraps them). ``transformers`` — baked
into this image — ships its OWN independently-written EfficientNet port of
the same TF architecture. Loading ONE set of random weights into

  (a) the transformers ``EfficientNetModel`` (genuine third-party code),
  (b) the hand-built ``EfficientNetB0Twin`` (tests/torch_camera_twins.py),
  (c) the flax ``EfficientNetB0Features`` trunk (models/camera/trunks.py)

and matching the reduction_3/4/5 endpoint activations closes the
"twin-vs-real-library divergence would pass silently" gap without network
access: any systematic error shared by (b) and (c) — padding geometry, SE
arithmetic, BN eps, swish, skip placement — would show up against (a).
"""

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def _transformers_b0():
    from transformers import EfficientNetConfig
    from transformers.models.efficientnet.modeling_efficientnet import (
        EfficientNetModel,
    )

    cfg = EfficientNetConfig(
        width_coefficient=1.0,
        depth_coefficient=1.0,
        image_size=224,
        hidden_dim=1280,
        hidden_act="swish",
        batch_norm_eps=1e-3,
    )
    torch.manual_seed(0)
    model = EfficientNetModel(cfg).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    gen = np.random.default_rng(1)
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            c = mod.running_mean.shape[0]
            mod.running_mean.copy_(
                torch.tensor(gen.normal(0, 0.5, c), dtype=torch.float32)
            )
            mod.running_var.copy_(
                torch.tensor(gen.uniform(0.5, 2.0, c), dtype=torch.float32)
            )
            mod.weight.data.copy_(
                torch.tensor(gen.normal(1, 0.2, c), dtype=torch.float32)
            )
            mod.bias.data.copy_(
                torch.tensor(gen.normal(0, 0.2, c), dtype=torch.float32)
            )
    return model


def _to_effpytorch_names(sd: dict) -> dict:
    """transformers EfficientNet state dict -> efficientnet_pytorch naming
    (the naming real LSS checkpoints contain and torch_convert consumes)."""
    out = {}
    ren = {
        "embeddings.convolution": "_conv_stem",
        "embeddings.batchnorm": "_bn0",
        "encoder.top_conv": "_conv_head",
        "encoder.top_bn": "_bn1",
    }
    block_ren = {
        "expansion.expand_conv": "_expand_conv",
        "expansion.expand_bn": "_bn0",
        "depthwise_conv.depthwise_conv": "_depthwise_conv",
        "depthwise_conv.depthwise_norm": "_bn1",
        "squeeze_excite.reduce": "_se_reduce",
        "squeeze_excite.expand": "_se_expand",
        "projection.project_conv": "_project_conv",
        "projection.project_bn": "_bn2",
    }
    for key, val in sd.items():
        if key.endswith("num_batches_tracked") or key.startswith("pooler"):
            continue
        stem, leaf = key.rsplit(".", 1)
        if stem in ren:
            out[f"{ren[stem]}.{leaf}"] = val
            continue
        assert stem.startswith("encoder.blocks."), key
        rest = stem[len("encoder.blocks."):]
        idx, sub = rest.split(".", 1)
        out[f"_blocks.{idx}.{block_ren[sub]}.{leaf}"] = val
    return out


@pytest.fixture(scope="module")
def b0_setup():
    model = _transformers_b0()
    sd = _to_effpytorch_names(model.state_dict())
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        hs = model(
            torch.tensor(x), output_hidden_states=True
        ).hidden_states
    # hidden_states = (stem_out, block0_out, ..., block15_out);
    # reduction_3/4/5 = outputs of blocks 4 / 10 / 15 (the activations the
    # LSS CamEncode consumes, lss_submodule.py:123-153)
    want = {
        "reduction_3": hs[5].numpy(),
        "reduction_4": hs[11].numpy(),
        "reduction_5": hs[16].numpy(),
    }
    assert want["reduction_3"].shape == (2, 40, 8, 12)
    assert want["reduction_4"].shape == (2, 112, 4, 6)
    assert want["reduction_5"].shape == (2, 320, 2, 3)
    return sd, x, want


def test_twin_matches_transformers(b0_setup):
    """Hand-built EfficientNetB0Twin == the genuine transformers port."""
    from tests.torch_camera_twins import EfficientNetB0Twin

    sd, x, want = b0_setup
    twin = EfficientNetB0Twin().eval()
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(m.startswith("_fc.") for m in missing), missing

    with torch.no_grad():
        h = twin._swish(twin._bn0(twin._conv_stem(torch.tensor(x))))
        got = {}
        for i, block in enumerate(twin._blocks):
            h = block(h)
            for red, idx in (("reduction_3", 4), ("reduction_4", 10),
                             ("reduction_5", 15)):
                if i == idx:
                    got[red] = h.numpy()
    for red in want:
        np.testing.assert_allclose(
            got[red], want[red], rtol=1e-4, atol=1e-4,
            err_msg=f"twin vs transformers at {red}",
        )


def test_flax_trunk_matches_transformers(b0_setup):
    """Flax EfficientNetB0Features (converted weights) == transformers."""
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.models.camera.trunks import EfficientNetB0Features
    from airv2x_tpu.utils import torch_convert as tc

    sd, x, want = b0_setup
    mod = EfficientNetB0Features()
    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    var = mod.init(jax.random.PRNGKey(0), xin, False)
    asg = tc.Assigner(var)
    tc.convert_efficientnet_features(tc.TorchState(sd), asg, ())
    assert not asg.skipped, asg.skipped
    r3, r4, r5 = mod.apply(asg.variables, xin, False)
    for red, got in (("reduction_3", r3), ("reduction_4", r4),
                     ("reduction_5", r5)):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(
            got, want[red], rtol=1e-4, atol=1e-4,
            err_msg=f"flax vs transformers at {red}",
        )
