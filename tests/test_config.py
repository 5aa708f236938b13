import os

import numpy as np

from airv2x_tpu.config import load_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_CFG = "/root/reference/opencood/hypes_yaml/airv2x/lidar/det/airv2x_intermediate_where2com.yaml"


def test_load_tiny_config():
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    assert hypes["model"]["core_method"] == "airv2x_where2comm"
    a = hypes["postprocess"]["anchor_args"]
    assert a["W"] == 96 and a["H"] == 96 and a["D"] == 1
    assert a["vw"] == 0.4
    gs = hypes["model"]["args"]["vehicle"]["lidar"]["point_pillar_scatter"]["grid_size"]
    np.testing.assert_array_equal(gs, [96, 96, 1])
    assert hypes["train_params"]["max_cav_num"] == 4


def test_load_full_config():
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/airv2x/lidar/det/where2comm.yaml"))
    a = hypes["postprocess"]["anchor_args"]
    assert a["W"] == 704 and a["H"] == 200
    assert hypes["optimizer"]["args"]["eps"] == 1e-10  # float resolver
    assert hypes["train_params"]["max_cav_num"] == 15


def test_load_reference_config_unchanged():
    """The reference's own hypes files must load through our parser."""
    if not os.path.isfile(REFERENCE_CFG):
        import pytest

        pytest.skip("reference not mounted")
    hypes = load_yaml(REFERENCE_CFG)
    a = hypes["postprocess"]["anchor_args"]
    assert a["W"] == 704 and a["H"] == 200 and a["D"] == 1
    gs = hypes["model"]["args"]["vehicle"]["lidar"]["point_pillar_scatter"]["grid_size"]
    np.testing.assert_array_equal(gs, [704, 200, 1])
    # scientific-notation floats parsed as floats
    assert isinstance(hypes["optimizer"]["args"]["eps"], float)


def test_resume_from_model_dir(tmp_path):
    from airv2x_tpu.config import save_yaml

    src = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    save_yaml(src, os.path.join(tmp_path, "config.yaml"))
    resumed = load_yaml(None, model_dir=str(tmp_path))
    assert resumed["name"] == "tiny_where2comm"


def test_all_shipped_configs_load_and_build():
    """Every yaml under hypes_yaml/airv2x must parse through load_yaml and
    build its registered model."""
    import glob

    from airv2x_tpu.models import build_model

    paths = sorted(glob.glob(os.path.join(REPO, "hypes_yaml/airv2x/**/*.yaml"),
                             recursive=True))
    assert len(paths) >= 10, paths
    for p in paths:
        hypes = load_yaml(p)
        model = build_model(hypes)
        assert model is not None, p
