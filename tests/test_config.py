"""Config system tests: YAML loading, validation, fail-fast on stale keys."""

import dataclasses

import pytest

from wavedm_tpu.config import (
    Config,
    ConfigError,
    config_from_dict,
    load_config,
)

RAINDROP_WAVELET = "wavedm_tpu/configs/raindrop_wavelet.yaml"
RAINDROP_PIXEL = "wavedm_tpu/configs/raindrop.yaml"


def test_default_config_validates():
    Config().validate()


def test_load_wavelet_config():
    cfg = load_config(RAINDROP_WAVELET)
    assert cfg.data.wavelet is True
    assert cfg.model.pred_channels == 3
    assert cfg.model.unet_in_channels == 96  # 48*2 + 3 - 3 (models/unet.py:212)
    assert cfg.diffusion.num_diffusion_timesteps == 1000
    assert cfg.optim.lr == pytest.approx(4e-5)


def test_load_pixel_config():
    cfg = load_config(RAINDROP_PIXEL)
    assert cfg.data.wavelet is False
    assert cfg.model.ch_mult == (1, 1, 2, 2, 4, 4)
    assert cfg.model.unet_in_channels == 6  # cond(3) + xt(3), no other channels


def test_unknown_key_fails_fast():
    with pytest.raises(ConfigError, match="unknown key"):
        config_from_dict({"model": {"use_FFT": True}})


def test_unknown_section_fails():
    with pytest.raises(ConfigError, match="unknown config section"):
        config_from_dict({"modell": {}})


def test_invalid_values_fail():
    with pytest.raises(ConfigError):
        config_from_dict({"diffusion": {"beta_schedule": "cosine"}})
    with pytest.raises(ConfigError):
        config_from_dict({"data": {"image_size": 60, "patch_size": 256}})


def test_config_roundtrip_dict():
    cfg = load_config(RAINDROP_WAVELET)
    d = dataclasses.asdict(cfg)
    cfg2 = config_from_dict(
        {k: v for k, v in d.items()})
    assert cfg2 == cfg


def test_cli_overrides():
    cfg = load_config(RAINDROP_WAVELET,
                      ["parallel.compute_dtype=bfloat16",
                       "training.batch_size=2"])
    assert cfg.parallel.compute_dtype == "bfloat16"
    assert cfg.training.batch_size == 2
    with pytest.raises(ConfigError, match="unknown config section"):
        load_config(RAINDROP_WAVELET, ["nope.key=1"])
    with pytest.raises(ConfigError, match="must look like"):
        load_config(RAINDROP_WAVELET, ["badformat"])
    with pytest.raises(ConfigError, match="unknown key"):
        load_config(RAINDROP_WAVELET, ["training.not_a_key=3"])
