"""Config schema tests: YAML load, validation, unknown keys, modify overlay."""

import warnings

import pytest

from denoising_diffusion_deep_fake_tpu.config import (
    BalanceConfig,
    DeepFakeConfig,
    DenoiserConfig,
    config_from_dict,
    config_to_dict,
    load_config,
    overlay_config,
)

REF_DENOISE_YAML = """
mode: "denoise"
batch_size: 14
learning_rate: 0.01
adam_b1: 0.5
adam_b2: 0.999
max_epochs: 50
cosine_scheduler_max_epoch: 50
num_workers: 8
encoder_name: "resnet34"
noise_exponential_sampling_lambda: 3
data_path_a: "/data/a/images.txt"
data_path_b: "/data/b/images.txt"
mean_a: [0.5,0.5,0.5]
std_a: [0.5,0.5,0.5]
mean_b: [0.5,0.5,0.5]
std_b: [0.5,0.5,0.5]
"""


def test_reference_yaml_loads_unchanged(tmp_path):
    p = tmp_path / "denoise.yml"
    p.write_text(REF_DENOISE_YAML)
    cfg = load_config(DeepFakeConfig, p)
    assert cfg.mode == "denoise"
    assert cfg.batch_size == 14
    assert cfg.adam_b1 == 0.5
    assert cfg.mean_a == (0.5, 0.5, 0.5)
    assert cfg.cosine_t_max == 50
    assert cfg.noise_exponential_sampling_lambda == 3


def test_unknown_key_warns_not_silently_passes():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        config_from_dict(DenoiserConfig,
                         {"input_image_list_path": "x.txt", "tpyo_key": 1})
    assert any("tpyo_key" in str(x.message) for x in w)


def test_validation_catches_bad_values():
    with pytest.raises(ValueError, match="mode"):
        config_from_dict(DeepFakeConfig, {
            "mode": "dneoise", "data_path_a": "a", "data_path_b": "b"})
    with pytest.raises(ValueError, match="batch_size"):
        config_from_dict(BalanceConfig, {"data_path": "d", "batch_size": 0})
    with pytest.raises(ValueError, match="ratio_of_noise"):
        config_from_dict(BalanceConfig, {"data_path": "d",
                                         "ratio_of_noise": 1.5})
    with pytest.raises(ValueError, match="data_parallel"):
        config_from_dict(DenoiserConfig, {
            "input_image_list_path": "x", "batch_size": 9, "data_parallel": 2})


def test_modify_overlay_semantics():
    # Reference swap_config.yml omits data paths; they persist from the
    # checkpoint hparams (SURVEY.md §3.5).
    base = config_to_dict(config_from_dict(DeepFakeConfig, {
        "mode": "denoise", "data_path_a": "/a.txt", "data_path_b": "/b.txt",
        "noise_exponential_sampling_lambda": 3}))
    swap_overrides = {"mode": "swap", "noise_exponential_sampling_lambda": 8,
                      "ema_beta": 0.9999, "ema_update_every": 1}
    merged = overlay_config(DeepFakeConfig, base, swap_overrides)
    assert merged.mode == "swap"
    assert merged.data_path_a == "/a.txt"          # kept from checkpoint
    assert merged.noise_exponential_sampling_lambda == 8   # overridden


def test_round_trip_dict():
    cfg = config_from_dict(BalanceConfig, {"data_path": "d.txt"})
    d = config_to_dict(cfg)
    cfg2 = config_from_dict(BalanceConfig, d)
    assert cfg == cfg2


def test_matmul_precision_knob():
    """auto resolves per compute_dtype; explicit values pass through;
    unknown values rejected (round-3 TPU-precision finding)."""
    import pytest

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)

    base = dict(input_image_list_path="x", log_dir="/tmp/r",
                checkpoint_dir="/tmp/c")
    bf16 = config_from_dict(DenoiserConfig, base, validate=False)
    assert bf16.resolved_matmul_precision() is None
    fp32 = config_from_dict(DenoiserConfig,
                            dict(base, compute_dtype="float32"),
                            validate=False)
    assert fp32.resolved_matmul_precision() == "highest"
    expl = config_from_dict(DenoiserConfig,
                            dict(base, matmul_precision="high"),
                            validate=False)
    assert expl.resolved_matmul_precision() == "high"
    off = config_from_dict(DenoiserConfig,
                           dict(base, compute_dtype="float32",
                                matmul_precision="default"), validate=False)
    assert off.resolved_matmul_precision() is None
    with pytest.raises(ValueError, match="matmul_precision"):
        config_from_dict(DenoiserConfig,
                         dict(base, matmul_precision="bf16")).validate()
