"""Dynamic-import plugin mechanism.

Reference parity: espnet/utils/dynamic_import.py + the `--model-module`
extension point (espnet/asr/pytorch_backend/asr.py:439-442) — a config
may name any importable class, not just a registry key.
"""
import numpy as np
import pytest

from espnet_tpu.utils.dynamic_import import dynamic_import, resolve_class


def test_dynamic_import_colon_and_dotted():
    assert dynamic_import("collections:OrderedDict") is __import__("collections").OrderedDict
    assert dynamic_import("collections.OrderedDict") is __import__("collections").OrderedDict


def test_dynamic_import_alias():
    alias = {"od": "collections:OrderedDict"}
    assert dynamic_import("od", alias) is __import__("collections").OrderedDict


def test_dynamic_import_errors():
    with pytest.raises(ImportError):
        dynamic_import("notamodule")  # bare name, not in registry
    with pytest.raises(ImportError):
        dynamic_import("collections:NoSuchAttr")


def test_resolve_class_registry_wins():
    reg = {"collections.OrderedDict": dict}  # registry key shadows import path
    assert resolve_class("collections.OrderedDict", reg) is dict
    assert resolve_class("collections:OrderedDict", reg) is __import__("collections").OrderedDict


def test_build_model_with_plugin_encoder():
    """An encoder named by import path builds and runs like a registry one."""
    from espnet_tpu.tasks.asr import build_model

    config = {
        "input_size": 8,
        "encoder": "espnet_tpu.models.asr:TransformerEncoder",
        "encoder_conf": {"attention_dim": 16, "attention_heads": 2,
                         "linear_units": 16, "num_blocks": 1},
        "decoder": "transformer",
        "decoder_conf": {"attention_dim": 16, "attention_heads": 2,
                         "linear_units": 16, "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
    }
    model = build_model(config, vocab_size=11)
    import jax

    x = np.random.RandomState(0).randn(2, 20, 8).astype(np.float32)
    xlen = np.array([20, 15], dtype=np.int32)
    y = np.array([[1, 2, 3, -1], [4, 5, -1, -1]], dtype=np.int32)
    ylen = np.array([3, 2], dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), x, xlen, y, ylen, deterministic=True)
    loss, stats = model.apply(params, x, xlen, y, ylen, deterministic=True)
    assert np.isfinite(float(loss))
