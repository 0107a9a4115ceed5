"""Parameter init / transfer learning (train/init_params.py).

Reference parity targets: espnet2/torch_utils/initialize.py,
load_pretrained_model.py (--init_param), espnet asr_init.py
(--enc-init/--dec-init), initialization.py set_forget_bias_to_one.
"""
import pickle

import numpy as np
import pytest

from espnet_tpu.train.init_params import (
    apply_param_init,
    initialize,
    load_init_params,
    model_summary,
    set_forget_bias_to_one,
)


def _toy_params():
    rng = np.random.RandomState(0)
    return {
        "encoder": {
            "dense": {"kernel": rng.randn(8, 16).astype(np.float32),
                      "bias": rng.randn(16).astype(np.float32)},
            "norm": {"scale": rng.randn(16).astype(np.float32),
                     "bias": rng.randn(16).astype(np.float32)},
            "lstm": {"hf": {"bias": np.zeros(4, np.float32)},
                     "if": {"kernel": rng.randn(4, 4).astype(np.float32),
                            "bias": np.zeros(4, np.float32)}},
        },
        "decoder": {
            "out": {"kernel": rng.randn(16, 32).astype(np.float32),
                    "bias": rng.randn(32).astype(np.float32)},
        },
    }


def test_initialize_schemes():
    p = _toy_params()
    for scheme in (
        "xavier_uniform", "xavier_normal", "kaiming_uniform",
        "kaiming_normal", "chainer",
    ):
        q = initialize(p, scheme, seed=1)
        k = q["encoder"]["dense"]["kernel"]
        assert k.shape == (8, 16) and k.std() > 0
        assert not np.allclose(k, p["encoder"]["dense"]["kernel"])
        # biases zeroed, norm scale -> 1
        assert np.allclose(q["decoder"]["out"]["bias"], 0)
        assert np.allclose(q["encoder"]["norm"]["scale"], 1)
    with pytest.raises(ValueError):
        initialize(p, "nope")


def test_chainer_init_statistics_and_forget_bias():
    p = _toy_params()
    q = initialize(p, "chainer", seed=0)
    k = q["decoder"]["out"]["kernel"]  # fan_in 16 -> std 0.25
    assert abs(float(k.std()) - 0.25) < 0.05
    # forget-gate biases set to one
    assert np.allclose(q["encoder"]["lstm"]["hf"]["bias"], 1)
    assert np.allclose(q["encoder"]["lstm"]["if"]["bias"], 1)
    # non-forget biases stay zero
    assert np.allclose(q["encoder"]["dense"]["bias"], 0)


def test_set_forget_bias_standalone():
    p = _toy_params()
    set_forget_bias_to_one(p)
    assert np.allclose(p["encoder"]["lstm"]["hf"]["bias"], 1)


def test_load_init_params_full_and_subtree(tmp_path):
    src = _toy_params()
    ckpt = tmp_path / "pre.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump(src, f)

    dst = initialize(_toy_params(), "xavier_uniform", seed=3)
    # full graft
    out, moved = load_init_params(dst, str(ckpt))
    assert np.allclose(
        out["encoder"]["dense"]["kernel"], src["encoder"]["dense"]["kernel"]
    )
    assert len(moved) == len([1 for _ in _flatten_paths(src)])

    # encoder-only graft into the encoder subtree (≙ --enc-init)
    dst2 = initialize(_toy_params(), "xavier_uniform", seed=4)
    out2, moved2 = load_init_params(dst2, f"{ckpt}:encoder:encoder")
    assert np.allclose(
        out2["encoder"]["dense"]["kernel"], src["encoder"]["dense"]["kernel"]
    )
    assert not np.allclose(
        out2["decoder"]["out"]["kernel"], src["decoder"]["out"]["kernel"]
    )

    # exclusion: skip the lstm under encoder
    dst3 = initialize(_toy_params(), "xavier_uniform", seed=5)
    out3, moved3 = load_init_params(dst3, f"{ckpt}:encoder:encoder:lstm")
    assert not any(p.startswith("lstm") for p in moved3)
    assert np.allclose(
        out3["encoder"]["norm"]["scale"], src["encoder"]["norm"]["scale"]
    )


def test_load_init_params_shape_mismatch_skipped(tmp_path):
    src = _toy_params()
    src["decoder"]["out"]["kernel"] = np.zeros((3, 3), np.float32)
    ckpt = tmp_path / "pre.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump(src, f)
    dst = _toy_params()
    before = dst["decoder"]["out"]["kernel"].copy()
    out, moved = load_init_params(dst, str(ckpt))
    assert np.allclose(out["decoder"]["out"]["kernel"], before)
    assert "decoder/out/kernel" not in moved


def test_load_init_params_from_train_state_ckpt(tmp_path):
    src = _toy_params()
    ckpt = tmp_path / "state.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump({"params": src, "opt_state": {}, "step": 7}, f)
    out, moved = load_init_params(_toy_params(), str(ckpt))
    assert np.allclose(
        out["encoder"]["dense"]["kernel"], src["encoder"]["dense"]["kernel"]
    )


def test_apply_param_init_config_hook(tmp_path):
    src = _toy_params()
    ckpt = tmp_path / "pre.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump(src, f)
    variables = {"params": _toy_params()}
    out = apply_param_init(
        variables, {"init": "chainer", "init_param": f"{ckpt}:encoder:encoder"}
    )
    assert np.allclose(
        out["params"]["encoder"]["dense"]["kernel"],
        src["encoder"]["dense"]["kernel"],
    )
    # decoder got the chainer re-init (bias zeroed)
    assert np.allclose(out["params"]["decoder"]["out"]["bias"], 0)
    # no-op path returns variables untouched
    same = apply_param_init(variables, {})
    assert same is variables


def test_model_summary():
    s = model_summary(_toy_params())
    assert "Total parameters" in s and "encoder" in s and "decoder" in s
    n = 8 * 16 + 16 + 16 + 16 + 4 + 4 * 4 + 4 + 16 * 32 + 32
    assert f"{n:,}" in s


def _flatten_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_paths(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1]
