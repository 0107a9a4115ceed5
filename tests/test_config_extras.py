"""--print_config (espnet2 abs_task.py:915 parity) via build_config."""
import pytest

from espnet_tpu.utils.config import build_config


def test_print_config_exits_and_dumps(capsys):
    with pytest.raises(SystemExit):
        build_config(["--print_config", "--lr", "0.1"], defaults={"lr": 0.5, "x": 1})
    out = capsys.readouterr().out
    assert "lr: 0.1" in out and "x: 1" in out


def test_build_config_unchanged_without_flag():
    cfg = build_config(["--lr", "0.1"], defaults={"lr": 0.5})
    assert cfg["lr"] == 0.1
