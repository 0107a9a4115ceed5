"""Kaldi data-dir utilities (reference utils/{validate,fix,subset}_data_dir.sh)
and prefetch close semantics."""
from pathlib import Path

from espnet_tpu.bin.data_utils import fix, subset, validate


def _mk(d: Path, wav, text, utt2spk=None):
    d.mkdir(parents=True, exist_ok=True)
    (d / "wav.scp").write_text("".join(f"{k} {v}\n" for k, v in wav.items()))
    (d / "text").write_text("".join(f"{k} {v}\n" for k, v in text.items()))
    if utt2spk:
        (d / "utt2spk").write_text(
            "".join(f"{k} {v}\n" for k, v in utt2spk.items())
        )


def test_validate_fix_subset(tmp_path):
    d = tmp_path / "data"
    _mk(
        d,
        wav={"u1": "/a.wav", "u2": "/b.wav", "u3": "/c.wav"},
        text={"u1": "HI", "u2": "YO"},  # u3 missing -> inconsistent
        utt2spk={"u1": "s1", "u2": "s2", "u3": "s1"},
    )
    assert validate(str(d)) == 1  # flags the key mismatch
    assert fix(str(d)) == 0
    assert validate(str(d)) == 0  # consistent after fix
    assert (d / "wav.scp").read_text().count("\n") == 2

    out = tmp_path / "sub_first"
    subset(str(d), str(out), first=1)
    assert (out / "wav.scp").read_text() == "u1 /a.wav\n"

    out2 = tmp_path / "sub_spk"
    subset(str(d), str(out2), spk=["s2"])
    assert (out2 / "text").read_text() == "u2 YO\n"


def test_prefetch_close_unblocks_worker():
    import itertools
    import threading
    import time

    from espnet_tpu.data.prefetch import prefetch

    started = threading.Event()

    def gen():
        for i in itertools.count():
            started.set()
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    started.wait(timeout=5)
    it.close()  # abandon mid-iteration: worker must exit promptly
    deadline = time.time() + 5
    while it._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not it._thread.is_alive()


def test_prefetch_context_manager_drains_and_propagates():
    from espnet_tpu.data.prefetch import prefetch

    with prefetch(iter(range(5))) as it:
        assert list(it) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("inner")

    got = []
    try:
        with prefetch(boom()) as it:
            for x in it:
                got.append(x)
        raised = False
    except RuntimeError:
        raised = True
    assert got == [1] and raised
