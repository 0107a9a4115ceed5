"""Data layer tests: kaldi IO round-trip, wav IO, tokenizers, BPE,
batching, dataset+collate (reference test/espnet2/fileio, samplers,
train/test_dataset.py patterns)."""
import numpy as np
import pytest

from espnet_tpu.data.batching import bucket_length, make_batches, pad_batch
from espnet_tpu.data.kaldi_io import (
    ArkScpWriter,
    load_scp_entry,
    read_cmvn_stats,
    read_scp,
    write_cmvn_stats,
)
from espnet_tpu.data.wav import read_wav, write_wav
from espnet_tpu.text.bpe import BPETokenizer
from espnet_tpu.text.tokenizers import (
    CharTokenizer,
    TokenIDConverter,
    WordTokenizer,
    build_token_list,
)
from espnet_tpu.utils.metrics import ErrorCalculator, align_ops, edit_distance


def test_ark_scp_roundtrip(tmp_path):
    mats = {f"utt{i}": np.random.RandomState(i).randn(5 + i, 3).astype(np.float32) for i in range(3)}
    with ArkScpWriter(tmp_path / "feats.ark", tmp_path / "feats.scp") as w:
        for k, v in mats.items():
            w[k] = v
    scp = read_scp(tmp_path / "feats.scp")
    assert list(scp) == list(mats)
    for k in mats:
        got = load_scp_entry(scp[k])
        np.testing.assert_allclose(got, mats[k], rtol=1e-6)


def test_cmvn_stats_roundtrip(tmp_path):
    s = np.random.RandomState(0).randn(20)
    sq = np.abs(np.random.RandomState(1).randn(20))
    write_cmvn_stats(tmp_path / "cmvn.ark", 100.0, s, sq)
    count, s2, sq2 = read_cmvn_stats(tmp_path / "cmvn.ark")
    assert count == 100.0
    np.testing.assert_allclose(s2, s, rtol=1e-6)


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    write_wav(tmp_path / "a.wav", 16000, x)
    rate, y = read_wav(tmp_path / "a.wav")
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_char_tokenizer():
    tok = CharTokenizer()
    t = tok.text2tokens("AB C")
    assert t == ["A", "B", "<space>", "C"]
    assert tok.tokens2text(t) == "AB C"


def test_token_id_converter():
    conv = TokenIDConverter(["<blank>", "<unk>", "A", "B", "<sos/eos>"])
    assert conv.tokens2ids(["A", "B", "Z"]) == [2, 3, 1]
    assert conv.ids2tokens([2, 3]) == ["A", "B"]


def test_build_token_list():
    tl = build_token_list(["AB", "BC"], "char")
    assert tl[0] == "<blank>" and tl[-1] == "<sos/eos>"
    assert "A" in tl and "C" in tl


def test_bpe_roundtrip():
    texts = ["the cat sat on the mat", "the dog sat on the log"] * 10
    bpe = BPETokenizer.train(texts, vocab_size=40)
    toks = bpe.text2tokens("the cat sat")
    assert bpe.tokens2text(toks) == "the cat sat"
    assert len(toks) <= len("the cat sat")


def test_bpe_save_load(tmp_path):
    bpe = BPETokenizer.train(["aa bb aa bb aa"], vocab_size=10)
    bpe.save(tmp_path / "bpe.json")
    bpe2 = BPETokenizer.load(tmp_path / "bpe.json")
    assert bpe2.text2tokens("aa bb") == bpe.text2tokens("aa bb")


def test_bucket_length_monotonic():
    prev = 0
    for n in [1, 10, 33, 64, 100, 500, 5000]:
        b = bucket_length(n)
        assert b >= n and b >= prev
        prev = b


def test_make_batches_modes():
    shapes = {f"u{i}": (10 + i, 20) for i in range(10)}
    b_seq = make_batches(shapes, batch_size=3, mode="seq")
    assert sum(len(b) for b in b_seq) == 10
    b_bin = make_batches(shapes, batch_bins=20 * 40, mode="bin")
    assert all(sum(shapes[k][0] * 20 for k in b) <= 20 * 40 or len(b) == 1 for b in b_bin)
    b1 = make_batches(shapes, batch_size=3, shuffle_seed=1)
    b2 = make_batches(shapes, batch_size=3, shuffle_seed=1)
    assert b1 == b2


def test_pad_batch():
    arrays = [np.ones((5, 2)), np.ones((9, 2))]
    padded, lens = pad_batch(arrays, bucket=True)
    assert padded.shape[1] == 32  # min bucket
    assert list(lens) == [5, 9]
    assert padded[0, 5:].sum() == 0


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance("", "ab") == 2


def test_align_ops():
    c, s, d, i = align_ops(list("kitten"), list("sitting"))
    assert (s, d, i) == (2, 0, 1) and c == 4


def test_error_calculator():
    tl = ["<blank>", "<unk>", "A", "B", "<space>", "<sos/eos>"]
    ec = ErrorCalculator(tl, space_symbol="<space>")
    refs = [[2, 3]]  # "AB"
    hyps = [[2, 2]]  # "AA"
    assert ec.cer(refs, hyps) == 0.5
    assert ec.wer(refs, hyps) == 1.0


def test_chunk_iter_factory(tmp_path):
    from espnet_tpu.data.dataset import ChunkIterFactory, ESPnetDataset
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.data.wav import write_wav

    rng = np.random.RandomState(0)
    scp = {}
    shapes = {}
    for i in range(3):
        n = 2000 + i * 700
        w = rng.randn(n).astype(np.float32) * 0.1
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 8000, w)
        scp[f"u{i}"] = str(p)
        shapes[f"u{i}"] = (n,)
    write_scp(tmp_path / "wav.scp", scp)
    ds = ESPnetDataset([(str(tmp_path / "wav.scp"), "speech_mix", "sound")])
    it = ChunkIterFactory(ds, shapes, chunk_length=1000, batch_size=2)
    batches = list(it(1))
    assert batches
    for b in batches:
        assert b["speech_mix"].shape == (2, 1000)
    # epoch-seeded determinism
    b1 = [b["speech_mix"].sum() for b in it(3)]
    b2 = [b["speech_mix"].sum() for b in it(3)]
    assert b1 == b2


def test_espnet1_data_json_roundtrip(tmp_path):
    from espnet_tpu.data.espnet1_json import (
        Espnet1JsonDataset,
        read_data_json,
        write_data_json,
    )
    from espnet_tpu.data.kaldi_io import ArkScpWriter, read_scp

    rng = np.random.RandomState(0)
    mats = {f"utt{i}": rng.randn(6 + i, 4).astype(np.float32) for i in range(3)}
    with ArkScpWriter(tmp_path / "feats.ark", tmp_path / "feats.scp") as w:
        for k, v in mats.items():
            w[k] = v
    scp = read_scp(tmp_path / "feats.scp")
    tokenids = {k: [1, 2, 3 + i] for i, k in enumerate(mats)}
    shapes = {k: v.shape for k, v in mats.items()}
    write_data_json(
        tmp_path / "data.json", scp, tokenids, shapes, odim=10,
        utt2spk={k: "spkA" for k in mats},
    )
    utts = read_data_json(tmp_path / "data.json")
    assert utts["utt0"]["output"][0]["shape"] == [3, 10]
    assert utts["utt0"]["utt2spk"] == "spkA"

    ds = Espnet1JsonDataset(tmp_path / "data.json")
    assert ds.shapes()["utt1"] == (7, 4)
    sample = ds["utt2"]
    np.testing.assert_allclose(sample["speech"], mats["utt2"], rtol=1e-6)
    np.testing.assert_array_equal(sample["text"], [1, 2, 5])

    # feeds the standard batching machinery
    from espnet_tpu.data.dataset import common_collate

    batch = common_collate([ds[k] for k in ds.keys])
    assert batch["speech"].shape[0] == 3 and "text_lengths" in batch


def test_folded_batch_mode():
    """folded: batch size shrinks with utterance length (reference
    espnet2/samplers/folded_batch_sampler.py:13)."""
    from espnet_tpu.data.batching import make_batches

    shapes = {f"long{i}": (1200,) for i in range(4)}
    shapes.update({f"short{i}": (100,) for i in range(8)})
    batches = make_batches(shapes, batch_size=8, mode="folded", fold_length=400)
    all_ids = [u for b in batches for u in b]
    assert sorted(all_ids) == sorted(shapes)
    by_first = {b[0]: len(b) for b in batches}
    long_sizes = [len(b) for b in batches if b[0].startswith("long")]
    short_sizes = [len(b) for b in batches if b[0].startswith("short")]
    # long utts (1200/400 = 3 folds) → bs 8//3 = 2; short → bs 8
    assert max(long_sizes) <= 3
    assert max(short_sizes) == 8


def test_prefetch_iterator():
    from espnet_tpu.data.prefetch import prefetch

    assert list(prefetch(range(7))) == list(range(7))
    assert list(prefetch(iter([]))) == []

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch(boom())
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        for _ in it:
            pass


def test_filter_by_length():
    """remove_longshortdata.sh / espnet2 filtering-stage parity."""
    from espnet_tpu.data.batching import filter_by_length

    shapes = {f"u{i}": (t,) for i, t in enumerate([5, 50, 500, 5000])}
    kept, n = filter_by_length(shapes, min_frames=10, max_frames=1000)
    assert set(kept) == {"u1", "u2"} and n == 2
    # token bounds on the output side
    out = {"u1": (2,), "u2": (40,)}
    kept2, n2 = filter_by_length(
        kept, out_shapes=out, min_tokens=5, max_tokens=100
    )
    assert set(kept2) == {"u2"} and n2 == 1
    # no bounds → identity
    kept3, n3 = filter_by_length(shapes)
    assert kept3 == shapes and n3 == 0


def test_multiple_iter_factory(tmp_path):
    """Corpus-split iterator: covers every utterance exactly once per
    epoch, split order reshuffles per epoch, fully reproducible."""
    from espnet_tpu.data.dataset import MultipleIterFactory, ESPnetDataset
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.data.wav import write_wav

    rng = np.random.RandomState(1)
    scp, shapes, texts = {}, {}, {}
    for i in range(9):
        n = 800 + 50 * i
        p = tmp_path / f"u{i}.wav"
        write_wav(p, 8000, rng.randn(n).astype(np.float32) * 0.1)
        scp[f"u{i}"] = str(p)
        shapes[f"u{i}"] = (n,)
    write_scp(tmp_path / "wav.scp", scp)
    ds = ESPnetDataset([(str(tmp_path / "wav.scp"), "speech", "sound")])
    it = MultipleIterFactory(ds, shapes, num_splits=3, batch_size=2, seed=5)

    def epoch_lens(ep):
        out = []
        for b in it(ep):
            out.extend(int(x) for x in b["speech_lengths"])
        return out

    lens1 = epoch_lens(1)
    assert sorted(lens1) == sorted(int(s[0]) for s in shapes.values())
    # reproducible
    assert epoch_lens(1) == lens1
    # different epoch → different order (split rotation + batch shuffle)
    assert epoch_lens(2) != lens1


def test_category_grouped_batching():
    """reference batchfy.py:346: utterances with a category label only
    batch with the same label; batches then shuffle together."""
    from espnet_tpu.data.batching import make_batches

    shapes = {f"a{i}": (10 + i,) for i in range(5)}
    shapes.update({f"b{i}": (20 + i,) for i in range(3)})
    cats = {k: k[0] for k in shapes}
    batches = make_batches(
        shapes, batch_size=2, categories=cats, shuffle_seed=0
    )
    for b in batches:
        assert len({cats[k] for k in b}) == 1, b
    got = sorted(k for b in batches for k in b)
    assert got == sorted(shapes)
