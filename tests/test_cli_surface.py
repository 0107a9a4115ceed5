"""End-to-end CLI tests for the st/mt/vc/enh/launch tools (reference
analog: test_utils/*.bats CLI integration tests + ci/test_integration.sh
st1/mt1 runs). Tiny models, 1 epoch, synthetic data."""
import os
import subprocess
import sys

import numpy as np
import pytest

from espnet_tpu.data.wav import write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    "JAX_PLATFORMS": "cpu",
}


def run_cli(mod, *args, timeout=600):
    r = subprocess.run(
        [sys.executable, "-m", f"espnet_tpu.bin.{mod}", *map(str, args)],
        env=ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    assert r.returncode == 0, f"{mod} failed:\n{r.stdout}\n{r.stderr}"
    return r


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    (root / "wav").mkdir()
    rng = np.random.RandomState(0)
    words = ["AB", "BA", "ABB", "BAB"]
    files = {
        n: open(root / n, "w")
        for n in ("src_text", "text", "wav.scp", "wav2.scp", "mix.scp",
                  "s1.scp", "s2.scp")
    }
    for i in range(6):
        u, t = f"utt{i}", words[i % 4]
        files["src_text"].write(f"{u} {t}\n")
        files["text"].write(f"{u} {t[::-1]}\n")
        w1 = rng.randn(4000).astype(np.float32) * 0.1
        w2 = rng.randn(4000).astype(np.float32) * 0.1
        for tag, w in [("a", w1), ("b", w2), ("mix", (w1 + w2) / 2)]:
            write_wav(root / "wav" / f"{u}_{tag}.wav", 8000, w)
        files["wav.scp"].write(f"{u} {root}/wav/{u}_a.wav\n")
        files["wav2.scp"].write(f"{u} {root}/wav/{u}_b.wav\n")
        files["mix.scp"].write(f"{u} {root}/wav/{u}_mix.wav\n")
        files["s1.scp"].write(f"{u} {root}/wav/{u}_a.wav\n")
        files["s2.scp"].write(f"{u} {root}/wav/{u}_b.wav\n")
    for f in files.values():
        f.close()
    (root / "tokens.txt").write_text(
        "\n".join(["<blank>", "<unk>", "A", "B", "<space>", "<sos/eos>"])
    )
    return root


TINY_TRF = '{"attention_dim": 32, "attention_heads": 2, "linear_units": 32, "num_blocks": 1}'


@pytest.mark.slow
def test_mt_train_trans(data, tmp_path):
    exp = tmp_path / "mt"
    run_cli(
        "mt_train",
        "--train_data", f"{data}/src_text,src_text,text",
        "--train_data", f"{data}/text,text,text",
        "--valid_data", f"{data}/src_text,src_text,text",
        "--valid_data", f"{data}/text,text,text",
        "--token_list", data / "tokens.txt", "--expdir", exp,
        "--max_epoch", 1, "--batch_size", 3,
        "--encoder_conf", TINY_TRF, "--decoder_conf", TINY_TRF,
    )
    run_cli(
        "mt_trans",
        "--data", f"{data}/src_text,src_text,text", "--text", data / "text",
        "--config", exp / "config.yaml", "--ckpt", exp / "latest.ckpt",
        "--output_dir", exp / "decode", "--beam_size", 2, "--batch_size", 3,
    )
    assert (exp / "decode" / "summary.json").exists()


@pytest.mark.slow
def test_st_train_trans(data, tmp_path):
    exp = tmp_path / "st"
    run_cli(
        "st_train",
        "--train_data", f"{data}/wav.scp,speech,sound",
        "--train_data", f"{data}/text,text,text",
        "--train_data", f"{data}/src_text,src_text,text",
        "--valid_data", f"{data}/wav.scp,speech,sound",
        "--valid_data", f"{data}/text,text,text",
        "--valid_data", f"{data}/src_text,src_text,text",
        "--token_list", data / "tokens.txt", "--expdir", exp,
        "--max_epoch", 1, "--batch_size", 3,
        "--frontend_conf", '{"fs": 8000, "n_fft": 256, "hop_length": 128, "n_mels": 20}',
        "--encoder_conf", TINY_TRF, "--decoder_conf", TINY_TRF,
    )
    run_cli(
        "st_trans",
        "--data", f"{data}/wav.scp,speech,sound", "--text", data / "text",
        "--config", exp / "config.yaml", "--ckpt", exp / "latest.ckpt",
        "--output_dir", exp / "decode", "--beam_size", 2, "--batch_size", 3,
        "--maxlenratio", 0.5,
    )
    assert (exp / "decode" / "summary.json").exists()


@pytest.mark.slow
def test_enh_train_inference(data, tmp_path):
    exp = tmp_path / "enh"
    run_cli(
        "enh_train",
        "--train_data", f"{data}/mix.scp,speech_mix,sound",
        "--train_data", f"{data}/s1.scp,speech_ref1,sound",
        "--train_data", f"{data}/s2.scp,speech_ref2,sound",
        "--valid_data", f"{data}/mix.scp,speech_mix,sound",
        "--valid_data", f"{data}/s1.scp,speech_ref1,sound",
        "--valid_data", f"{data}/s2.scp,speech_ref2,sound",
        "--expdir", exp, "--max_epoch", 1, "--batch_size", 2,
        "--chunk_length", 2000,
        "--separator_conf", '{"n_fft": 256, "hop_length": 128, "units": 16, "layers": 1}',
    )
    run_cli(
        "enh_inference",
        "--data", f"{data}/mix.scp,speech_mix,sound",
        "--config", exp / "config.yaml", "--ckpt", exp / "latest.ckpt",
        "--output_dir", exp / "sep", "--fs", 8000,
    )
    assert (exp / "sep" / "spk1" / "utt0.wav").exists()
    assert (exp / "sep" / "spk2.scp").exists()


@pytest.mark.slow
def test_vc_train_decode(data, tmp_path):
    exp = tmp_path / "vc"
    stats = tmp_path / "vc_stats"
    fc = '{"fs": 8000, "n_fft": 256, "hop_length": 128, "n_mels": 20}'
    vcc = ('{"econv_chans": 16, "blstm_units": 16, "dunits": 32, "dlayers": 1,'
           ' "prenet_units": 16, "postnet_chans": 16, "att_dim": 16}')
    run_cli(
        "vc_train",
        "--train_data", f"{data}/wav.scp,src_speech,sound",
        "--train_data", f"{data}/wav2.scp,speech,sound",
        "--collect_stats", "true", "--stats_dir", stats,
        "--feats_extract_conf", fc, "--expdir", exp,
    )
    run_cli(
        "vc_train",
        "--train_data", f"{data}/wav.scp,src_speech,sound",
        "--train_data", f"{data}/wav2.scp,speech,sound",
        "--valid_data", f"{data}/wav.scp,src_speech,sound",
        "--valid_data", f"{data}/wav2.scp,speech,sound",
        "--expdir", exp, "--stats_dir", stats,
        "--max_epoch", 1, "--batch_size", 2,
        "--feats_extract_conf", fc, "--vc_conf", vcc,
    )
    run_cli(
        "vc_decode",
        "--data", f"{data}/wav.scp,src_speech,sound",
        "--config", exp / "config.yaml", "--ckpt", exp / "latest.ckpt",
        "--output_dir", exp / "decode", "--maxlenratio", 1.0,
        "--griffin_lim_iters", 4,
    )
    assert (exp / "decode" / "utt0.wav").exists()
    assert np.isfinite(np.load(exp / "decode" / "utt0.npy")).all()


def test_launch_local():
    r = subprocess.run(
        [sys.executable, "-m", "espnet_tpu.bin.launch", "--nproc", "2", "--",
         sys.executable, "-c",
         "import os; print('w', os.environ['RANK'], os.environ['WORLD_SIZE'])"],
        env=ENV, capture_output=True, text=True, timeout=60, cwd=REPO,
    )
    assert r.returncode == 0
    assert "w 0 2" in r.stdout and "w 1 2" in r.stdout


def test_feats_utils_pipeline(tmp_path):
    """fbank -> cmvn -> apply-cmvn -> copy round trip (reference:
    utils/compute-fbank-feats.py / compute-cmvn-stats / apply-cmvn)."""
    from espnet_tpu.data.kaldi_io import load_scp_entry, read_scp

    rng = np.random.RandomState(0)
    scp = tmp_path / "wav.scp"
    lines = []
    for i in range(3):
        wav = tmp_path / f"u{i}.wav"
        write_wav(wav, 16000, (rng.randn(16000) * 0.1).astype(np.float32))
        lines.append(f"u{i} {wav}")
    scp.write_text("\n".join(lines) + "\n")

    run_cli("feats_utils", "fbank", "--scp", scp,
            "--out_ark", tmp_path / "f.ark", "--out_scp", tmp_path / "f.scp")
    feats = load_scp_entry(list(read_scp(tmp_path / "f.scp").values())[0])
    assert feats.ndim == 2 and feats.shape[1] == 80

    run_cli("feats_utils", "cmvn", "--scp", tmp_path / "f.scp",
            "--out", tmp_path / "cmvn.ark")
    run_cli("feats_utils", "apply-cmvn", "--scp", tmp_path / "f.scp",
            "--cmvn", tmp_path / "cmvn.ark",
            "--out_ark", tmp_path / "d.ark", "--out_scp", tmp_path / "d.scp")
    normed = np.concatenate(
        [load_scp_entry(rx) for rx in read_scp(tmp_path / "d.scp").values()]
    )
    np.testing.assert_allclose(normed.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(normed.std(0), 1.0, atol=1e-3)

    run_cli("feats_utils", "copy", "--scp", tmp_path / "f.scp",
            "--out_ark", tmp_path / "c.ark", "--out_scp", tmp_path / "c.scp")
    copied = load_scp_entry(list(read_scp(tmp_path / "c.scp").values())[0])
    np.testing.assert_allclose(copied, feats, atol=1e-6)


@pytest.mark.slow
def test_enh_asr_train(data, tmp_path):
    """Joint enhancement+ASR training from bash (reference
    espnet2/tasks/enh_asr.py)."""
    exp = tmp_path / "enh_asr"
    run_cli(
        "enh_asr_train",
        "--train_data", f"{data}/mix.scp,speech_mix,sound",
        "--train_data", f"{data}/s1.scp,speech_ref1,sound",
        "--train_data", f"{data}/s2.scp,speech_ref2,sound",
        "--train_data", f"{data}/src_text,text_spk1,text",
        "--train_data", f"{data}/text,text_spk2,text",
        "--valid_data", f"{data}/mix.scp,speech_mix,sound",
        "--valid_data", f"{data}/s1.scp,speech_ref1,sound",
        "--valid_data", f"{data}/s2.scp,speech_ref2,sound",
        "--valid_data", f"{data}/src_text,text_spk1,text",
        "--valid_data", f"{data}/text,text_spk2,text",
        "--expdir", exp, "--max_epoch", 1, "--batch_size", 2,
        "--token_list", f"{data}/tokens.txt",
        "--separator_conf", '{"n_fft": 256, "hop_length": 128, "units": 8, "layers": 1}',
        "--frontend_conf", '{"n_fft": 256, "hop_length": 128, "n_mels": 8}',
        "--encoder_conf", '{"elayers": 1, "eunits": 8, "eprojs": 8}',
        "--model_conf", '{"ctc_weight": 1.0}',
    )
    assert (exp / "latest.ckpt").exists()
    assert (exp / "config.yaml").exists()


@pytest.mark.slow
def test_template_asr_driver(data, tmp_path):
    """recipes/TEMPLATE/asr.sh end-to-end (tokens → stats → train →
    decode → pack) on the fixture corpus."""
    conf = tmp_path / "train.yaml"
    conf.write_text(
        "frontend: default\n"
        "frontend_conf: {fs: 8000, n_fft: 256, hop_length: 128, n_mels: 10}\n"
        "normalize: global_mvn\n"
        "encoder: rnn\n"
        "encoder_conf: {elayers: 1, eunits: 16, eprojs: 16}\n"
        "decoder: rnn\n"
        "decoder_conf: {dunits: 16, dlayers: 1, att_dim: 8, aconv_chans: 2, aconv_filts: 3}\n"
        "model_conf: {ctc_weight: 0.5}\n"
        "optim: adam\noptim_conf: {lr: 0.005}\n"
        "max_epoch: 2\nbatch_size: 3\nlog_interval: 1000\n"
    )
    dset = tmp_path / "dset"
    dset.mkdir()
    (dset / "wav.scp").write_text((data / "wav.scp").read_text())
    (dset / "text").write_text((data / "src_text").read_text())
    r = subprocess.run(
        ["bash", os.path.join(REPO, "recipes/TEMPLATE/asr.sh"),
         "--stage", "3", "--stop_stage", "8",
         "--train_set", str(dset), "--valid_set", str(dset),
         "--test_sets", str(dset),
         "--asr_config", str(conf),
         "--tokens", str(tmp_path / "tokens.txt"),
         "--expdir", str(tmp_path / "exp"),
         "--beam_size", "3", "--ctc_weight", "0.5"],
        env=ENV, capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert (tmp_path / "exp/asr/decode_dset/summary.json").exists()
    assert (tmp_path / "exp/asr/model.zip").exists()

    # --nj 2 job-array decode must produce identical WER to nj=1
    # (reference egs2/TEMPLATE/asr1/asr.sh:1105-1130)
    import json as _json

    wer1 = _json.loads(
        (tmp_path / "exp/asr/decode_dset/summary.json").read_text()
    )["wer"]
    r2 = subprocess.run(
        ["bash", os.path.join(REPO, "recipes/TEMPLATE/asr.sh"),
         "--stage", "7", "--stop_stage", "7",
         "--train_set", str(dset), "--valid_set", str(dset),
         "--test_sets", str(dset),
         "--asr_config", str(conf),
         "--tokens", str(tmp_path / "tokens.txt"),
         "--expdir", str(tmp_path / "exp"),
         "--beam_size", "3", "--ctc_weight", "0.5", "--nj", "2"],
        env=ENV, capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stdout[-1500:] + r2.stderr[-1500:]
    wer2 = _json.loads(
        (tmp_path / "exp/asr/decode_dset/summary.json").read_text()
    )["wer"]
    assert wer2 == wer1, (wer2, wer1)


@pytest.mark.slow
def test_streaming_recog_cli(data, tmp_path):
    """--streaming_mode window|segment through asr_recog (reference
    --streaming-mode in espnet/bin/asr_recog.py:225)."""
    exp = tmp_path / "asr_stream"
    stats = tmp_path / "stats_stream"
    fc = '{"fs": 8000, "n_fft": 256, "hop_length": 128, "n_mels": 10}'
    run_cli(
        "asr_train",
        "--train_data", f"{data}/wav.scp,speech,sound",
        "--train_data", f"{data}/src_text,text,text",
        "--collect_stats", "true", "--stats_dir", stats,
        "--token_list", f"{data}/tokens.txt",
        "--frontend", "default", "--frontend_conf", fc,
        "--normalize", "global_mvn", "--expdir", exp,
        "--encoder", "rnn",
        "--encoder_conf", '{"elayers": 1, "eunits": 16, "eprojs": 16}',
        "--model_conf", '{"ctc_weight": 1.0}',
    )
    run_cli(
        "asr_train",
        "--train_data", f"{data}/wav.scp,speech,sound",
        "--train_data", f"{data}/src_text,text,text",
        "--valid_data", f"{data}/wav.scp,speech,sound",
        "--valid_data", f"{data}/src_text,text,text",
        "--token_list", f"{data}/tokens.txt",
        "--frontend", "default", "--frontend_conf", fc,
        "--normalize", "global_mvn",
        "--expdir", exp, "--stats_dir", stats,
        "--max_epoch", 1, "--batch_size", 3,
        "--encoder", "rnn",
        "--encoder_conf", '{"elayers": 1, "eunits": 16, "eprojs": 16}',
        "--model_conf", '{"ctc_weight": 1.0}',
    )
    for mode in ("window", "segment"):
        run_cli(
            "asr_recog",
            "--data", f"{data}/wav.scp,speech,sound",
            "--text", f"{data}/src_text",
            "--config", exp / "config.yaml", "--ckpt", exp / "latest.ckpt",
            "--output_dir", exp / f"decode_{mode}",
            "--streaming_mode", mode, "--streaming_chunk", 1500,
        )
        assert (exp / f"decode_{mode}" / "summary.json").exists()
        assert (exp / f"decode_{mode}" / "text").exists()


@pytest.mark.slow
def test_template_tts_driver(data, tmp_path):
    """recipes/TEMPLATE/tts.sh end-to-end (tokens → stats → train →
    synthesis → MCD) on the fixture corpus."""
    conf = tmp_path / "tts.yaml"
    conf.write_text(
        "feats_extract_conf: {fs: 8000, n_fft: 256, hop_length: 128, n_mels: 10}\n"
        "tts_conf: {embed_dim: 8, enc_conv_layers: 1, enc_conv_chans: 8,\n"
        "  enc_blstm_units: 8, dunits: 8, dlayers: 1, prenet_units: 4,\n"
        "  postnet_chans: 4, att_dim: 4, aconv_chans: 2, aconv_filts: 3}\n"
        "optim: adam\noptim_conf: {lr: 0.002}\n"
        "max_epoch: 1\nbatch_size: 3\nlog_interval: 1000\n"
    )
    dset = tmp_path / "dset"
    dset.mkdir()
    (dset / "wav.scp").write_text((data / "wav.scp").read_text())
    (dset / "text").write_text((data / "src_text").read_text())
    r = subprocess.run(
        ["bash", os.path.join(REPO, "recipes/TEMPLATE/tts.sh"),
         "--train_set", str(dset), "--eval_sets", str(dset),
         "--tts_config", str(conf),
         "--tokens", str(tmp_path / "tok.txt"),
         "--expdir", str(tmp_path / "exp")],
        env=ENV, capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert (tmp_path / "exp/synth_dset/mcd.json").exists(), (
        r.stdout[-1500:] + r.stderr[-1500:]
    )


@pytest.mark.slow
def test_template_enh_driver(data, tmp_path):
    """recipes/TEMPLATE/enh.sh end-to-end (train → separate → score)."""
    conf = tmp_path / "enh.yaml"
    conf.write_text(
        "separator: tf_masking\n"
        "separator_conf: {n_fft: 256, hop_length: 128, units: 8, layers: 1}\n"
        "chunk_length: 2000\n"
        "optim: adam\noptim_conf: {lr: 0.002}\n"
        "max_epoch: 1\nbatch_size: 2\nlog_interval: 1000\n"
    )
    dset = tmp_path / "dset"
    dset.mkdir()
    (dset / "wav_mix.scp").write_text((data / "mix.scp").read_text())
    (dset / "wav_spk1.scp").write_text((data / "s1.scp").read_text())
    (dset / "wav_spk2.scp").write_text((data / "s2.scp").read_text())
    r = subprocess.run(
        ["bash", os.path.join(REPO, "recipes/TEMPLATE/enh.sh"),
         "--train_set", str(dset), "--valid_set", str(dset),
         "--test_sets", str(dset),
         "--enh_config", str(conf), "--fs", "8000",
         "--expdir", str(tmp_path / "exp"),
         "--score_args", "--bss_eval"],
        env=ENV, capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert (tmp_path / "exp/score_dset/summary.json").exists()


@pytest.mark.slow
def test_packed_model_and_nbest_decode(data, tmp_path):
    """pack → asr_recog --packed reproduces direct decode; --nbest>1
    writes the result-json convention."""
    exp = tmp_path / "asr_p"
    stats = tmp_path / "stats_p"
    fc = '{"fs": 8000, "n_fft": 256, "hop_length": 128, "n_mels": 10}'
    common = [
        "--train_data", f"{data}/wav.scp,speech,sound",
        "--train_data", f"{data}/src_text,text,text",
        "--token_list", f"{data}/tokens.txt",
        "--frontend", "default", "--frontend_conf", fc,
        "--normalize", "global_mvn",
        "--encoder", "rnn",
        "--encoder_conf", '{"elayers": 1, "eunits": 16, "eprojs": 16}',
        "--decoder", "rnn",
        "--decoder_conf", '{"dunits": 16, "dlayers": 1, "att_dim": 8, "aconv_chans": 2, "aconv_filts": 3}',
    ]
    run_cli("asr_train", *common, "--collect_stats", "true",
            "--stats_dir", stats, "--expdir", exp)
    run_cli("asr_train", *common,
            "--valid_data", f"{data}/wav.scp,speech,sound",
            "--valid_data", f"{data}/src_text,text,text",
            "--expdir", exp, "--stats_dir", stats,
            "--max_epoch", 2, "--batch_size", 3)
    run_cli("pack", "pack", "--files", exp / "config.yaml",
            exp / "latest.ckpt", exp / "feats_stats.npz",
            f"{data}/tokens.txt", "--out", tmp_path / "model.zip")
    # direct decode
    run_cli("asr_recog",
            "--data", f"{data}/wav.scp,speech,sound",
            "--text", f"{data}/src_text",
            "--config", exp / "config.yaml", "--ckpt", exp / "latest.ckpt",
            "--output_dir", exp / "dec_direct", "--beam_size", 3,
            "--ctc_weight", 0.5, "--nbest", 2, "--batch_size", 3)
    # packed decode must produce identical hypotheses
    run_cli("asr_recog",
            "--data", f"{data}/wav.scp,speech,sound",
            "--text", f"{data}/src_text",
            "--packed", tmp_path / "model.zip",
            "--output_dir", exp / "dec_packed", "--beam_size", 3,
            "--ctc_weight", 0.5, "--batch_size", 3)
    direct = (exp / "dec_direct" / "text").read_text()
    packed = (exp / "dec_packed" / "text").read_text()
    assert direct == packed
    import json as _json
    nb = _json.loads((exp / "dec_direct" / "nbest.json").read_text())
    first = next(iter(nb["utts"].values()))
    assert len(first) == 2 and "rec_text" in first[0] and "score" in first[0]
