"""CLI: ST / MT translation decoding (reference: espnet/bin/st_trans.py,
mt_trans.py → espnet/st/pytorch_backend/st.py trans()).

Beam-searches the attention decoder over encoded source (speech for ST,
source text for MT), writes hypotheses and corpus BLEU.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np


def run_translate(args, task: str):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.asr_inference import transformer_decoder_cached_scorer
    from espnet_tpu.data.dataset import (
        CommonPreprocessor,
        ESPnetDataset,
        common_collate,
    )
    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.search.beam_search import BeamSearch
    from espnet_tpu.tasks.st_mt import build_model_from_file
    from espnet_tpu.text.tokenizers import TokenIDConverter, build_tokenizer
    from espnet_tpu.utils.metrics import bleu

    model, variables, token_list, src_token_list, model_task = (
        build_model_from_file(args.config, args.ckpt)
    )
    if model_task != task:
        raise ValueError(f"model was trained for {model_task}, CLI is {task}")
    vocab = len(token_list)
    sos = eos = vocab - 1
    dec_vars = {"params": variables["params"]["decoder"]}
    scorers = {
        "decoder": transformer_decoder_cached_scorer(model.decoder, dec_vars, 1.0)
    }
    beam = BeamSearch(
        scorers,
        vocab_size=vocab,
        sos=sos,
        eos=eos,
        beam_size=args.beam_size,
        ctc_weight=0.0,
        length_bonus=args.penalty,
    )
    # weights as jit ARGUMENTS, not closure constants (see
    # asr_inference.py: captured params serialize into the compile
    # payload — compile-time bloat, remote-tunnel hard limit at scale)
    scorer_params = {"decoder": dec_vars}
    search = jax.jit(
        lambda sp, h, hl, maxlen, minlen: beam(
            h, hl, maxlen=maxlen, minlen=minlen, scorer_params=sp
        ),
        static_argnames=("maxlen", "minlen"),
    )
    encode = jax.jit(
        lambda v, x, lens: model.apply(v, x, lens, method="encode")
    )

    pre = None
    if task == "mt":
        tok = build_tokenizer(args.token_type)
        conv = TokenIDConverter(src_token_list)
        pre = CommonPreprocessor(tok, conv, text_names=("src_text",))
    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data, preprocessor=pre)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    space = "<space>"
    hyps = {}
    keys = ds.keys
    for i in range(0, len(keys), args.batch_size):
        kb = keys[i : i + args.batch_size]
        batch = common_collate([ds[k] for k in kb])
        if task == "st":
            x, lens = batch["speech"], batch["speech_lengths"]
        else:
            x, lens = batch["src_text"], batch["src_text_lengths"]
        hs, hlens = encode(variables, jnp.asarray(x), jnp.asarray(lens))
        t_src = int(np.asarray(hlens).max())
        maxlen = max(int(args.maxlenratio * t_src), 2)
        yseq, ylen, scores = search(
            scorer_params, hs, hlens, maxlen, int(args.minlenratio * t_src)
        )
        yseq, ylen = np.asarray(yseq), np.asarray(ylen)
        for b, k in enumerate(kb):
            ids = [int(t) for t in yseq[b, 0, 1 : ylen[b, 0] - 1]]
            toks = [token_list[t] for t in ids if 0 <= t < vocab]
            text = "".join(" " if t == space else t for t in toks)
            if any("▁" in t for t in toks):
                text = "".join(toks).replace("▁", " ").strip()
            hyps[k] = text
            logging.info("%s: %s", k, text)

    with open(out / "text", "w") as f:
        for k, v in hyps.items():
            f.write(f"{k} {v}\n")

    if args.text:
        refs = read_scp(args.text)
        if args.bleu_tok == "13a":
            from espnet_tpu.utils.metrics import tokenize_13a as _tok
        else:
            _tok = str.split
        pairs = [(_tok(refs[k]), _tok(hyps[k])) for k in hyps if k in refs]
        score = bleu([r for r, _ in pairs], [h for _, h in pairs])
        summary = {"bleu": score, "num_utts": len(pairs)}
        (out / "summary.json").write_text(json.dumps(summary))
        logging.info("BLEU=%.2f", score)
        return summary


def main(argv=None, task="st"):
    from espnet_tpu.utils.env import apply_jax_platform_env

    apply_jax_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", action="append", default=[],
                        help="path,name,type (speech for st; src_text for mt)")
    parser.add_argument("--text", default=None, help="reference target text")
    parser.add_argument("--bleu_tok", default="none", choices=["none", "13a"],
                        help="BLEU tokenization: none (pre-tokenized) or moses/mteval-13a")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--beam_size", type=int, default=10)
    parser.add_argument("--penalty", type=float, default=0.0)
    parser.add_argument("--maxlenratio", type=float, default=1.5)
    parser.add_argument("--minlenratio", type=float, default=0.0)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--token_type", default="char")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    return run_translate(args, task)


if __name__ == "__main__":
    main()
