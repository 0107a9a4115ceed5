"""CLI: tokenize text / build vocabularies (reference:
espnet2/bin/tokenize_text.py).

Two modes:
  default            — read `--input` (`-` = stdin; kaldi-style text with
                       `--field 2-` to skip utt-ids), tokenize each line
                       (char/word/bpe), write tokens to `--output`.
  --write_vocabulary — count tokens, apply `--cutoff`/`--vocabulary_size`,
                       and write one token per line with `--add_symbol`
                       entries spliced in at their requested positions
                       (e.g. "<blank>:0", "<unk>:1", "<sos/eos>:-1").
"""
from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path


def field2slice(field: str):
    """'2-' → tokens[1:], '2-3' → tokens[1:3], '2' → tokens[1:2] (1-based)."""
    if field.endswith("-"):
        return slice(int(field[:-1]) - 1, None)
    if "-" in field:
        lo, hi = field.split("-")
        return slice(int(lo) - 1, int(hi))
    return slice(int(field) - 1, int(field))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", "-i", required=True, help="text file, - for stdin")
    parser.add_argument("--output", "-o", required=True, help="output file, - for stdout")
    parser.add_argument("--field", "-f", default=None,
                        help="1-based field selection, e.g. 2- to drop utt-id")
    parser.add_argument("--token_type", "-t", default="char",
                        choices=["char", "word", "bpe", "phn"])
    parser.add_argument("--delimiter", "-d", default=None)
    parser.add_argument("--space_symbol", default="<space>")
    parser.add_argument("--bpemodel", default=None)
    parser.add_argument("--non_linguistic_symbols", default=None,
                        help="file listing non-linguistic symbols")
    parser.add_argument("--remove_non_linguistic_symbols", action="store_true")
    parser.add_argument("--cleaner", default=None, choices=[None, "tacotron"])
    parser.add_argument("--g2p", default=None)
    parser.add_argument("--write_vocabulary", default=False,
                        type=lambda s: str(s).lower() in ("true", "1", "yes"))
    parser.add_argument("--vocabulary_size", type=int, default=0)
    parser.add_argument("--train_bpe", default=False,
                        type=lambda x: str(x).lower() in ("true", "1", "yes"),
                        help="train the own-BPE model on the input first "
                        "(spm_train analog) and save it to --bpemodel")
    parser.add_argument("--bpe_vocab_size", type=int, default=1000)
    parser.add_argument("--cutoff", type=int, default=0,
                        help="drop tokens with count <= cutoff")
    parser.add_argument("--add_symbol", action="append", default=[],
                        help="'<token>:<index>' to splice into the vocabulary")
    args = parser.parse_args(argv)

    from espnet_tpu.text.tokenizers import build_tokenizer

    nls = []
    if args.non_linguistic_symbols:
        nls = [
            line.strip()
            for line in Path(args.non_linguistic_symbols).read_text().splitlines()
            if line.strip()
        ]

    cleaner = None
    if args.cleaner:
        from espnet_tpu.text.cleaner import TextCleaner

        cleaner = TextCleaner([args.cleaner])

    if args.token_type == "bpe" and args.train_bpe:
        if not args.bpemodel:
            parser.error("--train_bpe true requires --bpemodel PATH "
                         "(where the trained model is saved)")
        # spm_train analog over the (field-sliced, cleaned) input text
        from espnet_tpu.text.bpe import BPETokenizer

        src = sys.stdin if args.input == "-" else open(args.input, encoding="utf-8")
        lines = []
        sl0 = field2slice(args.field) if args.field else None
        for line in src:
            line = line.rstrip("\n")
            if sl0 is not None:
                parts = line.split(args.delimiter)
                line = (args.delimiter or " ").join(parts[sl0])
            if cleaner is not None:
                line = cleaner(line)
            lines.append(line)
        if src is not sys.stdin:
            src.close()
        bpe = BPETokenizer.train(lines, vocab_size=args.bpe_vocab_size)
        Path(args.bpemodel).parent.mkdir(parents=True, exist_ok=True)
        bpe.save(args.bpemodel)
        # re-feed the buffered lines below instead of re-reading stdin
        args.input = None
        _buffered_lines = lines
    else:
        _buffered_lines = None

    tokenizer = build_tokenizer(
        args.token_type,
        bpemodel=args.bpemodel,
        non_linguistic_symbols=nls,
        space_symbol=args.space_symbol,
        delimiter=args.delimiter or " ",
        g2p_type=args.g2p,
    )

    if _buffered_lines is not None:
        fin = _buffered_lines
        sl = None  # already sliced/cleaned during BPE training
        cleaner = None
    else:
        fin = sys.stdin if args.input == "-" else open(args.input, encoding="utf-8")
        sl = field2slice(args.field) if args.field else None

    counter: Counter = Counter()
    out_lines = []
    for line in fin:
        line = line.rstrip("\n")
        if sl is not None:
            parts = line.split(args.delimiter)
            line = (args.delimiter or " ").join(parts[sl])
        if cleaner is not None:
            line = cleaner(line)
        toks = tokenizer.text2tokens(line)
        if args.remove_non_linguistic_symbols and nls:
            toks = [t for t in toks if t not in nls]
        if args.write_vocabulary:
            counter.update(toks)
        else:
            out_lines.append(" ".join(toks))
    if fin is not sys.stdin and not isinstance(fin, list):
        fin.close()

    if args.write_vocabulary:
        items = [(t, c) for t, c in counter.most_common() if c > args.cutoff]
        if args.vocabulary_size > 0:
            keep = args.vocabulary_size - len(args.add_symbol)
            items = items[: max(keep, 0)]
        vocab = [t for t, _ in items]
        # splice add_symbols at requested indices (negative = from the end)
        pre, post = [], []
        for spec in args.add_symbol:
            tok, _, idx = spec.rpartition(":")
            idx = int(idx)
            (pre if idx >= 0 else post).append((idx, tok))
        for idx, tok in sorted(pre):
            vocab.insert(min(idx, len(vocab)), tok)
        for idx, tok in sorted(post):
            vocab.insert(len(vocab) + idx + 1, tok)
        out_lines = vocab

    text = "\n".join(out_lines) + "\n"
    if args.output == "-":
        sys.stdout.write(text)
    else:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(text)


if __name__ == "__main__":
    main()
