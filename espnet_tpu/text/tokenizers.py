"""Tokenizers + token-id conversion (reference: espnet2/text/ —
CharTokenizer, WordTokenizer, SentencepieceTokenizer, TokenIDConverter).

BPE is provided by espnet_tpu.text.bpe (own implementation; the reference
shells out to the sentencepiece C++ lib, which is not available here).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, List, Optional, Union


class CharTokenizer:
    """Text ↔ character tokens; space becomes `space_symbol`."""

    def __init__(self, space_symbol: str = "<space>", non_linguistic_symbols: Iterable[str] = ()):
        self.space_symbol = space_symbol
        self.nls = sorted(non_linguistic_symbols, key=len, reverse=True)

    def text2tokens(self, line: str) -> List[str]:
        tokens = []
        while line:
            for s in self.nls:
                if line.startswith(s):
                    tokens.append(s)
                    line = line[len(s):]
                    break
            else:
                c = line[0]
                tokens.append(self.space_symbol if c == " " else c)
                line = line[1:]
        return tokens

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return "".join(" " if t == self.space_symbol else t for t in tokens)


class WordTokenizer:
    def __init__(self, delimiter: str = " "):
        self.delimiter = delimiter

    def text2tokens(self, line: str) -> List[str]:
        return [t for t in line.split(self.delimiter) if t]

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return self.delimiter.join(tokens)


class TokenIDConverter:
    """token list (file or list) ↔ integer ids; unk for OOV."""

    def __init__(self, token_list: Union[str, Path, List[str]], unk_symbol: str = "<unk>"):
        if isinstance(token_list, (str, Path)):
            token_list = Path(token_list).read_text().splitlines()
            token_list = [t.split()[0] if " " in t else t for t in token_list if t]
        self.token_list: List[str] = list(token_list)
        self.token2id: Dict[str, int] = {t: i for i, t in enumerate(self.token_list)}
        if len(self.token2id) != len(self.token_list):
            raise ValueError("duplicated tokens in token list")
        self.unk_symbol = unk_symbol
        self.unk_id = self.token2id.get(unk_symbol)

    def get_num_vocabulary_size(self) -> int:
        return len(self.token_list)

    def tokens2ids(self, tokens: Iterable[str]) -> List[int]:
        if self.unk_id is None:
            return [self.token2id[t] for t in tokens]
        return [self.token2id.get(t, self.unk_id) for t in tokens]

    def ids2tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.token_list[i] for i in ids]


def build_tokenizer(
    token_type: str,
    bpemodel: Optional[str] = None,
    non_linguistic_symbols: Iterable[str] = (),
    space_symbol: str = "<space>",
    delimiter: str = " ",
    g2p_type: Optional[str] = None,
):
    if token_type == "char":
        return CharTokenizer(space_symbol, non_linguistic_symbols)
    if token_type == "word":
        return WordTokenizer(delimiter)
    if token_type == "bpe":
        from espnet_tpu.text.bpe import BPETokenizer

        return BPETokenizer.load(bpemodel)
    if token_type == "phn":
        from espnet_tpu.text.phoneme import PhonemeTokenizer

        return PhonemeTokenizer(
            g2p_type or "en_rule",
            space_symbol=space_symbol,
            non_linguistic_symbols=non_linguistic_symbols,
        )
    raise ValueError(f"unknown token_type {token_type}")


def build_token_list(
    texts: Iterable[str],
    token_type: str = "char",
    add_symbols: Iterable[str] = ("<blank>", "<unk>"),
    tail_symbols: Iterable[str] = ("<sos/eos>",),
) -> List[str]:
    """Vocabulary construction (reference utils/text2vocabulary.py):
    [<blank>, <unk>, ...tokens..., <sos/eos>]."""
    tok = build_tokenizer(token_type)
    vocab = set()
    for line in texts:
        vocab.update(tok.text2tokens(line))
    return list(add_symbols) + sorted(vocab) + list(tail_symbols)
