from espnet_tpu.text.tokenizers import (
    CharTokenizer,
    WordTokenizer,
    TokenIDConverter,
    build_tokenizer,
)

__all__ = ["CharTokenizer", "WordTokenizer", "TokenIDConverter", "build_tokenizer"]
