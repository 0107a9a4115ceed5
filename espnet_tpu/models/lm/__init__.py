from espnet_tpu.models.lm.models import (
    ScannedTransformerLM,
    SequentialRNNLM,
    TransformerLM,
    lm_nll,
)

__all__ = ["ScannedTransformerLM", "SequentialRNNLM", "TransformerLM", "lm_nll"]
