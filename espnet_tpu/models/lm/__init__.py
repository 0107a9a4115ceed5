from espnet_tpu.models.lm.models import SequentialRNNLM, TransformerLM, lm_nll

__all__ = ["SequentialRNNLM", "TransformerLM", "lm_nll"]
