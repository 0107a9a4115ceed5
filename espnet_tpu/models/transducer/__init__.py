from espnet_tpu.models.transducer.model import (
    JointNetwork,
    PredictionNet,
    TransducerModel,
)

__all__ = ["JointNetwork", "PredictionNet", "TransducerModel"]
