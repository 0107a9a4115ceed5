from espnet_tpu.models.st_mt.models import MTModel, STModel

__all__ = ["MTModel", "STModel"]
