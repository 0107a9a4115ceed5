from espnet_tpu.models.enh.models import EnhancementModel, TFMaskingNet, si_snr, pit_loss

__all__ = ["EnhancementModel", "TFMaskingNet", "si_snr", "pit_loss"]
