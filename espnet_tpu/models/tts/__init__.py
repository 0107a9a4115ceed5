from espnet_tpu.models.tts.tacotron2 import Tacotron2, guided_attention_loss
from espnet_tpu.models.tts.fastspeech import FastSpeech2
from espnet_tpu.models.tts.transformer_tts import TransformerTTS

__all__ = ["Tacotron2", "FastSpeech2", "TransformerTTS", "guided_attention_loss"]
