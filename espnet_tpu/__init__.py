"""espnet_tpu: a TPU-native end-to-end speech processing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ESPnet
(reference: kan-bayashi/espnet): ASR (hybrid CTC/attention, transducer,
Mask-CTC), TTS (Tacotron2 / Transformer-TTS / FastSpeech1+2), LM, ST/MT,
speech enhancement, and joint CTC/attention beam search with LM fusion —
built on functional models, pjit/mesh SPMD parallelism, and Pallas TPU
kernels for the hot loops.
"""

__version__ = "0.1.0"
