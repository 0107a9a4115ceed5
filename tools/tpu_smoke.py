"""TPU smoke: tiny conformer hybrid CTC/attention trained on synthetic
correlated data on the real chip — asserts the bf16 + Pallas-CTC train
path actually learns (loss decreases substantially)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRModel, ConformerEncoder, TransformerDecoder
from espnet_tpu.train.optimizers import build_optimizer
from espnet_tpu.train.train_state import TrainState, make_train_step


def main():
    v, b, t, l, d = 12, 32, 128, 8, 20
    rng = np.random.RandomState(0)
    ys = rng.randint(1, v - 1, size=(b, l)).astype(np.int32)
    feats = np.zeros((b, t, d), dtype=np.float32)
    for i in range(b):
        for j, y in enumerate(ys[i]):
            feats[i, j * (t // l): (j + 1) * (t // l), y] = 2.0
    feats += rng.randn(b, t, d).astype(np.float32) * 0.1
    batch = {
        "speech": jnp.asarray(feats),
        "speech_lengths": jnp.full((b,), t, jnp.int32),
        "text": jnp.asarray(ys),
        "text_lengths": jnp.full((b,), l, jnp.int32),
    }
    enc = ConformerEncoder(
        attention_dim=64, attention_heads=2, linear_units=128, num_blocks=2,
        cnn_kernel=7, dtype=jnp.bfloat16,
    )
    dec = TransformerDecoder(
        v, attention_dim=64, attention_heads=2, linear_units=128, num_blocks=1,
        dtype=jnp.bfloat16,
    )
    model = ASRModel(vocab_size=v, encoder=enc, decoder=dec, ctc_weight=0.5)
    variables = model.init(
        jax.random.PRNGKey(0), batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"],
    )
    tx = build_optimizer("adam", lr=3e-3)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    losses = []
    for i in range(200):
        state, stats = step(state, batch)
        if i % 40 == 0 or i == 199:
            losses.append(float(stats["loss"]))
            print(f"step {i}: loss {losses[-1]:.3f}", flush=True)
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])
    print("TPU smoke PASSED: loss", losses[0], "->", losses[-1])


if __name__ == "__main__":
    main()
