"""Benchmark suite (driver-facing): one JSON line, primary metric =
Conformer hybrid CTC/attention train throughput in audio-seconds of
speech processed per wall-second per chip; `extra` carries the other
driver-visible metrics (MFU, greedy-decode RTF, transducer train
throughput, RNN-T Pallas kernel speedup).

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is the real-time factor (audio-seconds/s ÷ 1.0).
"""
from __future__ import annotations

import json
import time

import numpy as np

FPS = 100.0  # feature frames per audio second (10 ms shift convention)
# TPU v5e peak: 197 TFLOP/s bf16 per chip (public spec)
PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e12}


def _time(f, *args, n=10):
    from espnet_tpu.utils.timing import force

    out = f(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    force(out)  # host readback: block_until_ready lies under the tunnel
    return (time.perf_counter() - t0) / n


def bench_conformer_train():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.train_state import TrainState, make_train_step

    vocab = 500
    b, t, l = 128, 512, 24
    model = g._flagship(vocab, dtype=jnp.bfloat16)
    feats, ilens, ys, ylens = g._example_batch(b=b, t=t, d=80, l=l, vocab=vocab)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    # copy: the donated train state must not alias `variables` (the
    # decode bench reuses them after training steps)
    params_copy = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), variables["params"]
    )
    tx = build_optimizer("adam", lr=1e-4)
    state = TrainState.create(params_copy, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    batch = {
        "speech": jnp.asarray(feats),
        "speech_lengths": jnp.asarray(ilens),
        "text": jnp.asarray(ys),
        "text_lengths": jnp.asarray(ylens),
    }

    # analytic train FLOPs for MFU: the standard 6·N·tokens estimate
    # (fwd 2·N·tok + bwd 4·N·tok) over encoder frames after ×4
    # subsampling plus decoder label positions. XLA's cost_analysis()
    # over-counts on TPU (reported >200% of peak), so we bound with the
    # parameter-matmul estimate — attention O(T²·D) terms are excluded,
    # making this a mild UNDER-estimate (honest lower bound on MFU).
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params_copy)
    )
    tokens = b * (t // 4) + b * l
    flops_per_step = 6.0 * n_params * tokens

    from espnet_tpu.utils.timing import force

    for _ in range(3):
        state, stats = step(state, batch)
    force(stats["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state, batch)
    force(stats["loss"])  # true completion (see utils/timing.py)
    dt = (time.perf_counter() - t0) / n_steps

    audio_seconds = b * t / FPS
    per_chip = audio_seconds / dt / max(jax.device_count(), 1)
    platform = jax.devices()[0].platform
    mfu = (
        flops_per_step / dt / PEAK_FLOPS.get(platform, 197e12) * 100.0
        if flops_per_step
        else None
    )
    return per_chip, mfu, model, variables, batch


def bench_greedy_decode_rtf(model, variables, batch):
    """Greedy CTC decode RTF on the flagship encoder (encode + CTC
    argmax), batch 128 × 5.12 s utterances."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def decode(speech, lens):
        hs, hlens = model.apply(
            variables, speech, lens, method="encode"
        )
        logp = model.apply(variables, hs, method="ctc_log_softmax")
        return jnp.argmax(logp, axis=-1), hlens

    dt = _time(decode, batch["speech"], batch["speech_lengths"], n=10)
    audio_seconds = batch["speech"].shape[0] * batch["speech"].shape[1] / FPS
    return dt / audio_seconds  # RTF (lower is better)


def bench_transducer_train():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import ConformerEncoder
    from espnet_tpu.models.transducer.model import TransducerModel
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.train_state import TrainState, make_train_step

    vocab = 500
    b, t, l = 32, 512, 24
    enc = ConformerEncoder(
        attention_dim=256, attention_heads=4, linear_units=1024, num_blocks=12,
        dtype=jnp.bfloat16,
    )
    platform = jax.devices()[0].platform
    model = TransducerModel(
        vocab_size=vocab, encoder=enc, dunits=256, joint_dim=256,
        loss_impl="pallas" if platform == "tpu" else "scan",
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    feats = rng.randn(b, t, 80).astype(np.float32)
    ilens = np.full(b, t, dtype=np.int32)
    ys = rng.randint(1, vocab - 1, size=(b, l)).astype(np.int32)
    ylens = np.full(b, l, dtype=np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    tx = build_optimizer("adam", lr=1e-4)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    batch = {
        "speech": jnp.asarray(feats),
        "speech_lengths": jnp.asarray(ilens),
        "text": jnp.asarray(ys),
        "text_lengths": jnp.asarray(ylens),
    }
    from espnet_tpu.utils.timing import force

    for _ in range(2):
        state, stats = step(state, batch)
    force(stats["loss"])
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state, batch)
    force(stats["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    return b * t / FPS / dt / max(jax.device_count(), 1)


def bench_rnnt_kernel():
    """fwd+bwd speedup of the Pallas RNN-T kernel over the scan path."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.losses.pallas_rnnt import rnnt_loss_pallas
    from espnet_tpu.losses.transducer import rnnt_loss_from_log_probs

    if jax.devices()[0].platform != "tpu":
        return None
    b, t, u = 32, 256, 64
    rng = np.random.RandomState(0)
    lpb = jnp.asarray(rng.randn(b, t, u + 1).astype(np.float32) - 1)
    lpe = jnp.asarray(rng.randn(b, t, u).astype(np.float32) - 1)
    ilens = jnp.asarray(np.full(b, t, np.int32))
    llens = jnp.asarray(np.full(b, u, np.int32))
    g_scan = jax.jit(
        jax.grad(
            lambda a, e: rnnt_loss_from_log_probs(a, e, ilens, llens).sum(),
            argnums=(0, 1),
        )
    )
    g_pal = jax.jit(
        jax.grad(
            lambda a, e: rnnt_loss_pallas(a, e, ilens, llens).sum(),
            argnums=(0, 1),
        )
    )
    ts = _time(g_scan, lpb, lpe, n=20)
    tp = _time(g_pal, lpb, lpe, n=20)
    return ts / tp


def bench_lm_train():
    """Transformer-LM training throughput, tokens/s/chip (reference
    lm_transformer.yaml scale: 16 layers, d=512, ff=2048, h=8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.lm.models import TransformerLM, lm_nll
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.utils.timing import force

    vocab, b, l = 5000, 64, 128
    model = TransformerLM(
        vocab, attention_dim=512, attention_heads=8, linear_units=2048,
        num_blocks=16, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(1, vocab, size=(b, l)).astype(np.int32))
    lens = jnp.asarray(np.full(b, l, np.int32))
    variables = model.init(jax.random.PRNGKey(0), tokens, lens)

    import optax

    tx = build_optimizer("adam", lr=1e-4)

    def loss_fn(params, batch, rngs):
        logits = model.apply(
            {"params": params}, batch["tokens"], batch["lengths"],
            deterministic=False, rngs=rngs,
        )
        nll, n_tok = lm_nll(logits[:, :-1], batch["tokens"][:, 1:], batch["lengths"] - 1)
        return nll / jnp.maximum(n_tok, 1), {}

    opt_state = tx.init(variables["params"])
    state = {"params": variables["params"], "opt": opt_state}
    batch = {"tokens": tokens, "lengths": lens}

    @jax.jit
    def step(state, batch, key):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, {"dropout": key}), has_aux=True
        )(state["params"])
        updates, opt = tx.update(grads, state["opt"], state["params"])
        return {
            "params": optax.apply_updates(state["params"], updates), "opt": opt
        }, loss

    key = jax.random.PRNGKey(1)
    state, loss = step(state, batch, key)
    force(loss)
    import time

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, batch, key)
    force(loss)
    dt = (time.perf_counter() - t0) / n
    return b * l / dt


def bench_tacotron2_train():
    """Tacotron2 TTS train throughput: synthesized audio-seconds of mel
    targets consumed per wall-second per chip (scan teacher-forced
    decoder, guided-attention loss, fused Adam). Standard LJSpeech-scale
    hyperparameters, batch 32 × 500 mel frames (~5.8 s at 86 fps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from espnet_tpu.models.tts.tacotron2 import Tacotron2
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.utils.timing import force

    b, l_text, t_dec, n_mels, vocab = 32, 100, 500, 80, 100
    fps = 86.0  # 22.05 kHz / hop 256
    model = Tacotron2(vocab_size=vocab, n_mels=n_mels)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, vocab, (b, l_text)).astype(np.int32))
    tlens = jnp.asarray(np.full(b, l_text, np.int32))
    mels = jnp.asarray(rng.randn(b, t_dec, n_mels).astype(np.float32))
    mlens = jnp.asarray(np.full(b, t_dec, np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text[:1], tlens[:1], mels[:1], mlens[:1],
    )
    tx = build_optimizer("adam", lr=1e-3, grad_clip=1.0)
    state = {"params": variables["params"], "opt": tx.init(variables["params"])}

    @jax.jit
    def step(state, key):
        def loss_fn(p):
            loss, stats = model.apply(
                {"params": p}, text, tlens, mels, mlens,
                deterministic=False, rngs={"dropout": key},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt = tx.update(grads, state["opt"], state["params"])
        return {
            "params": optax.apply_updates(state["params"], updates),
            "opt": opt,
        }, loss

    key = jax.random.PRNGKey(2)
    state, loss = step(state, key)
    force(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, key)
    force(loss)
    dt = (time.perf_counter() - t0) / n
    return b * t_dec / fps / dt / max(jax.device_count(), 1)


def main():
    import jax

    from espnet_tpu.utils.env import enable_fast_tpu_rng

    enable_fast_tpu_rng()
    per_chip, mfu, model, variables, batch = bench_conformer_train()
    extra = {}
    if mfu is not None:
        extra["train_mfu_pct"] = round(mfu, 2)
    try:
        extra["greedy_ctc_decode_rtf"] = round(
            bench_greedy_decode_rtf(model, variables, batch), 6
        )
    except Exception as e:  # keep the primary metric robust
        extra["greedy_ctc_decode_rtf_error"] = str(e)[:100]
    try:
        extra["transducer_train_audio_s_per_s_per_chip"] = round(
            bench_transducer_train(), 2
        )
    except Exception as e:
        extra["transducer_error"] = str(e)[:100]
    try:
        sp = bench_rnnt_kernel()
        if sp is not None:
            extra["rnnt_pallas_fwdbwd_speedup"] = round(sp, 2)
    except Exception as e:
        extra["rnnt_kernel_error"] = str(e)[:100]
    try:
        extra["lm_train_tokens_per_s_per_chip"] = round(bench_lm_train(), 0)
    except Exception as e:
        extra["lm_train_error"] = str(e)[:100]
    try:
        extra["tacotron2_train_audio_s_per_s_per_chip"] = round(
            bench_tacotron2_train(), 2
        )
    except Exception as e:
        extra["tacotron2_train_error"] = str(e)[:100]

    print(
        json.dumps(
            {
                "metric": "conformer_train_throughput_audio_sec_per_s_per_chip",
                "value": round(per_chip, 2),
                "unit": "audio-seconds/s/chip",
                "vs_baseline": round(per_chip, 2),
                "extra": extra,
            }
        )
    )


def _watchdog(seconds: int = 3300):
    """Emit an honest error JSON instead of hanging forever if the
    device becomes unreachable (a stalled remote compile can wedge the
    tunnel — see docs/BENCHMARKS.md and the verify skill); the driver
    then records a failed bench rather than timing out silently."""
    import os
    import signal

    def _abort(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "conformer_train_throughput_audio_sec_per_s_per_chip",
                    "value": 0.0,
                    "unit": "audio-seconds/s/chip",
                    "vs_baseline": 0.0,
                    "extra": {
                        "error": "bench watchdog fired before the run "
                        "completed: device unreachable or a compile "
                        "stalled (tunnel wedge) — any metrics measured "
                        "earlier in this run were lost with it",
                    },
                }
            ),
            flush=True,
        )
        os._exit(2)

    signal.signal(signal.SIGALRM, _abort)
    signal.alarm(seconds)


if __name__ == "__main__":
    _watchdog()
    main()
