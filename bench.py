"""Benchmark suite (driver-facing). Primary metric = Conformer hybrid
CTC/attention train throughput in audio-seconds of speech processed per
wall-second per chip; `extra` carries the other driver-visible metrics
(MFU, greedy-decode RTF, transducer train throughput, RNN-T Pallas
kernel speedup, LM tokens/s, Tacotron2 throughput).

Wedge-proof architecture (round-2 lesson: a stalled remote Mosaic
compile can hang even `jax.devices()`, and the driver's window is
shorter than a hung bench):

- the PARENT process (default entry) never imports jax. It (1) health-
  probes the chip in a killable subprocess, (2) runs the benches in a
  killable child (`bench.py --child`), (3) SIGKILLs the child's process
  group at a hard deadline, and (4) always ends with a parseable JSON
  line on stdout.
- the CHILD prints the primary-metric JSON line IMMEDIATELY after the
  conformer bench, then re-prints a cumulative line after each extra
  phase, so whatever cuts the run short, the most complete measurement
  so far is already on stdout (the parent forwards each line as it
  arrives; the LAST JSON line is the most complete).
- extras are attempted newest-measurement-first only while budget
  remains; a skipped phase is recorded as "skipped (budget)".

Total wall budget ≤ 900 s (preflight ≤ 120 s + child ≤ 760 s).

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is the real-time factor (audio-seconds/s ÷ 1.0).
"""
from __future__ import annotations

import json
import os
import sys
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
    tiny = bool(os.environ.get("ESPNET_BENCH_TINY"))
    if tiny:  # harness self-test on CPU: exercise the full flow fast
        b, t, l = 4, 64, 8
    model = g._flagship(vocab, tiny=tiny, dtype=jnp.bfloat16)
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


def bench_conformer_large_train():
    """Reference-large conformer (Librispeech conformer-large shape:
    d=512, h=8, 12 encoder blocks, ff=2048 — SURVEY A.4 north-star
    model) + 6-block transformer decoder, batch 64 × 512 frames.
    Returns (audio-s/s/chip, MFU %).

    b=64 per chip: MFU scales with batch here (measured round 4:
    b=32 39.7 %, b=48 43.9 %, b=64 45.5 % — tools/profile_large.py);
    the reference trains this config with large accumulated batches, so
    the per-chip bench uses the HBM-fitting b=64."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import (
        ASRModel,
        ConformerEncoder,
        TransformerDecoder,
    )
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.train_state import TrainState, make_train_step
    from espnet_tpu.utils.timing import force

    vocab = 5000
    b, t, l = 64, 512, 24
    enc = ConformerEncoder(
        attention_dim=512, attention_heads=8, linear_units=2048,
        num_blocks=12, dtype=jnp.bfloat16,
    )
    dec = TransformerDecoder(
        vocab, attention_dim=512, attention_heads=8, linear_units=2048,
        num_blocks=6, dtype=jnp.bfloat16,
    )
    model = ASRModel(
        vocab_size=vocab, encoder=enc, decoder=dec, ctc_weight=0.3,
        lsm_weight=0.1, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    feats = rng.randn(b, t, 80).astype(np.float32)
    ilens = np.full(b, t, np.int32)
    ys = rng.randint(1, vocab - 1, size=(b, l)).astype(np.int32)
    ylens = np.full(b, l, np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(variables["params"])
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
    for _ in range(2):
        state, stats = step(state, batch)
    force(stats["loss"])
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state, batch)
    force(stats["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    tokens = b * (t // 4) + b * l
    platform = jax.devices()[0].platform
    mfu = 6.0 * n_params * tokens / dt / PEAK_FLOPS.get(platform, 197e12) * 100
    return b * t / FPS / dt / max(jax.device_count(), 1), mfu


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


def _result_json(value: float, extra: dict) -> str:
    return json.dumps(
        {
            "metric": "conformer_train_throughput_audio_sec_per_s_per_chip",
            "value": round(value, 2),
            "unit": "audio-seconds/s/chip",
            "vs_baseline": round(value, 2),
            "extra": extra,
        }
    )


def child_main(deadline: float):
    """Run the benches; print a cumulative JSON line after the primary
    bench and after every extra phase (stdout, flushed)."""
    from espnet_tpu.utils.env import apply_jax_platform_env, enable_fast_tpu_rng

    apply_jax_platform_env()  # honor JAX_PLATFORMS over sitecustomize
    import jax

    try:  # persistent compile cache: warm repeated runs (no-op if the
        # backend compiles remotely and ignores it)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    enable_fast_tpu_rng()

    per_chip, mfu, model, variables, batch = bench_conformer_train()
    extra = {}
    if mfu is not None:
        extra["train_mfu_pct"] = round(mfu, 2)
    print(_result_json(per_chip, extra), flush=True)  # primary, immediately

    def remaining():
        return deadline - time.time()

    def _large():
        if os.environ.get("ESPNET_BENCH_TINY"):
            return None  # d=512 model is not a CPU self-test workload
        v, mfu = bench_conformer_large_train()
        extra["conformer_large_mfu_pct"] = round(mfu, 2)
        return round(v, 2)

    # order: LM and Tacotron2 run BEFORE the expensive d=512 bench —
    # they were budget-starved in the r3/r4 captures (VERDICT r4 weak #6)
    phases = [
        (
            "greedy_ctc_decode_rtf",
            lambda: round(bench_greedy_decode_rtf(model, variables, batch), 6),
            60,
        ),
        (
            "lm_train_tokens_per_s_per_chip",
            lambda: round(bench_lm_train(), 0),
            120,
        ),
        (
            "tacotron2_train_audio_s_per_s_per_chip",
            lambda: round(bench_tacotron2_train(), 2),
            120,
        ),
        ("conformer_large_audio_s_per_s_per_chip", _large, 240),
        ("rnnt_pallas_fwdbwd_speedup", lambda: _round_opt(bench_rnnt_kernel()), 60),
        (
            "transducer_train_audio_s_per_s_per_chip",
            lambda: round(bench_transducer_train(), 2),
            120,
        ),
    ]
    for name, fn, need_s in phases:
        if remaining() < need_s:
            extra[name + "_note"] = "skipped (budget)"
        else:
            try:
                val = fn()
                if val is not None:
                    extra[name] = val
            except Exception as e:  # keep the primary metric robust
                extra[name + "_error"] = str(e)[:100]
        print(_result_json(per_chip, extra), flush=True)  # cumulative


def _round_opt(v):
    return None if v is None else round(v, 2)


def _preflight(timeout_s: int = 120) -> str | None:
    """Probe the device in a killable subprocess (a wedged tunnel hangs
    even jax.devices()). Returns None if healthy, else an error string."""
    import subprocess

    probe = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from espnet_tpu.utils.env import apply_jax_platform_env\n"
        "apply_jax_platform_env()\n"  # honor JAX_PLATFORMS over sitecustomize
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "v = float(jnp.sum(jnp.ones((128, 128))))\n"
        "print(f'HEALTHY {d[0].platform} {len(d)} {v}')\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-u", "-c", probe],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return (
            f"preflight: no device response within {timeout_s}s — tunnel "
            "wedged (stalled server-side compile holds the grant)"
        )
    if "HEALTHY" in r.stdout:
        return None
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    return f"preflight backend error rc={r.returncode}: " + " | ".join(tail)


def main():
    """Parent: never imports jax; always ends with a JSON line on stdout."""
    import signal
    import subprocess
    import threading

    budget_s = int(os.environ.get("ESPNET_BENCH_BUDGET_S", "760"))
    # Two probe attempts: a cold tunnel can take >120s to establish its
    # FIRST connection and then answer instantly (measured round 4: probe
    # 1 timed out at 90s, probe 2 was healthy in seconds). Round-3's
    # BENCH rc=2 "wedge" was this false positive, not a held grant.
    err = _preflight()
    if err is not None:
        err2 = _preflight()
        if err2 is not None:
            print(
                _result_json(0.0, {"error": err2 + " (2 attempts)"}),
                flush=True,
            )
            return 2

    deadline = time.time() + budget_s
    child = subprocess.Popen(
        [sys.executable, "-u", __file__, "--child", str(deadline)],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        start_new_session=True,  # killpg reaches any grandchildren
    )
    seen: list[str] = []

    def reader():
        assert child.stdout is not None
        for line in child.stdout:
            line = line.rstrip("\n")
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                except ValueError:
                    obj = None
                if isinstance(obj, dict) and "metric" in obj:
                    seen.append(line)
                    print(line, flush=True)  # forward as soon as measured
                    continue
            print(line, file=sys.stderr, flush=True)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        child.wait(timeout=budget_s + 30)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except Exception:
            pass
        child.wait()
    t.join(timeout=10)

    if not seen:
        print(
            _result_json(
                0.0,
                {
                    "error": "bench child produced no metric within "
                    f"{budget_s}s (rc={child.returncode}) — likely a "
                    "stalled remote compile; child was SIGKILLed"
                },
            ),
            flush=True,
        )
        return 2
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(float(sys.argv[2]))
    else:
        sys.exit(main())
