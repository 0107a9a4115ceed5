"""ASR task: config → model/data/optimizer → collect-stats → train.

Re-design of espnet2 AbsTask/ASRTask (tasks/abs_task.py:181,
tasks/asr.py:103): same class-choices composition (encoder/decoder/
frontend/normalize selected by name with per-component conf dicts), same
stages (collect_stats → train), functional core.
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from espnet_tpu.parallel.distributed import init_distributed_and_mesh
from espnet_tpu.data.dataset import (
    CommonPreprocessor,
    ESPnetDataset,
    SequenceIterFactory,
    common_collate,
)
from espnet_tpu.data.batching import filter_by_length
from espnet_tpu.data.kaldi_io import read_scp
from espnet_tpu.models.asr import (
    ASRModel,
    ConformerEncoder,
    RNNDecoder,
    RNNEncoder,
    ScannedTransformerDecoder,
    ScannedTransformerEncoder,
    TransformerDecoder,
    TransformerEncoder,
)
from espnet_tpu.models.asr.frontend import (
    BeamformerFrontend,
    DefaultFrontend,
    GlobalMVN,
    UtteranceMVN,
)
from espnet_tpu.text.tokenizers import TokenIDConverter, build_tokenizer
from espnet_tpu.train.optimizers import build_optimizer
from espnet_tpu.train.schedulers import noam_schedule, warmup_lr_schedule
from espnet_tpu.train.trainer import Trainer
from espnet_tpu.utils.config import load_yaml, save_yaml
from espnet_tpu.utils.dynamic_import import resolve_class

logger = logging.getLogger(__name__)


def _build_frontend(config):
    """frontend: default | beamformer (multi-channel WPE→MVDR→fbank,
    reference frontends/frontend.py:15) | none."""
    kind = config.get("frontend")
    conf = config.get("frontend_conf", {})
    if kind == "default":
        return DefaultFrontend(**conf)
    if kind == "beamformer":
        conf = {k: v for k, v in conf.items() if k != "channels"}
        return BeamformerFrontend(**conf)
    return None


def _build_normalize(config, has_frontend: bool):
    """normalize: global_mvn | utterance_mvn | none — shared by every
    model branch so normalize_conf is honored uniformly."""
    kind = config.get("normalize")
    if kind == "global_mvn":
        fd = (
            config.get("frontend_conf", {}).get("n_mels", 80)
            if has_frontend
            else config.get("input_size", 80)
        )
        return GlobalMVN(feat_dim=fd, **config.get("normalize_conf", {}))
    if kind == "utterance_mvn":
        return UtteranceMVN(**config.get("normalize_conf", {}))
    return None


ENCODERS = {
    "transformer": TransformerEncoder,
    # layer stack as lax.scan over stacked params: compiled program
    # constant in depth (for deep encoders / remote-compile payloads)
    "transformer_scan": ScannedTransformerEncoder,
    "conformer": ConformerEncoder,
    "rnn": RNNEncoder,
}
DECODERS = {
    "transformer": TransformerDecoder,
    # layer stack as lax.scan over stacked params: compiled program
    # constant in depth (for deep decoders / remote-compile payloads)
    "transformer_scan": ScannedTransformerDecoder,
    "rnn": RNNDecoder,
}

DEFAULT_CONFIG: Dict[str, Any] = {
    "token_list": None,
    "input_size": 80,
    "frontend": None,            # none | default
    "frontend_conf": {},
    "normalize": None,           # none | global_mvn | utterance_mvn
    "normalize_conf": {},
    "specaug": False,
    "specaug_conf": {},
    "encoder": "transformer",
    "encoder_conf": {},
    "decoder": "transformer",
    "decoder_conf": {},
    "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.0},
    "optim": "adam",
    "optim_conf": {"lr": 1e-3},
    "scheduler": None,           # none | noam | warmuplr
    "scheduler_conf": {},
    "grad_clip": 5.0,
    "accum_grad": 1,
    "max_epoch": 10,
    "patience": None,
    "keep_nbest": 5,
    "best_key": "loss",
    "batch_size": 16,
    "batch_bins": None,
    "batch_mode": "seq",
    "sortagrad": False,
    # >1 = corpus-split epoch streaming (MultipleIterFactory)
    "num_splits": None,
    # length filtering (≙ remove_longshortdata.sh); None = no bound
    "min_frames": None,
    "max_frames": None,
    "min_tokens": None,
    "max_tokens": None,
    "seed": 0,
    "token_type": "char",
    "bpemodel": None,
    "log_interval": 50,
}


def build_model(config: Dict[str, Any], vocab_size: int):
    if config["encoder"] == "custom":
        # mixed-architecture block stack (reference transducer/blocks.py:463)
        from espnet_tpu.models.transducer.blocks import BlockEncoder, freeze_blocks

        ec = dict(config.get("encoder_conf", {}))
        enc = BlockEncoder(
            blocks=freeze_blocks(ec.get("blocks", [])),
            input_proj=ec.get("input_proj"),
        )
    else:
        enc_cls = resolve_class(config["encoder"], ENCODERS)
        enc = enc_cls(**config.get("encoder_conf", {}))
    model_conf = dict(config.get("model_conf", {}))
    model_type = config.get("model_type", "asr")
    if model_type == "transducer":
        from espnet_tpu.models.transducer import TransducerModel

        t_frontend = None
        if config.get("frontend") in ("default", "beamformer"):
            t_frontend = _build_frontend(config)
        t_normalize = _build_normalize(config, t_frontend is not None)
        # drop defaults meant for the attention model (ctc_weight etc.)
        # that TransducerModel does not take
        t_fields = {f.name for f in dataclasses.fields(TransducerModel)}
        model_conf = {k: v for k, v in model_conf.items() if k in t_fields}
        return TransducerModel(
            vocab_size=vocab_size, encoder=enc,
            frontend=t_frontend, normalize=t_normalize, **model_conf
        )
    if model_type == "pit":
        from espnet_tpu.models.asr.multispeaker import PITCTCASRModel

        n_spk = config.get("n_spk", 2)
        bc = config.get("branch_conf", {"elayers": 1, "eunits": 64, "eprojs": 64})
        branch_cls = resolve_class(config.get("branch_encoder", "rnn"), ENCODERS)
        branches = [branch_cls(**bc) for _ in range(n_spk)]
        p_frontend = None
        if config.get("frontend") in ("default", "beamformer"):
            p_frontend = _build_frontend(config)
        p_normalize = _build_normalize(config, p_frontend is not None)
        return PITCTCASRModel(
            vocab_size=vocab_size, encoder_front=enc,
            encoder_branches=branches, n_spk=n_spk,
            frontend=p_frontend, normalize=p_normalize,
        )
    if model_type == "maskctc":
        from espnet_tpu.models.asr.maskctc import MaskCTCModel

        dec_cls = resolve_class(config.get("decoder", "transformer"), DECODERS)
        dec = dec_cls(vocab_size, causal=False, **config.get("decoder_conf", {}))
        m_frontend = None
        if config.get("frontend") in ("default", "beamformer"):
            m_frontend = _build_frontend(config)
        m_normalize = _build_normalize(config, m_frontend is not None)
        return MaskCTCModel(
            vocab_size=vocab_size, encoder=enc, decoder=dec,
            frontend=m_frontend, normalize=m_normalize, **model_conf
        )
    dec = None
    if model_conf.get("ctc_weight", 0.5) < 1.0 and config.get("decoder"):
        dec_cls = resolve_class(config["decoder"], DECODERS)
        dec = dec_cls(vocab_size, **config.get("decoder_conf", {}))
    frontend = None
    if config.get("frontend") in ("default", "beamformer"):
        frontend = _build_frontend(config)
    normalize = _build_normalize(config, frontend is not None)
    specaug_conf = tuple(
        (k, tuple(v) if isinstance(v, list) else v)
        for k, v in config.get("specaug_conf", {}).items()
    )
    if "labeldist" in model_conf:  # yaml round-trips it as a list
        model_conf["labeldist"] = tuple(model_conf["labeldist"])
    return ASRModel(
        vocab_size=vocab_size,
        encoder=enc,
        decoder=dec,
        frontend=frontend,
        normalize=normalize,
        use_specaug=bool(config.get("specaug")),
        specaug_conf=specaug_conf,
        **model_conf,
    )


def build_preprocessor(config: Dict[str, Any], token_list: List[str]):
    tokenizer = build_tokenizer(
        config.get("token_type", "char"),
        bpemodel=config.get("bpemodel"),
        g2p_type=config.get("g2p"),
    )
    converter = TokenIDConverter(token_list)
    return CommonPreprocessor(tokenizer, converter)


def build_tx(config: Dict[str, Any]):
    optim_conf = dict(config.get("optim_conf", {}))
    lr = optim_conf.pop("lr", 1e-3)
    sched = config.get("scheduler")
    if sched == "noam":
        sc = dict(config.get("scheduler_conf", {}))
        model_size = sc.pop("model_size", None) or config.get(
            "encoder_conf", {}
        ).get("attention_dim", 256)
        lr = noam_schedule(model_size, factor=sc.pop("lr_factor", 10.0), warmup=sc.pop("warmup_steps", 25000))
        name = "noam"
    elif sched == "warmuplr":
        sc = dict(config.get("scheduler_conf", {}))
        lr = warmup_lr_schedule(lr, warmup=sc.pop("warmup_steps", 25000))
        name = config.get("optim", "adam")
    else:
        name = config.get("optim", "adam")
    return build_optimizer(
        name,
        lr=lr,
        grad_clip=config.get("grad_clip", 5.0),
        accum_grad=config.get("accum_grad", 1),
        **optim_conf,
    )


def read_shape_file(path) -> Dict[str, Tuple[int, ...]]:
    out = {}
    for k, v in read_scp(path).items():
        out[k] = tuple(int(x) for x in v.split(","))
    return out


def write_shape_file(path, shapes: Dict[str, Tuple[int, ...]]):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for k, v in shapes.items():
            f.write(f"{k} {','.join(str(x) for x in v)}\n")


def collect_stats(
    config: Dict[str, Any],
    data: List[Tuple[str, str, str]],
    output_dir: str,
    token_list: List[str],
) -> None:
    """Pass over the data: shape files + feature mean/var stats
    (reference: espnet2/main_funcs/collect_stats.py:24)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    pre = build_preprocessor(config, token_list)
    ds = ESPnetDataset(data, preprocessor=pre)
    frontend = None
    if config.get("frontend") in ("default", "beamformer"):
        frontend = _build_frontend(config)

    shapes: Dict[str, Dict[str, Tuple[int, ...]]] = {}
    count = 0
    ssum = None
    ssq = None
    for uid in ds.keys:
        sample = ds[uid]
        for name, arr in sample.items():
            if name == "speech" and frontend is not None:
                import jax.numpy as jnp

                # pad to a coarse bucket grid: unique wav lengths would
                # otherwise each trigger a fresh (remote) compile —
                # catastrophic through a remote-TPU tunnel; the frontend
                # returns true output lengths, so padding is trimmed
                bucket = 8192
                n = len(arr)
                n_pad = ((n + bucket - 1) // bucket) * bucket
                arr_p = np.pad(arr, (0, n_pad - n))
                feats, olens = frontend(
                    jnp.asarray(arr_p)[None], jnp.array([n])
                )
                arr_f = np.asarray(feats[0][: int(np.asarray(olens)[0])])
            elif name == "speech":
                arr_f = arr
            else:
                arr_f = None
            if arr_f is not None:
                if ssum is None:
                    ssum = np.zeros(arr_f.shape[-1])
                    ssq = np.zeros(arr_f.shape[-1])
                ssum += arr_f.sum(axis=0)
                ssq += (arr_f**2).sum(axis=0)
                count += arr_f.shape[0]
                shapes.setdefault("speech", {})[uid] = (
                    (arr_f.shape[0],) + arr_f.shape[1:]
                )
            else:
                shapes.setdefault(name, {})[uid] = arr.shape
    for name, shp in shapes.items():
        write_shape_file(out / f"{name}_shape", shp)
    if ssum is not None:
        np.savez(
            out / "feats_stats.npz", count=count, sum=ssum, sum_square=ssq
        )


def load_feat_stats(stats_path) -> Tuple[np.ndarray, np.ndarray]:
    d = np.load(stats_path)
    mean = d["sum"] / d["count"]
    std = np.sqrt(np.maximum(d["sum_square"] / d["count"] - mean**2, 1e-20))
    return mean.astype(np.float32), std.astype(np.float32)


def train(
    config: Dict[str, Any],
    train_data: List[Tuple[str, str, str]],
    valid_data: List[Tuple[str, str, str]],
    expdir: str,
    stats_dir: Optional[str] = None,
) -> Trainer:
    """Full training pipeline; returns the Trainer (reporter inside)."""
    token_list = config["token_list"]
    if isinstance(token_list, (str, Path)):
        token_list = [
            t for t in Path(token_list).read_text().splitlines() if t
        ]
    vocab = len(token_list)
    mc = config.get("model_conf", {}) or {}
    if mc.get("lsm_type") == "unigram" and not mc.get("labeldist"):
        # corpus-unigram smoothing dist from the training transcripts
        # (reference e2e_asr_common.py:55; computed once, saved in
        # config.yaml so decode-time rebuilds don't recompute)
        from espnet_tpu.losses.label_smoothing import label_smoothing_dist

        pre0 = build_preprocessor(config, token_list)
        text_path = next(p for p, name, _ in train_data if name == "text")
        seqs = []
        for line in Path(text_path).read_text().splitlines():
            parts = line.split(" ", 1)
            if len(parts) == 2 and parts[1].strip():
                seqs.append(
                    pre0.converter.tokens2ids(
                        pre0.tokenizer.text2tokens(parts[1])
                    )
                )
        ld = label_smoothing_dist(vocab, seqs)
        mc["labeldist"] = tuple(float(x) for x in ld)
        config["model_conf"] = mc
    model = build_model(config, vocab)
    tx = build_tx(config)
    pre = build_preprocessor(config, token_list)
    collate = common_collate
    if config.get("model_type") == "pit":
        n_spk = config.get("n_spk", 2)
        tokenizer = build_tokenizer(
            config.get("token_type", "char"), bpemodel=config.get("bpemodel"),
            g2p_type=config.get("g2p"),
        )
        pre = CommonPreprocessor(
            tokenizer, TokenIDConverter(token_list),
            text_names=tuple(f"text_spk{i + 1}" for i in range(n_spk)),
        )

        def collate(samples):
            out = common_collate(samples)
            texts = [out.pop(f"text_spk{i + 1}") for i in range(n_spk)]
            lens = [out.pop(f"text_spk{i + 1}_lengths") for i in range(n_spk)]
            l_max = max(t.shape[1] for t in texts)
            texts = [
                np.pad(t, ((0, 0), (0, l_max - t.shape[1])), constant_values=-1)
                for t in texts
            ]
            out["text"] = np.stack(texts, axis=1)          # (B, n_spk, L)
            out["text_lengths"] = np.stack(lens, axis=1)   # (B, n_spk)
            return out

    train_ds = ESPnetDataset(train_data, preprocessor=pre)
    valid_ds = ESPnetDataset(valid_data, preprocessor=pre)

    # shapes for batching: from stats dir if present, else probe lengths
    if stats_dir and (Path(stats_dir) / "speech_shape").exists():
        shapes = read_shape_file(Path(stats_dir) / "speech_shape")
        # a stats dir computed on a superset (e.g. learning-curve subsets
        # reusing full-train stats) must not inject uids absent from this
        # manifest — batch only what the dataset can serve
        ds_keys = set(train_ds.keys)
        shapes = {k: v for k, v in shapes.items() if k in ds_keys}
        for uid in train_ds.keys:
            if uid not in shapes:
                s = train_ds[uid]
                arr = s.get("speech")
                shapes[uid] = arr.shape if arr is not None else (1,)
    else:
        shapes = {}
        for uid in train_ds.keys:
            s = train_ds[uid]
            arr = s.get("speech")
            shapes[uid] = arr.shape if arr is not None else (1,)

    # length filtering (≙ remove_longshortdata.sh / espnet2 filtering stage)
    if any(
        config.get(k) for k in
        ("min_frames", "max_frames", "min_tokens", "max_tokens")
    ):
        out_shapes = None
        if config.get("min_tokens") or config.get("max_tokens"):
            if stats_dir and (Path(stats_dir) / "text_shape").exists():
                out_shapes = read_shape_file(Path(stats_dir) / "text_shape")
            else:
                out_shapes = {
                    uid: (len(train_ds[uid].get("text", ())),)
                    for uid in train_ds.keys if uid in shapes
                }
        shapes, n_drop = filter_by_length(
            shapes,
            min_frames=int(config.get("min_frames") or 0),
            max_frames=config.get("max_frames"),
            out_shapes=out_shapes,
            min_tokens=int(config.get("min_tokens") or 0),
            max_tokens=config.get("max_tokens"),
        )
        if n_drop:
            logger.info("length filter dropped %d utterances", n_drop)
        if not shapes:
            raise ValueError(
                "length filter (min/max_frames, min/max_tokens) removed "
                "every training utterance — loosen the bounds"
            )

    num_splits = int(config.get("num_splits") or 1)
    if num_splits > 1:
        # corpus-split streaming for very large manifests
        # (reference abs_task.py:1567 build_multiple_iter_factory)
        from espnet_tpu.data.dataset import MultipleIterFactory

        train_iter = MultipleIterFactory(
            train_ds,
            shapes,
            num_splits=num_splits,
            batch_size=config.get("batch_size", 16),
            batch_bins=config.get("batch_bins"),
            mode=config.get("batch_mode", "seq"),
            seed=config.get("seed", 0),
            sortagrad=config.get("sortagrad", False),
            collate=collate,
        )
    else:
        categories = None
        if config.get("utt2category"):
            # reference 'category' grouping (batchfy.py:346 / espnet2
            # utt2category): utterances only batch within their label
            from espnet_tpu.data.kaldi_io import read_scp

            categories = read_scp(config["utt2category"])
        train_iter = SequenceIterFactory(
            train_ds,
            shapes,
            batch_size=config.get("batch_size", 16),
            batch_bins=config.get("batch_bins"),
            mode=config.get("batch_mode", "seq"),
            seed=config.get("seed", 0),
            sortagrad=config.get("sortagrad", False),
            collate=collate,
            categories=categories,
        )
    valid_shapes = {}
    for uid in valid_ds.keys:
        s = valid_ds[uid]
        arr = s.get("speech")
        valid_shapes[uid] = arr.shape if arr is not None else (1,)
    valid_iter = SequenceIterFactory(
        valid_ds, valid_shapes, batch_size=config.get("batch_size", 16),
        shuffle=False, collate=collate,
    )

    # adadelta eps-decay on validation regression (reference
    # asr_utils.adadelta_eps_decay:498 + CompareValueTrigger): shrink the
    # injected eps hyperparam when the best-key metric did not improve.
    scheduler_on_valid = None
    if config.get("optim") == "adadelta" and config.get("eps_decay"):
        decay = float(config["eps_decay"])

        def scheduler_on_valid(state, epoch, val, reporter):
            best = reporter.best_epoch("valid", config.get("best_key", "loss"))
            if best is not None and best != epoch:
                # walk the optax chain for the inject_hyperparams state
                # (its hyperparams dict is mutable within the pytree)
                def visit(os):
                    if hasattr(os, "hyperparams") and "eps" in os.hyperparams:
                        os.hyperparams["eps"] = os.hyperparams["eps"] * decay
                    elif isinstance(os, tuple):
                        for o in os:
                            visit(o)

                visit(state.opt_state)
            return state

    trainer = Trainer(
        model,
        tx,
        expdir=expdir,
        max_epoch=config.get("max_epoch", 10),
        patience=config.get("patience"),
        keep_nbest=config.get("keep_nbest", 5),
        best_key=config.get("best_key", "loss"),
        # acc-keyed selection maximizes (reference recog_model
        # model.acc.best); loss/cer/wer minimize
        best_mode=config.get(
            "best_mode",
            "max" if config.get("best_key", "loss") == "acc" else "min",
        ),
        log_interval=config.get("log_interval", 50),
        scheduler_on_valid=scheduler_on_valid,
        mesh=init_distributed_and_mesh(config),
    )

    # init params from one real batch
    first = next(iter(train_iter(1)))
    variables = model.init(
        jax.random.PRNGKey(config.get("seed", 0)),
        first["speech"],
        first["speech_lengths"],
        first["text"],
        first["text_lengths"],
    )
    # install global mvn stats (and persist them next to config.yaml so
    # build_model_from_file can restore them at decode time)
    if config.get("normalize") == "global_mvn" and stats_dir:
        import shutil

        mean, std = load_feat_stats(Path(stats_dir) / "feats_stats.npz")
        variables = dict(variables)
        variables["norm_stats"] = {"normalize": {"mean": mean, "std": std}}
        shutil.copy(
            Path(stats_dir) / "feats_stats.npz", Path(expdir) / "feats_stats.npz"
        )

    # `init:` scheme re-init and/or `init_param:` transfer grafting
    # (reference asr_init.py --enc-init/--dec-init, espnet2 --init_param)
    from espnet_tpu.train.init_params import apply_param_init, model_summary

    variables = apply_param_init(variables, config)
    logging.info(model_summary(variables["params"]))

    save_yaml(Path(expdir) / "config.yaml", {**config, "token_list": token_list})
    state = trainer.init_state(variables, seed=config.get("seed", 0))
    state = trainer.resume(state)
    state = trainer.run(state, train_iter, valid_iter)
    trainer.average_best_params(state)
    return trainer


def build_model_from_file(config_file, ckpt_file):
    """(config.yaml, ckpt) → (model, variables, token_list)
    (reference abs_task.py:1709)."""
    config = load_yaml(config_file)
    token_list = config["token_list"]
    vocab = len(token_list)
    model = build_model(config, vocab)
    # build variable skeleton with a dummy batch
    d = config.get("input_size", 80)
    if config.get("frontend") == "default":
        dummy = np.zeros((1, 1600), dtype=np.float32)
        lens = np.array([1600], dtype=np.int32)
    elif config.get("frontend") == "beamformer":
        n_ch = config.get("frontend_conf", {}).get("channels", 2)
        dummy = np.zeros((1, 1600, n_ch), dtype=np.float32)
        lens = np.array([1600], dtype=np.int32)
    else:
        dummy = np.zeros((1, 40, d), dtype=np.float32)
        lens = np.array([40], dtype=np.int32)
    if config.get("model_type") == "pit":
        n_spk = config.get("n_spk", 2)
        ys = np.ones((1, n_spk, 1), dtype=np.int32)
        ylens = np.ones((1, n_spk), dtype=np.int32)
    else:
        ys = np.array([[1]], dtype=np.int32)
        ylens = np.array([1], dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), dummy, lens, ys, ylens)
    stats_npz = Path(config_file).parent / "feats_stats.npz"
    if config.get("normalize") == "global_mvn" and not stats_npz.exists():
        logger.warning(
            "normalize: global_mvn but %s is missing — features will be "
            "UN-normalized and decode quality will degrade (pack the "
            "stats next to config.yaml)", stats_npz,
        )
    if config.get("normalize") == "global_mvn" and stats_npz.exists():
        mean, std = load_feat_stats(stats_npz)
        variables = dict(variables)
        variables["norm_stats"] = {"normalize": {"mean": mean, "std": std}}
    from espnet_tpu.train.checkpoint import load_checkpoint

    target = jax.tree_util.tree_map(np.asarray, variables["params"])
    try:
        params = load_checkpoint(ckpt_file, target)
        variables = {**variables, "params": params}
    except Exception:
        # ckpt may be a full TrainState; extract params
        import pickle

        with open(ckpt_file, "rb") as f:
            sd = pickle.load(f)
        from flax import serialization

        params = serialization.from_state_dict(target, sd["params"])
        if "extra_vars" in sd and sd["extra_vars"]:
            for k, v in sd["extra_vars"].items():
                variables[k] = v
        variables = {**variables, "params": params}
    return model, variables, token_list
