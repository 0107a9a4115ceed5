"""CLI: corpus perplexity of a trained LM
(reference: espnet2/bin/lm_calc_perplexity.py)."""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path


def main(argv=None):
    from espnet_tpu.utils.env import apply_jax_platform_env

    apply_jax_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", action="append", default=[])
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.data.dataset import ESPnetDataset, SequenceIterFactory
    from espnet_tpu.tasks.asr import build_preprocessor
    from espnet_tpu.tasks.lm import build_lm, calc_perplexity
    from espnet_tpu.train.checkpoint import load_checkpoint
    from espnet_tpu.utils.config import load_yaml

    import jax
    import numpy as np

    config = load_yaml(args.config)
    token_list = config["token_list"]
    model = build_lm(config, len(token_list))
    pre = build_preprocessor(config, token_list)
    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data, preprocessor=pre)
    shapes = {uid: ds[uid]["text"].shape for uid in ds.keys}
    it = SequenceIterFactory(ds, shapes, batch_size=args.batch_size, shuffle=False)

    ys = np.array([[1, 2]], dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), ys, np.array([2], dtype=np.int32))
    target = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = load_checkpoint(args.ckpt, target)
    ppl = calc_perplexity(model, {"params": params}, it(1))
    logging.info("perplexity: %.3f", ppl)
    if args.output_dir:
        out = Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "perplexity").write_text(json.dumps({"ppl": ppl}))
    return ppl


if __name__ == "__main__":
    main()
