"""ESPnet1 data.json manifest support (reference: SURVEY A.1;
utils/data2json.sh + merge_scp2json.py:166-180; consumed by
espnet/utils/training/batchfy.py make_batchset).

Format: {"utts": {uttid: {"input": [{"feat": "path.ark:offset",
"filetype": ..., "name": "input1", "shape": [T, D]}], "output":
[{"name": "target1", "tokenid": "1 2 3", "shape": [L, odim]}],
"utt2spk": ...}}}.

Data dirs prepared for the reference load unchanged; we also write the
format so our collect-stats output can feed reference tooling.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from espnet_tpu.data.kaldi_io import load_scp_entry


def read_data_json(path) -> Dict[str, dict]:
    """→ {uttid: utt_entry} ('utts' unwrapped)."""
    return json.loads(Path(path).read_text())["utts"]


def write_data_json(
    path,
    feats_scp: Dict[str, str],
    texts_tokenids: Dict[str, Sequence[int]],
    shapes: Dict[str, Tuple[int, ...]],
    odim: int,
    utt2spk: Optional[Dict[str, str]] = None,
    filetype: str = "mat",
):
    """Build the manifest from scp + tokenized text (≙ data2json.sh)."""
    utts = {}
    for uid, feat in feats_scp.items():
        ids = list(texts_tokenids[uid])
        utts[uid] = {
            "input": [
                {
                    "feat": feat,
                    "filetype": filetype,
                    "name": "input1",
                    "shape": list(shapes[uid]),
                }
            ],
            "output": [
                {
                    "name": "target1",
                    "tokenid": " ".join(str(i) for i in ids),
                    "shape": [len(ids), odim],
                }
            ],
            "utt2spk": (utt2spk or {}).get(uid, "spk1"),
        }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps({"utts": utts}, indent=2))


class Espnet1JsonDataset:
    """Random-access dataset over a data.json manifest; yields the same
    {"speech": (T, D), "text": (L,)} dicts as ESPnetDataset, so the iter
    factories, collate, and trainer work unchanged."""

    def __init__(self, json_path):
        self.utts = read_data_json(json_path)
        self.keys: List[str] = list(self.utts.keys())

    def __len__(self):
        return len(self.keys)

    def shapes(self) -> Dict[str, Tuple[int, ...]]:
        """Input shapes from the manifest (no IO) for batch planning —
        the property make_batchset relies on."""
        return {
            uid: tuple(e["input"][0]["shape"]) for uid, e in self.utts.items()
        }

    def __getitem__(self, uid: str) -> Dict[str, np.ndarray]:
        e = self.utts[uid]
        inp = e["input"][0]
        ft = inp.get("filetype", "mat")
        if ft == "mat":
            speech = load_scp_entry(inp["feat"])
        elif ft == "sound":
            from espnet_tpu.data.wav import read_wav

            _, speech = read_wav(inp["feat"])
        else:
            raise ValueError(f"unsupported filetype {ft}")
        out = e["output"][0]
        text = np.array([int(x) for x in out["tokenid"].split()], dtype=np.int32)
        return {"speech": np.asarray(speech, np.float32), "text": text}
