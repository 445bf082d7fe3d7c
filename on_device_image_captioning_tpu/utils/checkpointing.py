"""Checkpoint save/load: full training session state with rotation and resume.

Rebuild of the reference checkpoint subsystem (reference utils/saving_utils.py:8-128):
a checkpoint carries model params + optimizer state + step + the DATA-LOADER CURSOR
so a restart resumes mid-epoch at the exact batch; files are timestamped
`checkpoint_<ts>_epoch{E}it{I}bs{B}_{tag}_` with rotation keeping the newest
`num_max_checkpoints`; `load_most_recent` scans the directory.

Serialization is msgpack-over-numpy via flax.serialization (single-host; the
arrays in this model are small enough that sharded OCDBT adds only complexity —
multi-host sharded checkpointing can layer orbax on the same tree later).

Partial loads (reference utils/saving_utils.py:113-128) and the layer-removal
surgery (reference train.py:305-342) live in params/surgery.py.
"""
from __future__ import annotations

import os
import re
from datetime import datetime
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_FMT = "%Y-%m-%d-%H.%M.%S.%f"  # sub-second so rapid saves never collide
# (':' is not portable in filenames; the reference used ':' and 1s resolution)
_NAME = re.compile(r"^checkpoint_(?P<ts>[^_]+)_epoch\d+it\d+bs\d+_(?P<info>[^_]+)_$")


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    save_dir: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    data_loader_state: Optional[Dict] = None,
    additional_info: str = "noinfo",
    num_max_checkpoints: int = 3,
    epoch_it: int = 0,
    batch_it: int = 0,
    batch_size: int = 0,
    verbose: bool = False,
) -> str:
    """Write a rotating checkpoint; returns the new file path."""
    from flax import serialization

    os.makedirs(save_dir, exist_ok=True)
    # to_state_dict converts NamedTuple optimizer states / tuples into plain
    # dicts that msgpack can serialize; from_state_dict inverts it on load
    payload = {
        "params": serialization.to_state_dict(_to_numpy(params)),
        "opt_state": (
            serialization.to_state_dict(_to_numpy(opt_state))
            if opt_state is not None
            else None
        ),
        "step": int(step),
        "data_loader_state": data_loader_state,
    }

    existing = sorted(
        f for f in os.listdir(save_dir) if f.startswith("checkpoint_") and _NAME.match(f)
    )
    stamped = []
    for f in existing:
        m = _NAME.match(f)
        stamped.append((datetime.strptime(m.group("ts"), _FMT), f))
    stamped.sort()
    if len(stamped) >= num_max_checkpoints and stamped:
        os.remove(os.path.join(save_dir, stamped[0][1]))

    name = (
        f"checkpoint_{datetime.now().strftime(_FMT)}"
        f"_epoch{epoch_it}it{batch_it}bs{batch_size}_{additional_info}_"
    )
    path = os.path.join(save_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    if verbose:
        print(f"Saved to {name}", flush=True)
    return path


def _relistify(tree):
    """Invert to_state_dict's list->{'0': ...} encoding so layer stacks index as
    lists again when no template is available."""
    if isinstance(tree, dict):
        out = {k: _relistify(v) for k, v in tree.items()}
        if out and all(k.isdigit() for k in out):
            return [out[str(i)] for i in range(len(out))]
        return out
    return tree


def load_checkpoint(path: str, template: Optional[Any] = None) -> Dict:
    """Load a checkpoint file. With `template` (a {'params':..., 'opt_state':...}
    pytree), leaves are restored to the template's structure/dtypes; without one,
    integer-keyed dicts are converted back to lists."""
    from flax import serialization

    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    for key in ("params", "opt_state"):
        if template is not None and template.get(key) is not None and payload.get(key) is not None:
            payload[key] = serialization.from_state_dict(template[key], payload[key])
    if template is None and payload.get("params") is not None:
        payload["params"] = _relistify(payload["params"])
        # opt_state stays in raw state-dict form: its NamedTuple structure can
        # only be rebuilt against a template via from_state_dict
    return payload


def load_most_recent(
    save_dir: str, template: Optional[Any] = None, verbose: bool = False
) -> Tuple[Optional[Dict], str]:
    """Scan the directory for the newest checkpoint (reference
    utils/saving_utils.py:8-52). Returns (payload|None, additional_info)."""
    if not os.path.isdir(save_dir):
        return None, "no_additional_info"
    newest = None
    info = "no_additional_info"
    for f in os.listdir(save_dir):
        m = _NAME.match(f)
        if not m:
            continue
        ts = datetime.strptime(m.group("ts"), _FMT)
        if newest is None or ts > newest[0]:
            newest = (ts, f)
            info = m.group("info")
    if newest is None:
        if verbose:
            print(f"Loading: no checkpoint found in {save_dir}", flush=True)
        return None, info
    if verbose:
        print(f"Loading: {os.path.join(save_dir, newest[1])}", flush=True)
    return load_checkpoint(os.path.join(save_dir, newest[1]), template), info
