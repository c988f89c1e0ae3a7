"""Shape-filtered pretrained parameter loading.

Equivalent of ``utils/train_util.py:17-30`` ``load_pretrained_model``: merge a
pretrained checkpoint's params into a freshly initialized tree, keeping only
leaves whose path exists AND whose shape matches — this is how the reference
warm-starts encoders/decoders/whole models and loads the pretrained global
sentence VAE (``pytorch_runner_vae.py:40-72``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np


def flatten_params(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def unflatten_params(flat: Dict[Tuple[str, ...], Any]) -> Any:
    tree: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf
    return tree


def merge_pretrained(params: Any, pretrained: Any,
                     log=print) -> Tuple[Any, int, int]:
    """Returns (merged, n_loaded, n_total). Only shape-matching paths load."""
    flat = flatten_params(params)
    flat_pre = flatten_params(pretrained)
    loaded = 0
    for path, leaf in flat.items():
        if path in flat_pre:
            cand = flat_pre[path]
            if np.shape(cand) == np.shape(leaf):
                flat[path] = cand
                loaded += 1
            else:
                log(f"skip {'/'.join(path)}: shape "
                    f"{np.shape(cand)} != {np.shape(leaf)}")
    return unflatten_params(flat), loaded, len(flat)


def load_subtree(params: Any, pretrained: Any, subtree: str, log=print):
    """Load a pretrained tree into a named submodule (e.g. 'encoder'),
    mirroring pretrained_encoder / pretrained_decoder config keys."""
    if subtree not in params:
        log(f"no submodule {subtree!r} in target params")
        return params, 0, 0
    merged, n, total = merge_pretrained(params[subtree], pretrained, log)
    out = dict(params)
    out[subtree] = merged
    return out, n, total
