"""Shape-filtered pretrained parameter loading.

Equivalent of ``utils/train_util.py:17-30`` ``load_pretrained_model``: merge a
pretrained checkpoint's params into a freshly initialized tree, keeping only
leaves whose path exists AND whose shape matches — this is how the reference
warm-starts encoders/decoders/whole models and loads the pretrained global
sentence VAE (``pytorch_runner_vae.py:40-72``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

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


# --------------------------------------------------------------------- #
# PANN torch checkpoint conversion
# --------------------------------------------------------------------- #

def _looks_like_pann(state_dict: Dict[str, Any]) -> bool:
    return any(k.startswith("conv_block") or k.startswith("resnet.")
               for k in state_dict)


def pann_to_flax(state_dict: Dict[str, Any],
                 arch: str | None = None) -> Dict[str, Any]:
    """Convert a torch PANN audio-tagger checkpoint (Cnn10 / Cnn14_16k /
    ResNet38 — the pretrained backbones the reference warm-starts from,
    ``models/encoder.py:651-707,871-964,1169-1232`` and the smoke test's
    ``ResNet38_mAP=0.434.pth``, ``encoder.py:1351-1362``) into flax variable
    trees ``{"params": ..., "batch_stats": ...}`` matching our encoders.

    Conv weights transpose OIHW→HWIO, linear weights [out,in]→[in,out];
    BatchNorm weight/bias→scale/bias and running stats→batch_stats.
    Keys with no counterpart here (spectrogram frontend, ``fc_audioset``
    tagger head) are skipped — the same thing the reference's shape-filtered
    loader does (``utils/train_util.py:17-30``).
    """
    sd = state_dict.get("model", state_dict)
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()
                        if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    if arch is None:
        if any(k.startswith("resnet.") for k in sd):
            arch = "ResNet38"
        elif any(k.startswith("conv_block6") for k in sd):
            arch = "Cnn14"
        else:
            arch = "Cnn10"

    params: Dict[Tuple[str, ...], Any] = {}
    stats: Dict[Tuple[str, ...], Any] = {}

    def conv(tkey: str, path: Tuple[str, ...]):
        if tkey in sd:
            k = sd[tkey].transpose(2, 3, 1, 0)
            if k.shape[2] == 1:
                # stem lane padding (encoders._stage_mel): our PANN-family
                # stems take STEM_LANE_PAD zero-padded input channels, so
                # pad the converted 1-channel kernel with zero columns —
                # numerically identical output
                from acvae_tpu.models.encoders import STEM_LANE_PAD
                k = np.pad(k, ((0, 0), (0, 0), (0, STEM_LANE_PAD - 1),
                               (0, 0)))
            params[path + ("kernel",)] = k

    def bn(tprefix: str, path: Tuple[str, ...]):
        if tprefix + ".weight" in sd:
            params[path + ("scale",)] = sd[tprefix + ".weight"]
            params[path + ("bias",)] = sd[tprefix + ".bias"]
            stats[path + ("mean",)] = sd[tprefix + ".running_mean"]
            stats[path + ("var",)] = sd[tprefix + ".running_var"]

    def linear(tprefix: str, path: Tuple[str, ...]):
        if tprefix + ".weight" in sd:
            params[path + ("kernel",)] = sd[tprefix + ".weight"].T
            if tprefix + ".bias" in sd:
                params[path + ("bias",)] = sd[tprefix + ".bias"]

    def conv_block(tname: str, ours: str):
        for j in (1, 2):
            conv(f"{tname}.conv{j}.weight", (ours, f"conv{j}"))
            bn(f"{tname}.bn{j}", (ours, f"bn{j}"))

    bn("bn0", ("_MelBatchNorm_0", "bn0"))
    if arch == "Cnn10":
        for i, c in enumerate((64, 128, 256, 512)):
            conv_block(f"conv_block{i + 1}", f"block{i}_{c}")
        # the reference renames PANN's fc1 head to embed_pooled
        linear("embed_pooled", ("embed_pooled",))
        linear("fc1", ("embed_pooled",))
    elif arch == "Cnn14":
        for i, c in enumerate((64, 128, 256, 512, 1024, 2048)):
            conv_block(f"conv_block{i + 1}", f"block{c}")
        linear("fc1", ("fc1",))
    elif arch == "ResNet38":
        conv_block("conv_block1", "block64")
        for layer, blocks in enumerate((3, 4, 6, 3), start=1):
            for b in range(blocks):
                t, ours = f"resnet.layer{layer}.{b}", f"layer{layer}_{b}"
                for j in (1, 2):
                    conv(f"{t}.conv{j}.weight", (ours, f"conv{j}"))
                    bn(f"{t}.bn{j}", (ours, f"bn{j}"))
                conv(f"{t}.downsample.0.weight", (ours, "ds_conv"))
                bn(f"{t}.downsample.1", (ours, "ds_bn"))
        conv_block("conv_block_after1", "block2048")
        linear("fc1", ("fc1",))
    else:
        raise ValueError(f"unknown PANN arch {arch!r}")
    return {"params": unflatten_params(params),
            "batch_stats": unflatten_params(stats)}
