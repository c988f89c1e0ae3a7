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


def unwrap_torch_state_dict(obj):
    """Normalize a loaded torch checkpoint into a flat state dict: unwrap
    the reference's ``{"model": ...}`` save shape (pytorch_runner_vae.py:
    380-388) and module objects with ``.state_dict()``."""
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj


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


# --------------------------------------------------------------------- #
# Full AC-VAE torch checkpoint conversion (reference-trained .pth import)
# --------------------------------------------------------------------- #
#
# The reference's evaluate/warm-start flow consumes arbitrary trained model
# state dicts (runners/base_runner.py:209-216 ``torch.load(best.pth)`` →
# ``load_state_dict``; utils/train_util.py:17-30 shape-filtered).  The
# per-module weight layouts were pinned by the golden parity tests
# (tests/test_module_parity.py); this consolidates them into one converter
# so a reference-trained checkpoint imports as flax variables.


def _t_linear(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.Linear [out,in] -> flax Dense {kernel [in,out], bias}."""
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _t_rnn(sd: Dict[str, Any], prefix: str, suffix: str = "") -> Dict[str, Any]:
    """torch nn.GRU/nn.LSTM layer 0 (or GRUCell/LSTMCell without the _l0) ->
    our rnn.py cell params {wi,wh,bi,bh} ([in,gates·H] / [H,gates·H]).
    Gate order is torch's (GRU r,z,n with separate bh; LSTM i,f,g,o) — the
    cells were written to torch semantics (tests/test_module_parity.py)."""
    l0 = f"{prefix}.weight_ih_l0{suffix}"
    key = (lambda p: f"{prefix}.{p}_l0{suffix}") if l0 in sd \
        else (lambda p: f"{prefix}.{p}{suffix}")
    return {"wi": np.ascontiguousarray(sd[key("weight_ih")].T),
            "wh": np.ascontiguousarray(sd[key("weight_hh")].T),
            "bi": sd[key("bias_ih")], "bh": sd[key("bias_hh")]}


def _t_bigru(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    out = {"fwd": _t_rnn(sd, prefix)}
    if f"{prefix}.weight_ih_l0_reverse" in sd:
        out["bwd"] = _t_rnn(sd, prefix, "_reverse")
    return out


def _t_attn(sd: Dict[str, Any], prefix: str, dec_dim: int) -> Dict[str, Any]:
    """Seq2SeqAttention (attn_model.py:6-46) -> AdditiveAttention.  torch
    concatenates [h_dec; h_enc] into one ``h2attn`` Linear; ours splits it
    into dec_proj (first ``dec_dim`` columns, no bias) + enc_proj (+bias)."""
    W = sd[prefix + ".h2attn.weight"]  # [A, dec+enc]
    return {"dec_proj": {"kernel": np.ascontiguousarray(W[:, :dec_dim].T)},
            "enc_proj": {"kernel": np.ascontiguousarray(W[:, dec_dim:].T),
                         "bias": sd[prefix + ".h2attn.bias"]},
            "v": sd[prefix + ".v"]}


def _t_embedding(sd: Dict[str, Any], prefix: str, log=print) -> Dict[str, Any]:
    """nn.Embedding — or the Sequential(Embedding, Linear) the reference
    builds for frozen-pretrained tables with projection
    (text_encoder.py:44-51)."""
    if prefix + ".weight" in sd:
        return {"embedding": sd[prefix + ".weight"]}
    if prefix + ".0.weight" in sd:
        if prefix + ".1.weight" in sd:
            log(f"skip {prefix}.1 (pretrained-embedding projection has no "
                "flax counterpart; table loads, projection is dropped)")
        return {"embedding": sd[prefix + ".0.weight"]}
    return {}


def _t_mha(sd: Dict[str, Any], prefix: str, nhead: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.
    in_proj [3E,E] rows are [q;k;v]; flax wants per-head kernels
    [E, H, E/H] (query/key/value) and out kernel [H, E/H, E]."""
    W = sd[prefix + ".in_proj_weight"]
    b = sd.get(prefix + ".in_proj_bias")
    E = W.shape[1]
    hd = E // nhead

    def qkv(i):
        w = W[i * E:(i + 1) * E]          # [E_out, E_in]
        p = {"kernel": np.ascontiguousarray(w.T).reshape(E, nhead, hd)}
        if b is not None:
            p["bias"] = b[i * E:(i + 1) * E].reshape(nhead, hd)
        return p

    Wo = sd[prefix + ".out_proj.weight"]  # [E, concat]
    out = {"query": qkv(0), "key": qkv(1), "value": qkv(2),
           "out": {"kernel": np.ascontiguousarray(Wo.T).reshape(nhead, hd, E)}}
    if prefix + ".out_proj.bias" in sd:
        out["out"]["bias"] = sd[prefix + ".out_proj.bias"]
    return out


def _t_layernorm(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _sub(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def _convert_posterior(sd: Dict[str, Any], log=print) -> Dict[str, Any]:
    """PosteriorRNN (text_encoder.py:96-154), PosteriorRNN_hybrid (:156-216)
    and the sentence posterior — they share (embedding, BiGRU, linear heads);
    which heads exist distinguishes them, so convert whatever is present."""
    out: Dict[str, Any] = {"word_embedding": _t_embedding(sd, "word_embedding",
                                                          log)}
    if "network.weight_ih_l0" in sd:
        out["network"] = _t_bigru(sd, "network")
    for head in ("mean_log_out", "token_mean_log", "utterance_mean_log"):
        if head + ".weight" in sd:
            out[head] = _t_linear(sd, head)
    return out


def _convert_prior(sd: Dict[str, Any], word_dim: int, log=print) -> Dict[str, Any]:
    """PriorRNN (text_encoder.py:218-268): embedding, word→audio attention
    (query dim = word_dim, so dec columns come first), LSTM, (μ,logσ²) head."""
    out: Dict[str, Any] = {"word_embedding": _t_embedding(sd, "word_embedding",
                                                          log)}
    if "word_attn.h2attn.weight" in sd:
        out["word_attn"] = _t_attn(sd, "word_attn", word_dim)
    if "network.weight_ih_l0" in sd or "network.weight_ih" in sd:
        out["network"] = _t_rnn(sd, "network")
    if "mean_log_out.weight" in sd:
        out["mean_log_out"] = _t_linear(sd, "mean_log_out")
    if "mixture_logits" in sd:
        out["mixture_logits"] = sd["mixture_logits"]
    return out


def _convert_rnn_decoder(sd: Dict[str, Any], hidden_size: int,
                         log=print) -> Dict[str, Any]:
    """RNNDecoder / RNNBahdanauAttnDecoder / VAERNNBahdanauAttnDecoder
    (decoder.py:28-98,129-203): embedding, attention (query = decoder state,
    dim hidden_size), GRU (torch names it ``model``; ours ``cell``),
    classifier."""
    out: Dict[str, Any] = {
        "word_embeddings": _t_embedding(sd, "word_embeddings", log)}
    if "attn.h2attn.weight" in sd:
        out["attn"] = _t_attn(sd, "attn", hidden_size)
    if "model.weight_ih_l0" in sd or "model.weight_ih" in sd:
        out["cell"] = _t_rnn(sd, "model")
    if "classifier.weight" in sd:
        out["classifier"] = _t_linear(sd, "classifier")
    return out


def _convert_transformer_decoder(sd: Dict[str, Any], nhead: int,
                                 log=print) -> Dict[str, Any]:
    """TransformerDecoder / VAETransformerDecoder (decoder.py:225-332):
    embedding + N torch nn.TransformerDecoderLayer (self_attn, multihead_attn
    = cross attention, linear1/2, norm1-3) + outputlayer."""
    out: Dict[str, Any] = {
        "word_embeddings": _t_embedding(sd, "word_embeddings", log)}
    i = 0
    while f"model.layers.{i}.self_attn.in_proj_weight" in sd:
        lp = f"model.layers.{i}"
        out[f"layer{i}"] = {
            "self_attn": _t_mha(sd, f"{lp}.self_attn", nhead),
            "cross_attn": _t_mha(sd, f"{lp}.multihead_attn", nhead),
            "linear1": _t_linear(sd, f"{lp}.linear1"),
            "linear2": _t_linear(sd, f"{lp}.linear2"),
            "norm1": _t_layernorm(sd, f"{lp}.norm1"),
            "norm2": _t_layernorm(sd, f"{lp}.norm2"),
            "norm3": _t_layernorm(sd, f"{lp}.norm3"),
        }
        i += 1
    if "outputlayer.weight" in sd:
        out["outputlayer"] = _t_linear(sd, "outputlayer")
    return out


def _looks_like_acvae(state_dict: Dict[str, Any]) -> bool:
    """A full reference model dict: submodule-prefixed keys."""
    return any(k.startswith(("decoder.", "qnet.", "pnet."))
               for k in state_dict)


def acvae_to_flax(state_dict: Dict[str, Any], conf: Dict[str, Any],
                  log=print) -> Dict[str, Any]:
    """Convert a reference-trained AC-VAE model state dict into flax
    variables ``{"params", "batch_stats"}`` for ``build_model(conf, ...)``.

    Covers VAEModel / Hybrid_VAEModel / SimpleVAEModel / Seq2SeqAttnModel /
    TransformerModel and the RNN+transformer decoder families; the encoder
    subtree goes through :func:`pann_to_flax` (Cnn10/Cnn14/ResNet38).
    Anything unrecognized is skipped with a log line and dropped by the
    shape-filtered merge downstream — the same policy as the reference's
    ``load_pretrained_model`` (utils/train_util.py:17-30).
    """
    sd = state_dict.get("model", state_dict)
    sd = {k[len("module."):] if k.startswith("module.") else k:
          np.asarray(getattr(v, "numpy", lambda: v)()
                     if hasattr(v, "numpy") else v)
          for k, v in sd.items()}

    dec_args = conf.get("decoder_args", {})
    embed_size = int(dec_args.get("embed_size", 256))
    hidden_size = int(dec_args.get("hidden_size", embed_size))
    nhead = int(dec_args.get("nhead", 4))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    enc_sd = _sub(sd, "encoder")
    if enc_sd:
        if _looks_like_pann(enc_sd):
            enc = pann_to_flax(enc_sd)
            params["encoder"] = enc["params"]
            stats["encoder"] = enc["batch_stats"]
        else:
            log("skip encoder.*: not a PANN-family backbone "
                "(convert separately or rely on shape-filtered merge)")

    dec_sd = _sub(sd, "decoder")
    if dec_sd:
        if any(k.startswith("model.layers.") for k in dec_sd):
            params["decoder"] = _convert_transformer_decoder(dec_sd, nhead,
                                                             log)
        else:
            params["decoder"] = _convert_rnn_decoder(dec_sd, hidden_size, log)

    q_sd = _sub(sd, "qnet")
    if q_sd:
        params["qnet"] = _convert_posterior(q_sd, log)
    p_sd = _sub(sd, "pnet")
    if p_sd:
        # word_attn query dim = the prior's word embedding dim, which the
        # reference constructs as Textdecoder.embed_size (vae_model.py:22-28)
        params["pnet"] = _convert_prior(p_sd, embed_size, log)

    for lin in ("ln", "mean_log_out", "output_transform"):
        if f"{lin}.weight" in sd:
            params[lin] = _t_linear(sd, lin)

    handled = set()
    for top in ("encoder", "decoder", "qnet", "pnet"):
        handled.update(k for k in sd if k.startswith(top + "."))
    for lin in ("ln", "mean_log_out", "output_transform"):
        handled.update(k for k in sd if k.startswith(lin + "."))
    for k in sorted(set(sd) - handled):
        log(f"unmapped key {k} (dropped)")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------- #
# ESPnet ASR encoder checkpoint conversion (E2EASREncoder warm-start)
# --------------------------------------------------------------------- #

def _looks_like_espnet(state_dict: Dict[str, Any]) -> bool:
    """ESPnet VGG2L+RNNP encoder naming (espnet/nets/pytorch_backend/rnn/
    encoders.py): conv1_1..conv2_2 + birnn{i}/bt{i}, possibly under
    ``enc.enc.{0,1}.`` (a full e2e_asr.E2E dict) or ``enc.{0,1}.``."""
    return any(k.endswith("conv1_1.weight") for k in state_dict) and \
        any(".birnn0." in k or ".bt0." in k or k.startswith(("birnn0", "bt0"))
            for k in state_dict)


def espnet_to_flax(state_dict: Dict[str, Any], inputdim: int = 64,
                   log=print) -> Dict[str, Any]:
    """Convert an ESPnet ``vggbgrup`` encoder checkpoint into params for our
    native :class:`~acvae_tpu.models.encoders.E2EASREncoder`.

    The reference wraps a *pretrained* espnet encoder
    (``models/encoder.py:14-54`` ``load_espnet_encoder`` →
    ``E2E(...).enc``); our architecture is the same family built
    in-framework, so the conversion is mechanical except for one layout
    fact: espnet's VGG2L flattens the conv output **channel-major**
    (``[N,C,T,F'] → [N,T,C·F']``) while ours is **freq-major**
    (``[N,T,F',C] → [N,T,F'·C]``), so the first GRU layer's input weights
    get a column permutation.  LSTM-flavored checkpoints (``vggblstmp``,
    the espnet default) are NOT convertible into the GRU architecture —
    their 4H gate blocks fail the shape filter downstream and a log line
    says why.
    """
    sd = state_dict.get("model", state_dict)
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()
                        if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    # normalize prefixes: enc.enc.N. (full E2E) / enc.N. (Encoder) / N.
    for pre in ("enc.enc.", "enc."):
        if any(k.startswith(pre + "0.") for k in sd):
            sd = {k[len(pre):]: v for k, v in sd.items()
                  if k.startswith(pre)}
            break

    params: Dict[str, Any] = {}
    # VGG2L convs: espnet conv{stage}_{j} -> vgg{stage-1}_conv{j}
    for stage in (1, 2):
        for j in (1, 2):
            tkey = f"0.conv{stage}_{j}"
            if tkey + ".weight" in sd:
                params[f"vgg{stage - 1}_conv{j}"] = {
                    "kernel": sd[tkey + ".weight"].transpose(2, 3, 1, 0),
                    "bias": sd[tkey + ".bias"]}

    # channel-major -> freq-major input permutation for the first RNN layer.
    # espnet's get_vgg2l_odim applies ceil(ceil(d/2)/2) — two ceil-halvings;
    # our E2EASREncoder pools with VALID padding (floor semantics), so the
    # two layouts only agree when inputdim % 4 == 0 (e.g. the 64-dim mels
    # this framework uses).  For espnet's common 83-dim fbank the flattened
    # features could never align with our encoder — reject loudly instead
    # of silently mis-permuting the first GRU layer's input weights.
    if inputdim % 4 != 0:
        raise ValueError(
            f"espnet_to_flax: inputdim={inputdim} is not divisible by 4 — "
            f"espnet's VGG2L ceil-pools the freq axis "
            f"(ceil(ceil({inputdim}/2)/2)={-(-(-(-inputdim // 2)) // 2)}) "
            f"while E2EASREncoder floor-pools "
            f"({inputdim // 4}), so the flattened RNN input layouts "
            f"cannot be reconciled; re-extract features at a multiple-of-4 "
            f"mel dim (espnet_inputdim config key)")
    fp = inputdim // 4  # post-pool freq bins (== espnet's, given the check)
    c_out = 128         # VGG2L's fixed top channel count
    perm = np.array([c * fp + f for f in range(fp) for c in range(c_out)])

    i = 0
    while f"1.birnn{i}.weight_ih_l0" in sd or f"1.rnn{i}.weight_ih_l0" in sd:
        base = f"1.birnn{i}" if f"1.birnn{i}.weight_ih_l0" in sd \
            else f"1.rnn{i}"
        gates = sd[base + ".weight_ih_l0"].shape[0]
        hidden3 = 3 * (sd[base + ".weight_hh_l0"].shape[1])
        if gates != hidden3:
            log(f"skip {base}: {gates // (hidden3 // 3)}-gate RNN is not a "
                "GRU (vggblstmp checkpoint?) — our E2EASREncoder is the "
                "vggbgrup flavor")
            i += 1
            continue

        def cell(suffix):
            c = _t_rnn(sd, base, suffix)
            if i == 0:
                c["wi"] = np.ascontiguousarray(c["wi"][perm])
            return c

        layer = {"fwd": cell("")}
        if base + ".weight_ih_l0_reverse" in sd:
            layer["bwd"] = cell("_reverse")
        params[f"bgru{i}"] = layer
        if f"1.bt{i}.weight" in sd:
            params[f"proj{i}"] = _t_linear(sd, f"1.bt{i}")
        i += 1
    if i == 0:
        log("no RNNP layers found — not a VGG2L+RNNP encoder dict?")
    return {"params": params, "batch_stats": {}}
