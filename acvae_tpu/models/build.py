"""Config → model factory.

Equivalent of the reference's ``Runner._get_model``
(``runners/pytorch_runner_vae.py:32-73``): encoder, decoder and model are
resolved by string name (formalized through the registries) and composed.
Reference model names are accepted verbatim (``VAEModel``, ``Hybrid_VAEModel``,
``SimpleVAEModel``, ...) so reference YAML configs port directly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from acvae_tpu.core.registry import DECODERS, ENCODERS, LATENTS, MODELS
from acvae_tpu.models.captioner import AttnCaptionModel, TransformerCaptionModel
from acvae_tpu.models.trans_vae import TransVAECaptionModel
from acvae_tpu.models.vae import SimpleVAECaptionModel, VAECaptionModel


def _build_encoder(cfg: Dict[str, Any], data_dim: int):
    args = dict(cfg.get("encoder_args", {}))
    name = cfg.get("encodermodel", "Cnn10")
    # composite encoders take sub-encoder specs: PreTrainedCNN(trunk=...),
    # CNN10CRNNEncoder(crnn=..., cnn=...) — the reference composes these
    # in-code (encoder.py:148-160,577-583); here they are config-addressable.
    for key in ("trunk", "crnn", "cnn"):
        if isinstance(args.get(key), dict):
            sub = dict(args[key])
            args[key] = ENCODERS.build(sub.pop("name"), inputdim=data_dim,
                                       **sub)
    return ENCODERS.build(name, inputdim=data_dim, **args)


def _build_decoder(cfg: Dict[str, Any], vocab_size: int, enc_mem_size: int):
    args = dict(cfg.get("decoder_args", {}))
    name = cfg.get("decoder", "VAERNNBahdanauAttnDecoder")
    return DECODERS.build(name, vocab_size=vocab_size,
                          enc_mem_size=enc_mem_size, **args)


def _build_latent(name: str, args: Dict[str, Any], vocab_size: int,
                  embed_size: int, audiofeats_size: Optional[int] = None):
    kwargs = dict(word_dim=embed_size, embed_size=embed_size,
                  vocab_size=vocab_size, **args)
    if audiofeats_size is not None:
        kwargs.setdefault("audiofeats_size", audiofeats_size)
    # drop kwargs the latent module doesn't take (reference passes rnn_type
    # etc. through **kwargs; our modules are GRU/LSTM-typed already)
    factory = LATENTS.get(name)
    fields = {f.name for f in factory.__dataclass_fields__.values()} \
        if hasattr(factory, "__dataclass_fields__") else set()
    kwargs = {k: v for k, v in kwargs.items() if not fields or k in fields}
    return factory(**kwargs)


def build_model(cfg: Dict[str, Any], vocab_size: int, data_dim: int):
    """Build the caption model named by cfg['model'] (reference names)."""
    name = cfg.get("model", "Hybrid_VAEModel")
    model_args = dict(cfg.get("model_args", {}))
    encoder = _build_encoder(cfg, data_dim)
    enc_embed = cfg.get("encoder_args", {}).get("embed_size",
                                                encoder.embed_size)
    # every model family adapts the encoder memory to the decoder embed size
    # when they differ (the reference's self.ln, vae_model.py:30-32), so the
    # decoder always sees decoder-embed-sized memory.
    dec_embed = cfg.get("decoder_args", {}).get("embed_size", enc_embed)
    decoder = _build_decoder(cfg, vocab_size, dec_embed)
    embed = decoder.embed_size

    if name in ("VAEModel", "Hybrid_VAEModel"):
        qnet = _build_latent(model_args.get("posterior_model", "PosteriorRNN_hybrid"
                                            if name == "Hybrid_VAEModel"
                                            else "PosteriorRNN"),
                             model_args.get("posterior_args", {}),
                             vocab_size, embed)
        pnet = _build_latent(model_args.get("prior_model", "PriorRNN"),
                             model_args.get("prior_args", {}),
                             vocab_size, embed, audiofeats_size=embed)
        return VAECaptionModel(encoder=encoder, decoder=decoder, qnet=qnet,
                               pnet=pnet,
                               global_constraint=(name == "Hybrid_VAEModel"))
    if name == "SimpleVAEModel":
        qnet = _build_latent(model_args.get("posterior_model", "PosteriorSentence"),
                             model_args.get("posterior_args", {}),
                             vocab_size, embed)
        return SimpleVAECaptionModel(encoder=encoder, decoder=decoder, qnet=qnet)
    if name == "TransVAEModel":
        qnet = _build_latent(model_args.get("posterior_model", "PosteriorRNN"),
                             model_args.get("posterior_args", {}),
                             vocab_size, embed)
        pnet = _build_latent(model_args.get("prior_model", "PriorRNN"),
                             model_args.get("prior_args", {}),
                             vocab_size, embed, audiofeats_size=embed)
        return TransVAECaptionModel(encoder=encoder, decoder=decoder,
                                    qnet=qnet, pnet=pnet)
    if name == "Seq2SeqAttnModel":
        return AttnCaptionModel(encoder=encoder, decoder=decoder,
                                **model_args)
    if name == "TransformerModel":
        return TransformerCaptionModel(encoder=encoder, decoder=decoder,
                                       **model_args)
    if name in MODELS:
        return MODELS.build(name, encoder=encoder, decoder=decoder,
                            **model_args)
    raise KeyError(f"unknown model {name!r}")
