"""Audio encoders (log-mel [N, T, F] → temporal embeddings).

TPU-native re-designs of the reference encoder zoo (``models/encoder.py``).
Every encoder returns the same dict contract as the reference
(``encoder.py:337-342,702-707``)::

    {"audio_embeds":        [N, T', E]   # temporal embedding sequence
     "audio_embeds_pooled": [N, E]       # utterance embedding
     "audio_embeds_lens":   [N]}         # valid lengths after subsampling

Design notes vs the reference:

* NHWC conv layout (XLA's native TPU layout) instead of NCHW.
* Pooled utterance embeddings use **length-masked** mean/max
  (the reference pools over padded frames too, ``encoder.py:691-695`` — the
  masked version is bucket-size invariant, which static XLA shapes require).
* BatchNorm carries explicit ``batch_stats`` collections; pass
  ``train=True`` + ``mutable=["batch_stats"]``.
* Time buckets should be divisible by the encoder's subsampling factor
  (16 for Cnn10, 32 for Cnn14/ResNet38, 4 for CRNN).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from acvae_tpu.core.registry import ENCODERS
from acvae_tpu.models.decoders import sinusoidal_pe
from acvae_tpu.models.rnn import GRU
from acvae_tpu.ops.masked import max_with_lens, mean_with_lens

EncoderOutput = Dict[str, jnp.ndarray]


class ConvBlock(nn.Module):
    """PANN ConvBlock (encoder.py:606-649): 2× [conv3x3(no bias) → BN → relu],
    then avg/max/avg+max pooling."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 pool_size: Tuple[int, int] = (2, 2),
                 pool_type: str = "avg") -> jnp.ndarray:
        for i in (1, 2):
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False,
                        kernel_init=nn.initializers.xavier_uniform(),
                        dtype=self.dtype, name=f"conv{i}")(x)
            # BN compute follows the block dtype (bf16 halves the HBM traffic
            # of the early blocks, which are bandwidth-bound); statistics and
            # params stay f32 inside flax's BatchNorm.
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        if pool_size != (1, 1):
            if pool_type in ("avg", "avg+max"):
                avg = nn.avg_pool(x, pool_size, strides=pool_size)
            if pool_type in ("max", "avg+max"):
                mx = nn.max_pool(x, pool_size, strides=pool_size)
            x = {"avg": lambda: avg, "max": lambda: mx,
                 "avg+max": lambda: avg + mx}[pool_type]()
        return x


class _MelBatchNorm(nn.Module):
    """PANN's bn0: BatchNorm over the mel-bin axis (encoder.py:679-681)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # x: [N, T, F]; normalizing per mel bin over (N, T) == BatchNorm2d(F)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=jnp.float32, name="bn0")(x)


STEM_LANE_PAD = 2  # stem conv input channels (zero-padded from 1)


def _stage_mel(feats: jnp.ndarray, train: bool) -> jnp.ndarray:
    """bn0 → [N, T, F, STEM_LANE_PAD] stem staging for the PANN family.

    A single input channel is the worst case for the TPU conv pipeline;
    zero-padding the channel axis to 2 flips XLA into a ~20% faster conv1
    path (measured on v5e — docs/pallas_notes.md "stem lane padding").  The
    extra kernel column only ever multiplies zeros, so the math is exactly
    unchanged; the padded kernel weights receive zero gradient and stay at
    init.  torch→flax checkpoint conversion pads 1-input-channel stem
    kernels to match (train/pretrained.py)."""
    x = _MelBatchNorm()(feats, train)[..., None]
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, STEM_LANE_PAD - 1)))


def _pann_head(x: jnp.ndarray, lens: jnp.ndarray, fc: nn.Module,
               dropout_fn, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared PANN pooling head: mean over freq; masked max+mean over time;
    dropout→fc→relu→dropout (encoder.py:691-698)."""
    x = jnp.mean(x, axis=2)  # [N, T', C]
    pooled = max_with_lens(x, lens) + mean_with_lens(x, lens)
    pooled = dropout_fn(pooled, 0.5, train)
    pooled = nn.relu(fc(pooled))
    pooled = dropout_fn(pooled, 0.5, train)
    return x, pooled


class _DropoutMixin:
    def _dropout(self, x, rate, train):
        return nn.Dropout(rate, deterministic=not train)(x)


@ENCODERS.register("Cnn10")
class Cnn10(nn.Module, _DropoutMixin):
    """PANN Cnn10 audio-tagger backbone (encoder.py:651-707) — the default
    pretrained encoder.  4 ConvBlocks 64→512, time subsampling ×16."""
    inputdim: int = 64
    embed_size: int = 512
    channels: Sequence[int] = (64, 128, 256, 512)  # reference widths (encoder.py:657-660)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
                 train: bool = False) -> EncoderOutput:
        assert self.embed_size == self.channels[-1], \
            "Cnn10 temporal embeds have channels[-1] dims"
        x = _stage_mel(feats, train)  # [N, T, F, STEM_LANE_PAD]
        lens = feat_lens // 16
        for i, c in enumerate(self.channels):
            x = ConvBlock(c, dtype=self.dtype, name=f"block{i}_{c}")(x, train)
            x = self._dropout(x, 0.2, train)
        fc = nn.Dense(self.embed_size, name="embed_pooled",
                      kernel_init=nn.initializers.xavier_uniform())
        x, pooled = _pann_head(x, lens, fc, self._dropout, train)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


@ENCODERS.register("Cnn14")
class Cnn14(nn.Module, _DropoutMixin):
    """PANN Cnn14_16k (encoder.py:871-964): 6 ConvBlocks 64→2048, subsampling ×32."""
    inputdim: int = 64
    embed_size: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
                 train: bool = False) -> EncoderOutput:
        x = _stage_mel(feats, train)
        lens = feat_lens // 32
        for c in (64, 128, 256, 512, 1024):
            x = ConvBlock(c, dtype=self.dtype, name=f"block{c}")(x, train)
            x = self._dropout(x, 0.2, train)
        x = ConvBlock(2048, dtype=self.dtype, name="block2048")(
            x, train, pool_size=(1, 1))
        x = self._dropout(x, 0.2, train)
        fc = nn.Dense(self.embed_size, name="fc1",
                      kernel_init=nn.initializers.xavier_uniform())
        x, pooled = _pann_head(x, lens, fc, self._dropout, train)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


class _ResnetBasicBlock(nn.Module):
    """PANN ResNet basic block (encoder.py:981-1094).  stride=2 downsampling
    is done with an avg-pool before conv1 (PANN's variant)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = x
        if self.stride == 2:
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=nn.initializers.xavier_uniform(),
                      dtype=self.dtype, name="conv1")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=nn.initializers.xavier_uniform(),
                      dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           scale_init=nn.initializers.zeros,  # zero_init_residual
                           dtype=jnp.float32, name="bn2")(out)
        if self.downsample:
            if self.stride == 2:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
            identity = nn.Conv(self.planes, (1, 1), use_bias=False,
                               kernel_init=nn.initializers.xavier_uniform(),
                               dtype=self.dtype, name="ds_conv")(identity)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=jnp.float32, name="ds_bn")(identity)
        return nn.relu(out + identity)


@ENCODERS.register("ResNet38")
class ResNet38(nn.Module, _DropoutMixin):
    """PANN ResNet38 (encoder.py:1169-1232): ConvBlock64 → ResNet[3,4,6,3]
    → ConvBlock2048 → pooled head; subsampling ×32."""
    inputdim: int = 64
    embed_size: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
                 train: bool = False) -> EncoderOutput:
        x = _stage_mel(feats, train)
        lens = feat_lens // 32
        x = ConvBlock(64, dtype=self.dtype, name="block64")(x, train)
        x = self._dropout(x, 0.2, train)
        in_planes = 64
        for stage, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for b in range(blocks):
                s = stride if b == 0 else 1
                ds = (b == 0) and (s != 1 or in_planes != planes)
                x = _ResnetBasicBlock(planes, s, ds, dtype=self.dtype,
                                      name=f"layer{stage + 1}_{b}")(x, train)
            in_planes = planes
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = self._dropout(x, 0.2, train)
        x = ConvBlock(2048, dtype=self.dtype, name="block2048")(
            x, train, pool_size=(1, 1))
        x = self._dropout(x, 0.2, train)
        fc = nn.Dense(self.embed_size, name="fc1",
                      kernel_init=nn.initializers.xavier_uniform())
        x, pooled = _pann_head(x, lens, fc, self._dropout, train)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


class _TorchvisionBasicBlock(nn.Module):
    """torchvision-style BasicBlock (encoder.py:769-806): strided 3×3 conv
    downsampling with a 1×1-conv shortcut — distinct from PANN's
    avg-pool-before-conv variant (`_ResnetBasicBlock` above)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      kernel_init=nn.initializers.kaiming_normal(),
                      dtype=self.dtype, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False,
                      kernel_init=nn.initializers.kaiming_normal(),
                      dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False,
                               kernel_init=nn.initializers.kaiming_normal(),
                               dtype=self.dtype, name="ds_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=jnp.float32,
                                    name="ds_bn")(identity)
        return nn.relu(out + identity)


@ENCODERS.register("ResNetEncoder")
class ResNetEncoder(nn.Module, _DropoutMixin):
    """torchvision-style ResNet18 trunk (encoder.py:808-863): 7×7/2 stem →
    3×3/2 max-pool → 4 stages of 2 BasicBlocks (stride 2 from stage 2) →
    mean over the mel axis (the reference's AdaptiveAvgPool2d((1, None))).

    Five stride-2 halvings ⇒ the reference's distinctive length arithmetic
    ``lens = (lens - 1) // 2 + 1`` applied five times (encoder.py:855-856).
    Layout is NHWC with H=time, W=mel (the reference runs NCHW with H=mel,
    W=time — both axes are strided identically, so only the weight transpose
    differs); pooled embedding uses the masked time mean per module
    convention (reference pools padding too, encoder.py:860)."""
    inputdim: int = 64
    embed_size: int = 512
    channels: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
                 train: bool = False) -> EncoderOutput:
        assert self.embed_size == self.channels[-1], \
            "ResNetEncoder temporal embeds have channels[-1] dims"
        x = feats[..., None].astype(self.dtype)  # [N, T, F, 1]
        x = nn.Conv(self.channels[0], (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    kernel_init=nn.initializers.kaiming_normal(),
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_planes = self.channels[0]
        for stage, planes in enumerate(self.channels):
            stride = 1 if stage == 0 else 2
            for b in range(2):
                s = stride if b == 0 else 1
                ds = (b == 0) and (s != 1 or in_planes != planes)
                x = _TorchvisionBasicBlock(planes, s, ds, dtype=self.dtype,
                                           name=f"layer{stage + 1}_{b}")(
                                               x, train)
            in_planes = planes
        x = jnp.mean(x.astype(jnp.float32), axis=2)  # collapse mel → [N, T', C]
        lens = feat_lens
        for _ in range(5):
            lens = (lens - 1) // 2 + 1
        return {"audio_embeds": x,
                "audio_embeds_pooled": mean_with_lens(x, lens),
                "audio_embeds_lens": lens}


def _lp_pool(x: jnp.ndarray, p: float, window: Tuple[int, int]) -> jnp.ndarray:
    """torch nn.LPPool2d: (sum over window of x^p)^(1/p) (encoder.py:280-286)."""
    s = jax.lax.reduce_window(
        jnp.abs(x) ** p, 0.0, jax.lax.add,
        (1,) + window + (1,), (1,) + window + (1,), "VALID")
    return s ** (1.0 / p)


@ENCODERS.register("CRNNEncoder")
class CRNNEncoder(nn.Module, _DropoutMixin):
    """CRNN (encoder.py:271-342): Block2D conv stack with LPPool → BiGRU(128);
    time subsampling ×4; pooled = masked mean."""
    inputdim: int = 64
    embed_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
                 train: bool = False) -> EncoderOutput:
        def block2d(x, cout, name):
            # Block2D (encoder.py:180-194): BN → conv3x3(no bias) → LeakyReLU(0.1)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, name=f"{name}_bn")(x)
            x = nn.Conv(cout, (3, 3), padding="SAME", use_bias=False,
                        kernel_init=nn.initializers.kaiming_uniform(),
                        dtype=self.dtype, name=f"{name}_conv")(x)
            return nn.leaky_relu(x, 0.1)

        x = feats[..., None]  # [N, T, F, 1]
        x = block2d(x, 32, "b1")
        x = _lp_pool(x, 4.0, (2, 4))
        x = block2d(x, 128, "b2")
        x = block2d(x, 128, "b3")
        x = _lp_pool(x, 4.0, (2, 4))
        x = block2d(x, 128, "b4")
        x = block2d(x, 128, "b5")
        x = _lp_pool(x, 4.0, (1, 4))
        x = self._dropout(x, 0.3, train)
        N, Tp = x.shape[0], x.shape[1]
        x = x.reshape(N, Tp, -1)  # flatten (freq, channels)
        lens = feat_lens // 4
        x, _ = GRU(128, x.shape[-1], bidirectional=True, name="gru")(x, lens)
        pooled = mean_with_lens(x, lens)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


@ENCODERS.register("CNN10QEncoder")
class CNN10QEncoder(nn.Module, _DropoutMixin):
    """CNN10-Q (encoder.py:427-498): double-conv blocks with avg pools, final
    freq average, masked mean+max pooled embedding; subsampling ×16."""
    inputdim: int = 64
    embed_size: int = 512
    channels: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    def _trunk(self, feats, feat_lens, train):
        x = _stage_mel(feats, train)
        lens = feat_lens // 16
        for i, c in enumerate(self.channels):
            for j in (1, 2):
                x = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                            kernel_init=nn.initializers.kaiming_uniform(),
                            dtype=self.dtype, name=f"b{i}_conv{j}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype, name=f"b{i}_bn{j}")(x)
                x = nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = self._dropout(x, 0.2, train)
        x = jnp.mean(x, axis=2)  # AdaptiveAvgPool over remaining freq
        return x, lens

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        x, lens = self._trunk(feats, feat_lens, train)
        out = mean_with_lens(x, lens) + max_with_lens(x, lens)
        out = self._dropout(out, 0.5, train)
        out = nn.Dense(self.embed_size, name="embedding",
                       kernel_init=nn.initializers.kaiming_uniform())(out)
        return {"audio_embeds": x, "audio_embeds_pooled": out,
                "audio_embeds_lens": lens}


@ENCODERS.register("CNN10DEncoder")
class CNN10DEncoder(CNN10QEncoder):
    """CNN10-D (encoder.py:500-514): Q trunk + per-frame projection head."""

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        x, lens = self._trunk(feats, feat_lens, train)
        out = mean_with_lens(x, lens) + max_with_lens(x, lens)
        out = self._dropout(out, 0.5, train)
        embedding = nn.Dense(self.channels[-1], name="embedding",
                             kernel_init=nn.initializers.kaiming_uniform())
        out = embedding(out)
        frames = nn.relu(embedding(x))
        frames = self._dropout(frames, 0.5, train)
        frames = nn.Dense(self.embed_size, name="outputlayer",
                          kernel_init=nn.initializers.kaiming_uniform())(frames)
        return {"audio_embeds": frames, "audio_embeds_pooled": out,
                "audio_embeds_lens": lens}


@ENCODERS.register("CNNEncoder")
class CNNEncoder(nn.Module, _DropoutMixin):
    """GLU conv stack (encoder.py:91-141): conv → BN → GLU → freq max-pool,
    time-mean pooled into one utterance vector (no temporal embeds)."""
    inputdim: int = 64
    embed_size: int = 256
    filters: Sequence[int] = (32, 32, 32)
    filtersizes: Sequence[int] = (5, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        x = feats[..., None]
        for i, (c, k) in enumerate(zip(self.filters, self.filtersizes)):
            x = nn.Conv(c, (k, k), padding=k // 2, use_bias=False,
                        kernel_init=nn.initializers.kaiming_uniform(),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            a, b = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(b)  # GLU over channels
            x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = jnp.mean(x, axis=1)  # pool time
        x = x.reshape(x.shape[0], -1)
        out = nn.Dense(self.embed_size, name="outputlayer",
                       kernel_init=nn.initializers.kaiming_uniform())(x)
        return {"audio_embeds": out[:, None, :], "audio_embeds_pooled": out,
                "audio_embeds_lens": jnp.ones_like(feat_lens)}


@ENCODERS.register("CRNN8_Sub4")
class CRNN8Sub4(nn.Module, _DropoutMixin):
    """CRNN8 (encoder.py:345-424): double-conv blocks with avg+max (MM)
    pooling → embedding → BiGRU; subsampling ×4."""
    inputdim: int = 64
    embed_size: int = 512
    channels: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        x = _stage_mel(feats, train)
        pools = [(2, 2), (2, 2), (1, 2), (1, 2)]
        for i, (c, p) in enumerate(zip(self.channels, pools)):
            for j in (1, 2):
                x = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                            kernel_init=nn.initializers.kaiming_uniform(),
                            dtype=self.dtype, name=f"b{i}_conv{j}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype, name=f"b{i}_bn{j}")(x)
                x = nn.relu(x)
            x = nn.avg_pool(x, p, strides=p) + nn.max_pool(x, p, strides=p)
            x = self._dropout(x, 0.2, train)
        x = jnp.mean(x, axis=2)  # AdaptiveAvgPool((None, 1)) over freq
        x = self._dropout(x, 0.5, train)
        x = nn.relu(nn.Dense(self.channels[-1], name="embedding",
                             kernel_init=nn.initializers.kaiming_uniform())(x))
        lens = feat_lens // 4
        x, _ = GRU(self.channels[-1] // 2, x.shape[-1], bidirectional=True,
                   name="gru")(x, lens)
        pooled = mean_with_lens(x, lens)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


@ENCODERS.register("TransformerEncoder")
class TransformerAudioEncoder(nn.Module, _DropoutMixin):
    """Projects precomputed attention features through a transformer encoder
    (encoder.py:1256-1306; the reference's version calls an undefined helper —
    SURVEY §7 known bugs — this is the working equivalent)."""
    inputdim: int
    embed_size: int = 512
    nhead: int = 8
    nlayers: int = 2
    dim_feedforward: int = 2048
    dropout: float = 0.2

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        from acvae_tpu.ops.masked import length_mask
        x = nn.Dense(self.embed_size, name="proj",
                     kernel_init=nn.initializers.kaiming_uniform())(feats)
        mask = length_mask(feat_lens, x.shape[1])
        attn_mask = (mask[:, None, :] & mask[:, :, None])[:, None]
        for i in range(self.nlayers):
            sa = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.embed_size,
                dropout_rate=self.dropout, deterministic=not train,
                name=f"layer{i}_attn")(x, x, mask=attn_mask)
            x = nn.LayerNorm(name=f"layer{i}_norm1")(x + sa)
            ff = nn.Dense(self.dim_feedforward, name=f"layer{i}_ff1")(x)
            ff = nn.Dense(self.embed_size, name=f"layer{i}_ff2")(
                self._dropout(nn.relu(ff), self.dropout, train))
            x = nn.LayerNorm(name=f"layer{i}_norm2")(x + ff)
        pooled = mean_with_lens(x, feat_lens)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": feat_lens}


@ENCODERS.register("CNN10Encoder")
class CNN10Encoder(nn.Module, _DropoutMixin):
    """Block2D+LPPool CNN10 (encoder.py:516-575): four double-Block2D stages
    with LPPool(4) pools (2,4)/(2,2)/(1,2)/(1,2), freq collapsed by the final
    AdaptiveAvgPool((None,1)); time subsampling ×4.  The reference returns the
    masked time-mean as its utterance embedding — here that is
    ``audio_embeds_pooled`` and the temporal sequence is kept per contract."""
    inputdim: int = 64
    embed_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        assert self.embed_size == 512, \
            "CNN10Encoder outputs 512 dims (encoder.py:520)"

        def block2d(x, cout, name):
            # Block2D (encoder.py:180-194): BN → conv3x3(no bias) → LeakyReLU
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, name=f"{name}_bn")(x)
            x = nn.Conv(cout, (3, 3), padding="SAME", use_bias=False,
                        kernel_init=nn.initializers.xavier_uniform(),
                        dtype=self.dtype, name=f"{name}_conv")(x)
            return nn.leaky_relu(x, 0.1)

        x = feats[..., None]  # [N, T, F, 1]
        for i, (c, pool) in enumerate(
                zip((64, 128, 256, 512), [(2, 4), (2, 2), (1, 2), (1, 2)])):
            x = block2d(x, c, f"b{i}_1")
            x = block2d(x, c, f"b{i}_2")
            x = _lp_pool(x, 4.0, pool)
        x = self._dropout(x, 0.3, train)
        x = jnp.mean(x, axis=2)  # AdaptiveAvgPool((None, 1)) over freq
        lens = feat_lens // 4
        pooled = mean_with_lens(x, lens)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


@ENCODERS.register("PreTrainedCNN")
class PreTrainedCNN(nn.Module):
    """Frozen pretrained CNN trunk + fresh linear head (encoder.py:144-177).

    The reference wraps an in-memory pretrained model, strips its output layer
    and runs the trunk under ``torch.no_grad``.  TPU-native: any registered
    encoder as the ``trunk`` submodule, frozen with ``lax.stop_gradient`` (the
    trunk also runs with ``train=False`` so BatchNorm uses running stats, the
    exact semantics of the reference's eval-mode no_grad trunk).  Pretrained
    weights arrive through the ``pretrained_encoder`` config key as for every
    other encoder (``runners/pytorch_runner_vae.py:40-49``)."""
    trunk: nn.Module
    embed_size: int = 512
    freeze: bool = True
    inputdim: int = 64  # taken from the trunk; kept for the factory contract

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        out = self.trunk(feats, feat_lens, train=False)
        embeds, pooled = out["audio_embeds"], out["audio_embeds_pooled"]
        if self.freeze:
            embeds = jax.lax.stop_gradient(embeds)
            pooled = jax.lax.stop_gradient(pooled)
        head = nn.Dense(self.embed_size, name="outputlayer",
                        kernel_init=nn.initializers.xavier_uniform())
        return {"audio_embeds": head(embeds), "audio_embeds_pooled": head(pooled),
                "audio_embeds_lens": out["audio_embeds_lens"]}


@ENCODERS.register("CNN10CRNNEncoder")
class CNN10CRNNEncoder(nn.Module):
    """Fusion encoder (encoder.py:577-591): run a CRNN and a CNN10 branch on
    the same mels and concatenate along the feature axis.  Both branches
    subsample time ×4, so the temporal sequences concatenate too (the
    reference-era interface only fused the pooled vectors)."""
    crnn: nn.Module
    cnn: nn.Module
    inputdim: int = 64  # taken from the branches; kept for the factory contract

    @property
    def embed_size(self) -> int:
        return self.crnn.embed_size + self.cnn.embed_size

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        a = self.crnn(feats, feat_lens, train=train)
        b = self.cnn(feats, feat_lens, train=train)
        T = min(a["audio_embeds"].shape[1], b["audio_embeds"].shape[1])
        return {
            "audio_embeds": jnp.concatenate(
                [a["audio_embeds"][:, :T], b["audio_embeds"][:, :T]], axis=-1),
            "audio_embeds_pooled": jnp.concatenate(
                [a["audio_embeds_pooled"], b["audio_embeds_pooled"]], axis=-1),
            "audio_embeds_lens": jnp.minimum(a["audio_embeds_lens"],
                                             b["audio_embeds_lens"]),
        }


@ENCODERS.register("E2EASREncoder")
class E2EASREncoder(nn.Module, _DropoutMixin):
    """ESPnet-style ASR encoder, implemented natively (encoder.py:14-54 wraps
    a pretrained ``espnet...e2e_asr.E2E`` encoder — an external dependency;
    this is the same architecture family built in-framework): VGG2L conv
    frontend (two VGG stages, each 2×conv3x3 + 2×2 max-pool → time ×4) into a
    projected bidirectional recurrent stack, 320-dim output like the
    reference's ``embed_size = 320``.  The recurrent layers are our scan GRUs
    (ESPnet's ``vggbgrup`` flavor); the pooled embedding is the masked time
    mean exactly as the reference computes it (encoder.py:30-35)."""
    inputdim: int = 64
    embed_size: int = 320
    hidden_size: int = 320
    nlayers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        x = feats[..., None]  # [N, T, F, 1]
        for i, c in enumerate((64, 128)):  # VGG2L channel plan
            for j in (1, 2):
                x = nn.Conv(c, (3, 3), padding="SAME",
                            kernel_init=nn.initializers.xavier_uniform(),
                            dtype=self.dtype, name=f"vgg{i}_conv{j}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        N, Tp = x.shape[0], x.shape[1]
        x = x.reshape(N, Tp, -1)  # flatten (freq, channels)
        lens = feat_lens // 4
        for i in range(self.nlayers):
            x, _ = GRU(self.hidden_size, x.shape[-1], bidirectional=True,
                       name=f"bgru{i}")(x, lens)
            # BLSTMP-style per-layer projection (tanh)
            x = jnp.tanh(nn.Dense(self.embed_size, name=f"proj{i}",
                                  kernel_init=nn.initializers.xavier_uniform())(x))
        pooled = mean_with_lens(x, lens)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


@ENCODERS.register("M2TransformerEncoder")
class M2TransformerEncoder(nn.Module, _DropoutMixin):
    """Meshed-memory transformer encoder, implemented natively
    (encoder.py:1309-1348 imports the external ``m2transformer`` package).

    Memory-augmented self-attention (Cornia et al. 2020): each layer learns
    ``memory_slots`` persistent key/value vectors that are appended to the
    projected keys/values (keys scaled by √d_k, values by √m, matching
    ``ScaledDotProductAttentionMemory``); padding masks apply only to the real
    positions, memory slots are always attendable.  The reference's separate
    ``input_dict`` interface belongs to an older codebase revision — here the
    module follows the framework encoder contract, with the pooled embedding
    = masked mean over time (the reference's ``attn_embs.mean(-2)``)."""
    inputdim: int
    embed_size: int = 512
    nhead: int = 8
    nlayers: int = 2
    dim_feedforward: int = 2048
    memory_slots: int = 40
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False) -> EncoderOutput:
        from acvae_tpu.ops.masked import length_mask

        D, H = self.embed_size, self.nhead
        dh = D // H
        x = nn.Dense(D, name="attn_proj",
                     kernel_init=nn.initializers.xavier_uniform())(feats)
        x = x + sinusoidal_pe(x.shape[1], D)[None]
        mask = length_mask(feat_lens, x.shape[1])  # [N, T]
        for i in range(self.nlayers):
            q = nn.Dense(D, name=f"l{i}_wq")(x)
            k = nn.Dense(D, name=f"l{i}_wk")(x)
            v = nn.Dense(D, name=f"l{i}_wv")(x)
            mk = self.param(f"l{i}_mem_k", nn.initializers.normal(1.0 / dh),
                            (self.memory_slots, D))
            mv = self.param(f"l{i}_mem_v",
                            nn.initializers.normal(1.0 / self.memory_slots),
                            (self.memory_slots, D))
            N, T = x.shape[:2]
            mk = jnp.broadcast_to((dh ** 0.5) * mk, (N,) + mk.shape)
            mv = jnp.broadcast_to((self.memory_slots ** 0.5) * mv,
                                  (N,) + mv.shape)
            k = jnp.concatenate([k, mk], axis=1)
            v = jnp.concatenate([v, mv], axis=1)

            def heads(t):
                return t.reshape(t.shape[0], t.shape[1], H, dh).transpose(0, 2, 1, 3)
            scores = heads(q) @ heads(k).transpose(0, 1, 3, 2) / (dh ** 0.5)
            kv_mask = jnp.concatenate(
                [mask, jnp.ones((N, self.memory_slots), bool)], axis=1)
            scores = jnp.where(kv_mask[:, None, None, :], scores, -1e9)
            attn = jax.nn.softmax(scores, axis=-1)
            out = (attn @ heads(v)).transpose(0, 2, 1, 3).reshape(N, T, D)
            out = nn.Dense(D, name=f"l{i}_wo")(out)
            x = nn.LayerNorm(name=f"l{i}_norm1")(
                x + self._dropout(out, self.dropout, train))
            ff = nn.Dense(self.dim_feedforward, name=f"l{i}_ff1")(x)
            ff = nn.Dense(D, name=f"l{i}_ff2")(
                self._dropout(nn.relu(ff), self.dropout, train))
            x = nn.LayerNorm(name=f"l{i}_norm2")(
                x + self._dropout(ff, self.dropout, train))
        pooled = mean_with_lens(x, feat_lens)
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": feat_lens}


@ENCODERS.register("RNNEncoder")
class RNNEncoder(nn.Module, _DropoutMixin):
    """Packed GRU encoder (encoder.py:709-762) with mean/time representation."""
    inputdim: int
    embed_size: int = 256
    hidden_size: int = 256
    bidirectional: bool = False
    representation: str = "time"

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
                 train: bool = False) -> EncoderOutput:
        out_time, _ = GRU(self.hidden_size, self.inputdim,
                          bidirectional=self.bidirectional, name="gru")(feats, feat_lens)
        if self.representation == "mean":
            out = mean_with_lens(out_time, feat_lens)
        else:  # last valid timestep
            idx = jnp.maximum(feat_lens - 1, 0)
            out = jnp.take_along_axis(out_time, idx[:, None, None], axis=1)[:, 0]
        out = nn.Dense(self.embed_size, name="outputlayer",
                       kernel_init=nn.initializers.kaiming_uniform())(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.01,
                           dtype=jnp.float32, name="bn")(out)
        return {"audio_embeds": out_time, "audio_embeds_pooled": out,
                "audio_embeds_lens": feat_lens}
