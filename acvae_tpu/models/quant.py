"""Int8 post-training quantization of the PANN encoders (inference only).

The decode path is encoder-dominated (RESULTS.md: ~77% of a beam-3 batch),
and the v5e MXU runs int8 convs ~1.6x faster than bf16 at these shapes
(docs/pallas_notes.md "int8 conv probe").  This module reinterprets a
*trained f32* PANN-family variable tree (``Cnn10`` / ``Cnn14``) as an int8
conv pipeline:

* conv weights: symmetric per-output-channel int8 (scale = max|w|/127),
  with the **per-input-channel activation scales folded into the weights
  before quantization** — per-channel activation quantization at zero
  runtime cost (the fold happens at bake time; the conv itself still sees
  one int8 tensor per side);
* activations: static scales calibrated from one representative batch
  (dynamic per-batch max would add a full reduction between blocks).
  The stem (post-bn0, signed) is symmetric int8; every **post-relu**
  activation is non-negative, so it uses the full 255-level range with a
  fixed zero point of -128 (``q = round(v/s) - 128``) — double the
  resolution of symmetric int8 on the same values.  Convs consuming
  offset activations pad explicitly with -128 (the exact representation
  of v=0, matching the f32 path's SAME zero padding) and fold the
  zero-point correction ``128·Σw`` into the baked bias — border math is
  exact, not approximated;
* each conv accumulates in int32 on the MXU; the dequantize + folded
  inference BatchNorm + relu + requantize collapse to one baked per-channel
  affine (``acc * A + B`` -> round/clip/int8; the relu is implicit in the
  offset requantize — negative values round below -128 and clip to the
  code for v=0) that XLA fuses into the conv's output epilogue.  The
  fusion avoids any f32 intermediate in HBM but is NOT free: the on-chip
  probe (tools/probe_encoder.py, docs/pallas_notes.md "conv attribution")
  measures the epilogue VPU work at +0.4-3.2 ms per conv at batch 256 —
  element-count-bound, largest on the early blocks;
* the 2x2 average pool between blocks runs **in the quantized domain**
  (int8 strided-slice sum, round-half-up — exact for the offset
  representation too: ``avg(q)+128 = avg(q+128)``) — pooling the
  dequantized f32 activation instead costs ~4x the HBM traffic on the
  early blocks and was measured to eat half the int8 win
  (docs/pallas_notes.md).

Only the final conv's output is dequantized (its epilogue keeps the plain
affine), so the head (freq mean, masked pooling, fc) runs in f32.

``per_channel=False, offset=False`` reproduces the round-1 per-tensor
symmetric scheme for A/B comparison (tools/probe_decode.py / tests).

No reference counterpart (the reference has no quantization story at all);
this is a TPU-native serving optimization.  Accuracy is validated in
``tests/test_quant.py`` (cosine vs the f32 encoder; the v2 scheme is
asserted strictly tighter than v1 on channel-skewed weights); it is opt-in
via ``CaptionService(encoder_int8=True)`` / ``cli serve --encoder_int8`` /
``cli evaluate --encoder_int8`` — training defaults to the exact f32/bf16
path.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from acvae_tpu.ops.masked import max_with_lens, mean_with_lens

_DN = ("NHWC", "HWIO", "NHWC")
_ZP = 128  # fixed zero point of the offset (post-relu) representation
# clip ratios searched by the MSE-optimal calibration (r=1.0 = abs-max)
_CLIP_GRID = np.linspace(0.5, 1.0, 11).astype(np.float32)


def _fold_bn(bn_params: Dict, bn_stats: Dict, eps: float = 1e-5):
    """Inference BN -> (scale, bias)."""
    inv = 1.0 / jnp.sqrt(bn_stats["var"] + eps)
    scale = bn_params["scale"] * inv
    return scale, bn_params["bias"] - bn_stats["mean"] * scale


def _quantize_w(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 (HWIO -> scale over HWI)."""
    s = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s = np.maximum(s, 1e-12)
    return np.clip(np.round(w / s), -127, 127).astype(np.int8), \
        s.astype(np.float32)


def _avgpool_i8(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool in the quantized domain.

    The 4-tap int32 sum fits int8 after round-half-up ``(s+2)>>2`` (floor
    of ``(s+2)/4`` — round-half-toward-+inf for negative offset values
    too, and ``avg(q)+ZP == avg(q+ZP)`` so the offset representation pools
    exactly).  Odd trailing rows/cols are dropped, matching
    ``reduce_window`` VALID semantics."""
    h = (x.shape[1] // 2) * 2
    w = (x.shape[2] // 2) * 2
    x = x[:, :h, :w]
    s = (x[:, ::2, ::2].astype(jnp.int32) + x[:, 1::2, ::2]
         + x[:, ::2, 1::2] + x[:, 1::2, 1::2])
    return ((s + 2) >> 2).astype(jnp.int8)


def _avgpool_f32(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID") * 0.25


def _mse_scale(a: jnp.ndarray, s_absmax: np.ndarray, levels: float,
               axes) -> np.ndarray:
    """MSE-optimal clip search: pick the scale ``r·s_absmax`` (r ∈
    _CLIP_GRID) minimizing the round-trip quantization MSE of ``a``
    (non-negative magnitudes; zeros quantize exactly and add no error).

    Abs-max is only optimal when the extreme value matters as much as the
    bulk; with millions of bulk elements and a handful of outliers, the
    bulk's resolution loss outweighs the outliers' clip error and a
    smaller scale wins.  The simulated quantizer matches the runtime one
    (``jnp.round`` + clip), and r=1.0 is in the grid, so the search can
    only improve the local MSE proxy."""
    errs = []
    for r in _CLIP_GRID:
        sr = s_absmax * np.float32(r)
        q = jnp.clip(jnp.round(a / sr), 0, levels)
        errs.append(np.asarray(
            jnp.sum((a - q * sr) ** 2, axis=axes), np.float32))
    best = np.argmin(np.stack(errs, 0), axis=0)
    return (s_absmax * _CLIP_GRID[best]).astype(np.float32)


def _arch_spec(arch: str, channels: Sequence[int]) -> Dict[str, Any]:
    """Block names / pooling plan / head names per PANN architecture
    (mirrors encoders.Cnn10.__call__ and encoders.Cnn14.__call__)."""
    if arch == "Cnn10":
        return {"blocks": [(f"block{i}_{c}", True)
                           for i, c in enumerate(channels)],
                "head": "embed_pooled", "subsample": 16}
    if arch == "Cnn14":
        return {"blocks": [(f"block{c}", True)
                           for c in (64, 128, 256, 512, 1024)]
                + [("block2048", False)],  # pool_size (1,1) on the last
                "head": "fc1", "subsample": 32}
    raise ValueError(f"int8 quantization supports Cnn10/Cnn14, not {arch!r}")


class QuantPannEncoder:
    """Int8 reinterpretation of a trained PANN encoder variable tree.

    Build once with ``QuantPannEncoder(variables, calib_feats, calib_lens)``
    (or :meth:`from_bn0_stats`); then ``encoder(feats, feat_lens)`` returns
    the standard encoder dict contract.  Mirrors the f32 forward step
    (bn0 -> ConvBlocks -> PANN head); dropout is inference-off.

    ``per_channel`` / ``offset`` / ``mse_clip`` select the quantization
    scheme (defaults: the v2 per-channel + zero-point-offset scheme; both
    False = the round-1 per-tensor symmetric scheme, kept for A/B;
    ``mse_clip`` swaps abs-max calibration for an MSE-optimal clip search).
    """

    def __init__(self, variables: Dict[str, Any],
                 calib_feats: jnp.ndarray, calib_lens: jnp.ndarray,
                 arch: str = "Cnn10",
                 channels: Sequence[int] = (64, 128, 256, 512),
                 stem_lane_pad: Optional[int] = None,
                 per_channel: bool = True, offset: bool = True,
                 mse_clip: bool = False, bias_correct: bool = False,
                 quant_tail: bool = False):
        params = variables["params"]
        stats = variables["batch_stats"]
        spec = _arch_spec(arch, channels)
        self.subsample = spec["subsample"]
        self.per_channel = bool(per_channel)
        self.offset = bool(offset)
        self.mse_clip = bool(mse_clip)
        self.bias_correct = bool(bias_correct)
        # quant_tail (round 4, scheme v4): ALSO requantize the final conv's
        # output and run its pool + the head's freq mean in the quantized
        # domain — the f32 tail otherwise writes/reads the full-resolution
        # final activation (≈4x the HBM bytes of int8); dequantization
        # happens on the 16x-smaller post-pool tensor.  Symmetric-coding
        # schemes only (the offset pad path never touches the tail).
        self.quant_tail = bool(quant_tail)
        if self.quant_tail and self.offset:
            raise ValueError("quant_tail composes with symmetric coding "
                             "(offset=False) only")
        if self.quant_tail and self.bias_correct:
            raise ValueError("quant_tail does not compose with bias_correct "
                             "(the correction pass walks the f32 tail)")
        # default tracks the f32 encoders' staging constant so the two
        # paths cannot desync (encoders._stage_mel / pretrained.pann_to_flax)
        from acvae_tpu.models.encoders import STEM_LANE_PAD
        self.stem_lane_pad = (STEM_LANE_PAD if stem_lane_pad is None
                              else stem_lane_pad)
        self.bn0 = _fold_bn(params["_MelBatchNorm_0"]["bn0"],
                            stats["_MelBatchNorm_0"]["bn0"])
        self.blocks: List[Dict[str, Any]] = []
        for name, pooled in spec["blocks"]:
            b, bs = params[name], stats[name]
            blk: Dict[str, Any] = {"pool": pooled}
            for j in (1, 2):
                blk[f"wf{j}"] = np.asarray(b[f"conv{j}"]["kernel"],
                                           np.float32)
                blk[f"bn{j}"] = _fold_bn(b[f"bn{j}"], bs[f"bn{j}"])
            self.blocks.append(blk)
        head = params[spec["head"]]
        self.fc = (jnp.asarray(head["kernel"]), jnp.asarray(head["bias"]))
        # static activation-scale calibration (f32 shadow pass) from one
        # representative batch, then fold the input scales into the weights,
        # quantize them, and bake every dequant+BN+requant chain into one
        # affine per conv
        self.act_scales = self._calibrate(calib_feats, calib_lens)
        self._fold_and_quantize()
        self._bake_epilogues()
        if self.bias_correct:
            self._bias_correct_pass(calib_feats, calib_lens)
        for blk in self.blocks:  # the f32 kernels are bake-time-only
            del blk["wf1"], blk["wf2"]

    @classmethod
    def from_bn0_stats(cls, variables: Dict[str, Any],
                       arch: str = "Cnn10",
                       channels: Sequence[int] = (64, 128, 256, 512),
                       n: int = 8, t: int = 512, seed: int = 0,
                       **kw) -> "QuantPannEncoder":
        """Build with a calibration batch *synthesized from bn0's running
        statistics*: bn0 whitens each mel bin toward N(0,1) with the
        running mean/var of the training distribution, so sampling
        ``mean + sqrt(var)·N(0,1)`` per bin reproduces the post-bn0
        activation distribution without needing training data at serving
        time."""
        bn0 = variables["batch_stats"]["_MelBatchNorm_0"]["bn0"]
        mean = np.asarray(bn0["mean"])
        std = np.sqrt(np.asarray(bn0["var"]) + 1e-5)
        rng = np.random.default_rng(seed)
        feats = (mean[None, None, :]
                 + std[None, None, :] * rng.normal(size=(n, t, len(mean))))
        lens = np.full((n,), t, np.int32)
        return cls(variables, jnp.asarray(feats, jnp.float32),
                   jnp.asarray(lens), arch=arch, channels=channels, **kw)

    # -------------------------------------------------------------- #
    def _stem(self, feats):
        s0, b0 = self.bn0
        x = (feats * s0 + b0)[..., None]
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                           (0, self.stem_lane_pad - 1)))

    def _quant_stem(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Fused stem quantization (round 4): bn0's per-bin affine and the
        stem activation scale collapse into ONE multiply-add + round/clip
        over the unpadded [N, T, F] mel, and the lane pad is applied to the
        int8 result (the previous path ran bn0 in f32, padded in f32, then
        divided by the scale — three full-size VPU passes and a pad-wide
        f32 intermediate).  Padded lanes carry code 0, which is what the
        per-lane calibration produced for the all-zero lanes too.  Values
        differ from the two-step path only by f32 associativity ULPs."""
        s0, b0 = self.bn0
        s_q = self.act_scales[0]
        s_lane = s_q[0] if getattr(s_q, "ndim", 0) else s_q
        q = jnp.clip(jnp.round(feats * (s0 / s_lane) + b0 / s_lane),
                     -127, 127).astype(jnp.int8)[..., None]
        return jnp.pad(q, ((0, 0), (0, 0), (0, 0),
                           (0, self.stem_lane_pad - 1)))

    def _levels(self, i: int) -> float:
        """Quantization levels per unit scale at quantize point i: the
        stem (i=0, signed) is symmetric 127; post-relu points use the full
        255-level offset range when the offset scheme is on."""
        return 255.0 if (self.offset and i > 0) else 127.0

    def _calibrate(self, feats, lens) -> list:
        """f32 shadow pass recording max|activation| at every quantize
        point: the stem output, then each conv's post-relu output *before*
        pooling (pooling happens in the quantized domain, so the scale
        must bound the pre-pool values).  Per-channel when
        ``self.per_channel`` (a [C] vector per point), else scalar.

        Padded frames are masked out of every max: bn0's bias makes padding
        zeros non-zero activations, and letting them win the max would
        inflate the scales and waste int8 resolution on values real audio
        never produces (``lens`` tracks the valid frames through each 2×2
        pool like the encoder's own length arithmetic).

        With ``mse_clip`` the abs-max scale is only the search anchor:
        each quantize point runs :func:`_mse_scale` on the masked
        magnitudes (masked entries quantize to exactly 0 and contribute no
        error, so no re-masking is needed inside the search)."""
        cur_lens = jnp.asarray(lens, jnp.int32)
        axes = (0, 1, 2) if self.per_channel else None

        def smax(v, n_valid, levels):
            m = (jnp.arange(v.shape[1])[None, :] < n_valid[:, None]
                 )[:, :, None, None]
            a = jnp.where(m, jnp.abs(v), 0.0)
            s = np.asarray(jnp.max(a, axis=axes), np.float32) / levels + 1e-12
            if not self.mse_clip:
                return s
            return _mse_scale(a, s, levels, axes)

        n_convs = 2 * len(self.blocks)
        scales = []
        x = self._stem(jnp.asarray(feats, jnp.float32))
        scales.append(smax(x, cur_lens, self._levels(0)))
        k = 0
        for blk in self.blocks:
            for j in (1, 2):
                k += 1
                x = lax.conv_general_dilated(
                    x, jnp.asarray(blk[f"wf{j}"]), (1, 1), "SAME",
                    dimension_numbers=_DN)
                s, b = blk[f"bn{j}"]
                x = jnp.maximum(x * s + b, 0.0)
                if k < n_convs or self.quant_tail:
                    # final conv output only gets a scale under quant_tail
                    scales.append(smax(x, cur_lens, self._levels(k)))
            if blk["pool"]:
                x = _avgpool_f32(x)
                cur_lens = jnp.maximum(cur_lens // 2, 1)
        return scales

    def _fold_and_quantize(self) -> None:
        """Fold each conv's per-input-channel activation scale into its f32
        kernel, then quantize per-output-channel.  The folded kernel maps
        the *quantized* input directly: ``conv(q, w_i8)·sw ≈ conv(v, w)``
        with ``q = v / s_in`` (per channel).  Scalar scales broadcast, so
        the same fold covers ``per_channel=False``."""
        for i, blk in enumerate(self.blocks):
            for j in (1, 2):
                s_in = self.act_scales[2 * i + j - 1]
                w_eff = blk[f"wf{j}"] * np.reshape(
                    np.asarray(s_in, np.float32), (1, 1, -1, 1))
                w_i8, sw = _quantize_w(w_eff)
                blk[f"w{j}"], blk[f"sw{j}"] = jnp.asarray(w_i8), jnp.asarray(sw)
                # zero-point correction for offset inputs: ZP·Σ_hwi w_i8
                blk[f"zpk{j}"] = np.sum(w_i8.astype(np.int64),
                                        axis=(0, 1, 2)).astype(np.float32)

    def _bake_epilogues(self) -> None:
        """Fold (weight scale x BN scale [/ output scale]) into one
        per-channel affine per conv (input scales already live inside the
        folded weights).  Offset-input convs additionally fold the
        zero-point correction ``ZP·Σw`` into the bias — together with the
        explicit -ZP padding this makes border math exact.  Quantized-output
        convs get ``A/s_out, B/s_out`` so requantization is just
        round/clip (the -ZP shift rides in the quantize step)."""
        n_convs = 2 * len(self.blocks)
        i = 0
        for blk in self.blocks:
            for j in (1, 2):
                i += 1
                bs, bb = blk[f"bn{j}"]
                sw = np.asarray(blk[f"sw{j}"])
                A = sw * np.asarray(bs, np.float32)
                B = np.asarray(bb, np.float32).copy()
                if self.offset and i > 1:  # conv input is offset-coded
                    B = B + A * _ZP * blk[f"zpk{j}"]
                if i < n_convs or self.quant_tail:
                    s_out = self.act_scales[i]
                    if self.per_channel:
                        A, B = A / s_out, B / s_out
                    else:
                        A, B = A / float(s_out), B / float(s_out)
                blk[f"A{j}"], blk[f"B{j}"] = jnp.asarray(A), jnp.asarray(B)

    def _bias_correct_pass(self, feats, lens) -> None:
        """Fold the measured per-output-channel mean quantization error on
        the calibration batch into each conv's baked bias (the
        data-free-quantization bias-correction recipe).

        Rounding error is not zero-mean per channel — folded weights round
        once (a fixed signed offset per tap) and activation codes interact
        with relu asymmetrically — so each conv's output carries a small
        systematic per-channel shift that compounds through eight conv
        layers.  The pass walks the convs in order keeping the exact f32
        forward and the quantized path side by side, measures the masked
        mean pre-relu difference per output channel (in the conv's own
        requantize units, the units ``B`` lives in), and adds it to ``B``
        before continuing — so later corrections see the compounded
        corrected path.  Bake-time-only cost; the runtime program is
        unchanged (``B`` is already a per-channel constant)."""
        cur_lens = jnp.asarray(lens, jnp.int32)
        x_ref = self._stem(jnp.asarray(feats, jnp.float32))
        # mirror the runtime quantizer exactly (fused stem)
        x_i8 = self._quant_stem(jnp.asarray(feats, jnp.float32))
        n = len(self.blocks)
        n_convs = 2 * n
        k = 0
        for bi, blk in enumerate(self.blocks):
            for j in (1, 2):
                k += 1
                bs, bb = blk[f"bn{j}"]
                y_ref = lax.conv_general_dilated(
                    x_ref, jnp.asarray(blk[f"wf{j}"]), (1, 1), "SAME",
                    dimension_numbers=_DN) * bs + bb  # pre-relu, value units
                acc = self._conv(x_i8, blk, j, offset_input=k > 1)
                y = acc.astype(jnp.float32) * blk[f"A{j}"] + blk[f"B{j}"]
                # bring the reference into y's units (quantized-output convs
                # bake 1/s_out into A and B; the final conv stays in value
                # units), then measure the valid-frame mean shift
                if k < n_convs:
                    s_out = self.act_scales[k]
                    y_cmp = y_ref / (s_out if self.per_channel
                                     else float(s_out))
                else:
                    y_cmp = y_ref
                m = (jnp.arange(y.shape[1])[None, :]
                     < cur_lens[:, None])[:, :, None, None]
                cnt = jnp.maximum(jnp.sum(m) * y.shape[2], 1)
                d = jnp.sum(jnp.where(m, y_cmp - y, 0.0), axis=(0, 1, 2)) / cnt
                blk[f"B{j}"] = blk[f"B{j}"] + d
                y = y + d
                if bi == n - 1 and j == 2:
                    x_f = jnp.maximum(y, 0.0)
                else:
                    x_i8 = self._requantize(y)
                x_ref = jnp.maximum(y_ref, 0.0)
            if blk["pool"]:
                x_ref = _avgpool_f32(x_ref)
                if bi == n - 1:
                    del x_f  # nothing downstream of the final conv to walk
                else:
                    x_i8 = _avgpool_i8(x_i8)
                cur_lens = jnp.maximum(cur_lens // 2, 1)

    # -------------------------------------------------------------- #
    def _conv(self, x_i8: jnp.ndarray, blk: Dict[str, Any], j: int,
              offset_input: bool) -> jnp.ndarray:
        """int8 conv; offset-coded inputs get explicit -ZP padding + VALID
        (the padded positions then decode to v=0, exactly the f32 path's
        SAME zero padding — the matching ZP·Σw constant is in B)."""
        x = x_i8
        pad_mode = "SAME"
        if self.offset and offset_input:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-_ZP)
            pad_mode = "VALID"
        return lax.conv_general_dilated(
            x, blk[f"w{j}"], (1, 1), pad_mode, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)

    def _requantize(self, y: jnp.ndarray) -> jnp.ndarray:
        """Scaled conv output -> int8 code (offset or symmetric).

        The offset path takes the PRE-relu affine output: any y < 0 rounds
        below -ZP and clips to -128 — exactly the code for v=0, so the relu
        is folded into the clip for free (one fewer VPU op per element;
        pinned bit-exact by tests/test_quant.py::test_offset_requant_folds_relu).
        The symmetric path folds the relu the same way (round 4): post-relu
        values occupy codes 0..127, so clipping the raw rounded value at
        [0, 127] maps every y < 0 to code 0 == relu — bit-exact vs the
        explicit ``maximum`` (round(y) <= 0 for y < 0.5; pinned by
        tests/test_quant.py::test_symmetric_requant_folds_relu)."""
        if self.offset:
            return jnp.clip(jnp.round(y) - _ZP, -128, 127).astype(jnp.int8)
        return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        assert not train, "QuantPannEncoder is inference-only"
        lens = feat_lens // self.subsample
        x_i8 = self._quant_stem(feats)
        n = len(self.blocks)
        k = 0
        for bi, blk in enumerate(self.blocks):
            for j in (1, 2):
                k += 1
                acc = self._conv(x_i8, blk, j, offset_input=k > 1)
                # pre-relu affine: _requantize folds the relu into its clip
                # (offset) or applies it explicitly (symmetric)
                y = acc.astype(jnp.float32) * blk[f"A{j}"] + blk[f"B{j}"]
                if bi == n - 1 and j == 2 and not self.quant_tail:
                    x_f = jnp.maximum(y, 0.0)  # final conv: f32 for the head
                else:
                    x_i8 = self._requantize(y)
            if blk["pool"]:
                if bi == n - 1 and not self.quant_tail:
                    x_f = _avgpool_f32(x_f)
                else:
                    x_i8 = _avgpool_i8(x_i8)
        if self.quant_tail:
            # freq mean in the quantized domain (int32 sum over the 4
            # post-pool bins), dequantized on the 16x-smaller [N, T', C]
            s_out = self.act_scales[2 * n]
            x = (jnp.sum(x_i8.astype(jnp.int32), axis=2).astype(jnp.float32)
                 * (s_out / x_i8.shape[2]))
            pooled = max_with_lens(x, lens) + mean_with_lens(x, lens)
            pooled = jax.nn.relu(pooled @ self.fc[0] + self.fc[1])
            return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                    "audio_embeds_lens": lens}
        x = jnp.mean(x_f, axis=2)  # [N, T', C]
        pooled = max_with_lens(x, lens) + mean_with_lens(x, lens)
        pooled = jax.nn.relu(pooled @ self.fc[0] + self.fc[1])
        return {"audio_embeds": x, "audio_embeds_pooled": pooled,
                "audio_embeds_lens": lens}


# backwards-compatible name (Cnn10 default)
QuantCnn10 = QuantPannEncoder

# named quantization schemes (the CLI surface's --int8_scheme values):
#   v1    — round-1 per-tensor symmetric
#   v2    — per-channel activation scales + offset (255-level) coding;
#           highest resolution, but the offset pad does not fuse in the
#           composed encoder (~17 ms at batch 512, pallas_notes.md)
#   v2sym — per-channel scales, symmetric coding: v2's main accuracy
#           lever at v1's speed (the scales fold into the weights at bake
#           time — zero runtime cost)
#   v3    — v2sym + the two bake-time-only accuracy levers: MSE-optimal
#           clip search (outlier-robust activation scales) and per-channel
#           bias correction (folds the measured mean quantization error
#           into the baked biases).  Same runtime program as v2sym.
SCHEMES: Dict[str, Dict[str, bool]] = {
    "v1": {"per_channel": False, "offset": False},
    "v2": {"per_channel": True, "offset": True},
    "v2sym": {"per_channel": True, "offset": False},
    "v3": {"per_channel": True, "offset": False,
           "mse_clip": True, "bias_correct": True},
    # v4 (round 4): v2sym + quantized tail — the final conv requantizes,
    # its pool and the head's freq mean run int8/int32, dequantization
    # moves to the 16x-smaller post-pool tensor (one extra quantization
    # point on the final activations; accuracy A/B'd like every scheme)
    "v4": {"per_channel": True, "offset": False, "quant_tail": True},
}


# the serving/bench default, promoted by the round-3 throughput x accuracy
# decision table (RESULTS.md "int8 scheme selection"): v2sym is the fastest
# scheme (1.21x bf16) and every scheme's CIDEr delta is inside seed noise
DEFAULT_INT8_SCHEME = "v2sym"


def scheme_kwargs(name: str) -> Dict[str, bool]:
    if name not in SCHEMES:
        raise ValueError(
            f"int8_scheme must be one of {sorted(SCHEMES)}, got {name!r}")
    return dict(SCHEMES[name])


def quant_encoder_for(conf: Dict[str, Any], model: Any, params: Dict[str, Any],
                      batch_stats: Optional[Dict[str, Any]],
                      calib: Optional[Tuple[Any, Any]] = None,
                      **scheme_kw) -> QuantPannEncoder:
    """Validate an experiment's config/model for int8 serving and build the
    calibrated encoder — the one place the guard conditions and the
    calibration call live (shared by ``cli evaluate``, ``cli serve`` and
    ``bench.py``).

    ``calib=(feats, feat_lens)`` calibrates on a real batch (what ``cli
    evaluate`` passes — its dataset is already open); without it the
    scales come from the bn0-running-stats synthesis, the serving path
    where no training data exists."""
    if conf.get("encodermodel") not in ("Cnn10", "Cnn14"):
        raise ValueError("encoder_int8 supports the PANN Cnn10/"
                         "Cnn14 encoders only")
    if not hasattr(model, "inference_from_encoded"):
        raise ValueError(
            "encoder_int8 requires a model exposing inference_from_encoded "
            f"(the VAECaptionModel family); {type(model).__name__} does not")
    stats = (batch_stats or {}).get("encoder", {})
    if "_MelBatchNorm_0" not in stats:
        raise ValueError(
            "encoder_int8 needs the encoder's batch_stats (bn0 running "
            "mean/var) for calibration; this checkpoint has none")
    variables = {"params": params["encoder"], "batch_stats": stats}
    arch = conf["encodermodel"]
    channels = tuple(conf.get("encoder_args", {}).get(
        "channels", (64, 128, 256, 512)))
    if calib is not None:
        feats, lens = calib
        return QuantPannEncoder(variables, jnp.asarray(feats, jnp.float32),
                                jnp.asarray(lens, jnp.int32), arch=arch,
                                channels=channels, **scheme_kw)
    return QuantPannEncoder.from_bn0_stats(variables, arch=arch,
                                           channels=channels, **scheme_kw)


def int8_decode_fn(model: Any, quant: QuantPannEncoder, **decode_kwargs):
    """Jitted decode closure: int8 encoder in front of the model's decode
    machinery (``inference_from_encoded`` + the enc→dec dim adapter)."""
    @jax.jit
    def decode(variables, feats, feat_lens, key):
        encoded = quant(feats, feat_lens)
        return model.apply(variables, encoded, apply_ln=True,
                           rngs={"sample": key},
                           method=model.inference_from_encoded,
                           **decode_kwargs)
    return decode
