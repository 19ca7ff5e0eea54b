"""Quantized conv / dense layers (reference: utils/conv2d_func.py).

Semantics (conv2d_func.py:20-25, 41-47, 60-65):

    input_q  = Q_act(x / Ka)
    weight_q = Q_weight(w / Kw)
    y        = (conv(input_q, weight_q) [+ b/(Ka*Kw)]) * Ka * Kw

TPU-first design:

- NHWC activations / HWIO kernels (MXU-friendly; the reference is NCHW/OIHW).
- The quantizers run in exact float32; the conv itself can optionally run in
  bfloat16 with float32 accumulation (``compute_dtype=jnp.bfloat16``) — the
  bf16 mantissa error (2**-8) is ~10x below the SLFP<3,4> code spacing
  (2**(1/16)-1), so accuracy impact is negligible while the MXU runs at
  full rate.  ``compute_dtype=None`` keeps full fp32 parity.
- Calibration capture is explicit and jit-friendly: with ``capture="absmax"``
  the layer sows scalar max|x|, max|w|, max|y| into the "calib" collection
  (what the reference's get_scale_factor reduces on the host,
  cifar100_train_eval.py:213-277); with ``capture="full"`` it sows the whole
  ``input_q``/``weight_q`` tensors into "intermediates" (the reference's
  per-layer attribute stash, conv2d_func.py:21-22).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.ops import sfp


def _maybe_cast(x, dtype):
    return x if dtype is None else x.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_f32acc(a, b, strides, padding, groups):
    """conv with f32 accumulation that is differentiable for bf16 inputs.

    ``lax.conv_general_dilated(bf16, bf16, preferred_element_type=f32)``
    yields an f32 primal, so JAX's conv transpose rule would call conv with
    (f32 cotangent, bf16 operand) — a dtype-mismatch TypeError.  The custom
    VJP computes the (accumulation-dtype-independent) cotangents on f32
    casts, keeping the bf16 MXU forward and exact f32 gradients.
    """
    return jax.lax.conv_general_dilated(
        a, b, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.float32)


def _conv_f32acc_fwd(a, b, strides, padding, groups):
    return _conv_f32acc(a, b, strides, padding, groups), (a, b)


def _conv_f32acc_bwd(strides, padding, groups, res, g):
    a, b = res
    _, vjp = jax.vjp(
        lambda a32, b32: jax.lax.conv_general_dilated(
            a32, b32, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups),
        a.astype(jnp.float32), b.astype(jnp.float32))
    da, db = vjp(g.astype(jnp.float32))
    return da.astype(a.dtype), db.astype(b.dtype)


_conv_f32acc.defvjp(_conv_f32acc_fwd, _conv_f32acc_bwd)



def _sow_absmax(mdl, tag: str, value) -> None:
    """Sow max|value| into the "calib" collection, keyed by layer id."""
    lid = mdl.layer_id
    name = f"{tag}{lid}" if lid is not None else tag
    mdl.sow("calib", name, jnp.max(jnp.abs(value)),
            reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0))


class QuantConv(nn.Module):
    """Quantized 2D convolution with per-tensor max scaling.

    Mirrors ``conv2d_Q`` / ``conv2d_Q_bias`` (conv2d_func.py:8-48): ``ka`` and
    ``kw`` are the *already divided* scale constants (max_abs / 15.5) the
    models thread in per layer.
    """

    features: int
    kernel_size: Sequence[int]
    qbit: int = 32
    ka: float = 1.0
    kw: float = 1.0
    strides: Sequence[int] = (1, 1)
    padding: Any = 0  # int p -> ((p,p),(p,p)), torch-style; or explicit pairs
    feature_group_count: int = 1
    use_bias: bool = False
    capture: Optional[str] = None  # None | "absmax" | "full"
    compute_dtype: Optional[Any] = None
    layer_id: Optional[int] = None  # reference layer index, for calib dumps
    frozen_weights: bool = False  # kernel already holds Q(w/Kw) (inference)
    use_pallas: Optional[bool] = None  # None = auto (1x1 bf16 SLFP8 path)
    nonneg_input: bool = False  # input is post-ReLU/pool: skip sign handling

    def _pallas_eligible(self, packed: bool) -> bool:
        if self.use_pallas is False:
            return False
        kh, kw_ = self.kernel_size
        pad = self.padding
        pad_zero = pad in (0, (0, 0)) or pad == ((0, 0), (0, 0))
        shape_ok = (self.qbit == 8 and kh == kw_ == 1
                    and self.feature_group_count == 1 and pad_zero
                    and self.capture is None)
        # Auto mode: Pallas only for uint8-packed serving weights (decode in
        # VMEM is the point; 4x less weight HBM) on a real TPU.  For float
        # weights the XLA conv + fused integer quantize path measures faster
        # (docs/DESIGN.md A/B), so auto keeps it.
        want = (self.use_pallas is True
                or (self.use_pallas is None
                    and packed
                    and self.compute_dtype == jnp.bfloat16
                    and jax.default_backend() == "tpu"))
        return shape_ok and want

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw_ = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (kh, kw_, in_features // self.feature_group_count, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        ka = np.float32(self.ka)
        kw = np.float32(self.kw)
        if self.capture == "absmax":
            _sow_absmax(self, "in", x)
            _sow_absmax(self, "w", kernel)

        packed = kernel.dtype == jnp.uint8  # ops.freeze.pack_variables
        if self.frozen_weights:
            weight_q = kernel  # pre-quantized (and possibly packed) offline
        else:
            weight_q = sfp.quantize_weight(kernel / kw, self.qbit)

        if self._pallas_eligible(packed):
            # Fused Pallas path: quantize-in-VMEM (+ uint8 weight decode) +
            # MXU dot + scaled epilogue (kernels/fused_matmul.py);
            # numerically equivalent to the XLA path below.
            from cnns_slfp_quantization_tpu.kernels import fused_matmul

            y = fused_matmul.quant_conv1x1(
                x, weight_q.reshape(weight_q.shape[-2], weight_q.shape[-1]),
                ka=float(ka), kw=float(kw), bias=bias,
                stride=tuple(self.strides)[0],
                nonneg=self.nonneg_input,
                out_dtype=self.compute_dtype or jnp.float32,
            )
            return y
        if packed:
            weight_q = sfp.unpack_slfp34(kernel)

        if (self.compute_dtype == jnp.bfloat16 and self.capture is None
                and self.qbit in (7, 8)):
            # integer-domain fused scale+quantize+bf16-cast (~2.5x fewer VPU
            # ops than the float path; bit-identical for pow2 scales, <=1ulp
            # scaled-input divergence otherwise — see sfp.py)
            input_q = sfp.fused_scale_quant_act_bf16(
                x, float(1.0 / np.float64(ka)), self.qbit, self.nonneg_input)
        else:
            input_q = sfp.quantize_act(x / ka, self.qbit)
        if self.capture == "full":
            self.sow("intermediates", "input_q", input_q)
            self.sow("intermediates", "weight_q", weight_q)
            # the raw input + declared hint, so tests can check nonneg_input
            self.sow("intermediates", "input_raw", x)
            self.sow("intermediates", "nonneg_hint",
                     jnp.asarray(self.nonneg_input))

        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif len(pad) == 2 and all(isinstance(p, int) for p in pad):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        y = _conv_f32acc(
            _maybe_cast(input_q, self.compute_dtype),
            _maybe_cast(weight_q, self.compute_dtype),
            tuple(self.strides),
            tuple(map(tuple, pad)),
            self.feature_group_count,
        )
        if bias is not None:
            # conv2d_func.py:44: bias_q = b/(Ka*Kw) added pre-scale.
            y = y + bias / (ka * kw)
        y = y * (ka * kw)
        if self.compute_dtype is not None:
            # keep the activation stream in the compute dtype end-to-end
            # (HBM traffic halves; the cast fuses into the conv epilogue)
            y = y.astype(self.compute_dtype)
        if self.capture == "absmax":
            _sow_absmax(self, "out", y)
        return y


class QuantDense(nn.Module):
    """Quantized fully-connected layer (``linear_Q``, conv2d_func.py:50-66)."""

    features: int
    qbit: int = 32
    ka: float = 1.0
    kw: float = 1.0
    use_bias: bool = True
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    layer_id: Optional[int] = None
    frozen_weights: bool = False
    use_pallas: Optional[bool] = None
    nonneg_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (in_features, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        ka = np.float32(self.ka)
        kw = np.float32(self.kw)
        if self.capture == "absmax":
            _sow_absmax(self, "in", x)
            _sow_absmax(self, "w", kernel)

        packed = kernel.dtype == jnp.uint8
        if self.frozen_weights:
            weight_q = kernel
        else:
            weight_q = sfp.quantize_weight(kernel / kw, self.qbit)

        pallas_ok = (self.use_pallas is not False and self.qbit == 8
                     and self.capture is None
                     and self.compute_dtype == jnp.bfloat16
                     and (self.use_pallas is True
                          or (packed and jax.default_backend() == "tpu")))
        if pallas_ok:
            from cnns_slfp_quantization_tpu.kernels import fused_matmul

            return fused_matmul.quant_dense(
                x, weight_q, ka=float(ka), kw=float(kw), bias=bias,
                nonneg=self.nonneg_input,
                out_dtype=self.compute_dtype or jnp.float32)
        if packed:
            weight_q = sfp.unpack_slfp34(kernel)

        if (self.compute_dtype == jnp.bfloat16 and self.capture is None
                and self.qbit in (7, 8)):
            input_q = sfp.fused_scale_quant_act_bf16(
                x, float(1.0 / np.float64(ka)), self.qbit, self.nonneg_input)
        else:
            input_q = sfp.quantize_act(x / ka, self.qbit)
        if self.capture == "full":
            self.sow("intermediates", "input_q", input_q)
            self.sow("intermediates", "weight_q", weight_q)
            self.sow("intermediates", "input_raw", x)
            self.sow("intermediates", "nonneg_hint",
                     jnp.asarray(self.nonneg_input))

        y = jnp.dot(
            _maybe_cast(input_q, self.compute_dtype),
            _maybe_cast(weight_q, self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            y = y + bias / (ka * kw)
        y = y * (ka * kw)
        if self.compute_dtype is not None:
            y = y.astype(self.compute_dtype)
        if self.capture == "absmax":
            _sow_absmax(self, "out", y)
        return y


class LayeroutQuant(nn.Module):
    """SFP<4,4> layer-output quantizer module (sfp_quant.py:163-175)."""

    qbit: int = 32
    bug_compat: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return sfp.quantize_layerout(x, self.qbit, bug_compat=self.bug_compat)
