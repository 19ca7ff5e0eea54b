"""Quantized-inference engine (the north-star serving surface).

One object that takes a trained checkpoint and serves SLFP-quantized
predictions at the deployment configuration measured by bench.py: offline
weight quantization (optionally real uint8 packing), bf16 activation
streaming, fixed-batch jitted forward, optional ('data','model') mesh
sharding for multi-chip serving.

    engine = InferenceEngine("resnet", checkpoint="ckpt/resnet.pth")
    logits = engine.predict(images_nhwc)     # any leading batch size
    top1 = engine.classify(images_nhwc)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.ops import freeze
from cnns_slfp_quantization_tpu.train import checkpoint as ckpt_lib


class InferenceEngine:
    def __init__(
        self,
        net: str,
        *,
        checkpoint: Optional[str] = None,
        qbit: int = 8,
        batch_size: int = 64,
        image_size: Optional[int] = None,
        pack_weights: bool = False,
        compute_dtype=jnp.bfloat16,
        use_pallas: Optional[bool] = False,
        fused: Optional[bool] = None,
        mesh=None,
        scales=None,
    ):
        # ``scales``: per-checkpoint calibration constants — a calib.ScaleSet
        # or a path to a calibrated JSON (the --pre_reference output,
        # reference workflow cifar100_train_eval.py:287-301).  Without it the
        # shipped constants are used, which belong to the reference's
        # pretrained checkpoints; a custom-calibrated checkpoint MUST pass
        # its own scales or Ka/Kw are silently wrong at serve time.
        if isinstance(scales, (str, bytes)) or hasattr(scales, "read_text"):
            from cnns_slfp_quantization_tpu import calib as _calib

            scales = _calib.load_scales_path(scales)
        self.scales = scales
        # fused=None (auto): the BN-folded fused executor for SLFP8
        # ResNet-50 (+8% measured, bench.py's configuration) and the ReLU
        # MobileNetV1 variants (+7.3%) — but never overriding an explicit
        # request for the Pallas module path or full-fp32 numerics.
        # Explicit True/False overrides the auto choice (True validates its
        # preconditions).  ``pack_weights=True`` composes with the fused
        # executors (their ``_wv`` decodes uint8 SLFP codes in-graph): the
        # 4x-capacity serving format runs on the fastest executor
        # (docs/DESIGN.md packed-fused table for the throughput trade).
        _fusable = {
            "resnet": "r", "resnet50": "r", "imgnet/resnet": "r",
            "mobilenet": "mc", "cifar/mobilenet": "mc",
            "mobilenetv1": "mi", "imgnet/mobilenetv1": "mi",
            # +5.5% measured over the bf16 frozen module path
            # (tools/bench_shufflenet_fused.py, docs/DESIGN.md round 5)
            "shufflenetv2": "s", "cifar/shufflenetv2": "s",
        }
        self._fuse_kind = _fusable.get(net)
        if fused is None:
            fused = (self._fuse_kind is not None and qbit == 8
                     and use_pallas is not True
                     and compute_dtype == jnp.bfloat16)
        elif fused:
            if not (self._fuse_kind is not None and qbit == 8):
                raise ValueError(
                    "fused=True requires net in {resnet, mobilenet, "
                    "mobilenetv1, shufflenetv2} and qbit=8 (the fused "
                    "executors consume SLFP<3,4> frozen weights — float or "
                    "packed uint8)")
        self.fused = fused
        self.batch_size = batch_size
        self.image_size = image_size or (
            32 if net in models.MODEL_NAMES["cifar"] else 224)
        self.qbit = qbit
        self.mesh = mesh

        init_model = models.create_model(net, qbit)
        sample = jnp.zeros((1, self.image_size, self.image_size, 3),
                           jnp.float32)
        variables = init_model.init(jax.random.PRNGKey(0), sample,
                                    train=False)
        if checkpoint:
            if str(checkpoint).endswith(".pth"):
                variables = ckpt_lib.load_pth(checkpoint, variables)
            else:
                variables = ckpt_lib.restore(checkpoint)

        frozen = qbit in (7, 8)
        if frozen:
            # the capture model must carry the SAME scales: frozen weights
            # are stored as Q_w(w/Kw), so a custom-calibrated Kw changes them
            cap = models.create_model(net, qbit, capture="full",
                                      scales=self.scales)
            if pack_weights and qbit == 8:
                variables = freeze.pack_variables(cap, variables, sample)
            else:
                variables = freeze.prequantize_variables(cap, variables, sample)
        self.variables = variables

        if self.fused:
            from cnns_slfp_quantization_tpu import calib

            if self._fuse_kind == "r":
                from cnns_slfp_quantization_tpu.models import resnet50_fused

                self.model = resnet50_fused.as_model(
                    self.scales or calib.load_scales("resnet50_imgnet"))
            elif self._fuse_kind == "s":
                from cnns_slfp_quantization_tpu.models import shufflenetv2_fused

                self.model = shufflenetv2_fused.as_model(
                    self.scales or calib.load_scales("shufflenetv2_cifar"))
            else:
                from cnns_slfp_quantization_tpu.models import mobilenetv1_fused

                self.model = mobilenetv1_fused.as_model(
                    self.scales or calib.load_scales(
                        "mobilenetv1_cifar" if self._fuse_kind == "mc"
                        else "mobilenetv1_imgnet"),
                    quant_classifier=self._fuse_kind == "mc")
        else:
            self.model = models.create_model(
                net, qbit, compute_dtype=compute_dtype,
                frozen_weights=frozen, use_pallas=use_pallas,
                scales=self.scales)
        self._forward = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False))
        if mesh is not None:
            from cnns_slfp_quantization_tpu.parallel import mesh as mesh_lib

            self.variables = jax.device_put(
                variables, mesh_lib.param_shardings(variables, mesh))

    def predict(self, images) -> np.ndarray:
        """Logits for NHWC float32 images; any leading batch size (padded
        internally to the fixed compiled batch)."""
        x = np.asarray(images, np.float32)
        n = x.shape[0]
        out = []
        for s in range(0, n, self.batch_size):
            chunk = x[s:s + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            xb = jnp.asarray(chunk)
            if self.mesh is not None:
                from cnns_slfp_quantization_tpu.parallel import mesh as mesh_lib

                xb = jax.device_put(xb, mesh_lib.batch_sharding(self.mesh))
            y = self._forward(self.variables, xb)
            out.append(np.asarray(y[:chunk.shape[0] - pad if pad else None],
                                  np.float32))
        return np.concatenate(out)[:n]

    def classify(self, images) -> np.ndarray:
        """Top-1 class ids."""
        return np.argmax(self.predict(images), axis=-1)

    def throughput(self, iters: int = 16) -> float:
        """images/sec at the compiled batch size (relay-proof timing)."""
        from cnns_slfp_quantization_tpu.utils.profiling import scan_throughput

        x = jnp.zeros((self.batch_size, self.image_size, self.image_size, 3),
                      jnp.float32)
        return scan_throughput(self.model, self.variables, x, steps=iters)
