"""Statistical PTQ-accuracy parity harness vs the reference torch oracle.

The reference's real verification loop is dataset accuracy
(cifar100_train_eval.py:196-211, imgnet_train_eval.py:177-216) and its
headline claim is "<1% top-1 loss from SLFP<3,4> PTQ" (README.md:11).  No
datasets or pretrained checkpoints exist in this environment, so this
harness builds the strongest dataset-free substitute:

1. train our model (fp32) on class-conditional synthetic data until it is a
   real classifier (synthetic top-1 far above chance),
2. export the trained weights into the *actual reference torch model*
   (``checkpoint.export_torch_state_dict``),
3. evaluate thousands of held-out inputs in BOTH frameworks at BOTH fp32 and
   SLFP8,
4. compare the frameworks' *PTQ-induced top-1 flip rates* and accuracy
   deltas: if quantization flips the same fraction of decisions in both
   frameworks (within binomial noise), our SLFP8 loses exactly as much
   accuracy as the reference's — the "<1% PTQ loss" property transfers.

Usage:
    python -m cnns_slfp_quantization_tpu.cli.ptq_accuracy \
        --nets mobilenet shufflenetv2 vgg16 --eval_images 2000

Writes one JSON line per net and a markdown table (--out).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.calib import calibrate as calibrate_lib
from cnns_slfp_quantization_tpu.data import synthetic
from cnns_slfp_quantization_tpu.train import checkpoint, loop

def _mbv1_imgnet(m, q, nc):
    t = m.MobileNetV1_Q(ch_in=3, qbit=q)
    if nc != 1000:
        # the reference hard-codes nn.Linear(1024, 1000)
        # (nets_imgnet/mobilenetv1.py:61); the harness controls the oracle
        # instance, so swap the (unquantized) classifier for the task size
        import torch.nn as nn

        t.fc = nn.Linear(1024, nc)
    return t


# net -> (dataset, image size, classes, dropout, ref module, ref builder)
NETS = {
    "mobilenet": ("cifar", 32, 100, False, "nets_cifar.mobilenetv1",
                  lambda m, q, nc: m.MobileNetV1_Q(ch_in=3, qbit=q)),
    # act-optimized variants: layerout SFP<4,4> quant (the path with the
    # reference's dead-subnormal bug, nets_cifar/mobilenetv1.py:176-208,
    # vgg16.py:186-296) + Swish/GELU — statistical coverage beyond the
    # 2-input logit parity test
    "mobilenet_swish": ("cifar", 32, 100, False, "nets_cifar.mobilenetv1",
                        lambda m, q, nc: m.MobileNetV1_swish(ch_in=3, qbit=q)),
    "shufflenetv2": ("cifar", 32, 100, False, "nets_cifar.shufflenet_v2",
                     lambda m, q, nc: m.ShuffleNetV2(qbit=q)),
    "vgg16": ("cifar", 32, 100, True, "nets_cifar.vgg16",
              lambda m, q, nc: m.VGG16_Q(qbit=q)),
    "vgg16_gelu": ("cifar", 32, 100, True, "nets_cifar.vgg16",
                   lambda m, q, nc: m.VGG16_gelu(qbit=q)),
    "mobilenetv1": ("imgnet", 224, 1000, False, "nets_imgnet.mobilenetv1",
                    _mbv1_imgnet),
    # 64px keeps the torch-CPU oracle tractable; ResNet50's avgpool adapts
    "resnet": ("imgnet", 64, 1000, False, "nets_imgnet.resnet50",
               lambda m, q, nc: m.ResNet50(qbit=q, num_classes=nc)),
    "alexnet": ("imgnet", 224, 1000, True, "nets_imgnet.alexnet",
                lambda m, q, nc: m.AlexNet(qbit=q, num_classes=nc)),
    "squeezenet": ("imgnet", 224, 1000, True, "nets_imgnet.squeezenet1_0",
                   lambda m, q, nc: m.SqueezeNet(qbit=q, num_classes=nc)),
}


# per-net fp32 training lr for the synthetic task (batch 64, SGD m=0.9):
# the no-BN nets (alexnet, squeezenet) diverge at the BN-net default 0.05;
# VGG/ResNet train much better at 0.01 here
# alexnet/squeezenet train with adam (TASK "opt"); probed: adam 1e-3
# collapses them the same way SGD does, adam 1e-4 trains them cleanly
DEFAULT_LR = {"vgg16": 0.003, "vgg16_gelu": 0.01, "resnet": 0.01,
              "alexnet": 1e-4, "squeezenet": 1e-4}

# Per-net synthetic-task difficulty, tuned (round 5, TPU probe runs) so
# fp32 top-1 lands in the INFORMATIVE 60-90% band: at saturation (~100%)
# almost nothing flips and "flip diff within 2se" is trivially true; in the
# degenerate regime (<30%) rows compare near-random models.  ``signal`` is
# the class-signature amplitude vs unit noise (data/synthetic.py);
# ``proto_res`` raises signature resolution so convnets can't average the
# noise away; ``classes`` shrinks the 1000-class ImageNet task to one the
# no-BN nets can actually learn in a few hundred steps.
# Probe evidence (tools/tune_task_signal.py, 300 steps): proto_res=16
# never trains (any signal — the fine-grained task removes the
# low-frequency redundancy these CNNs learn from); at proto_res=4 training
# has an optimization cliff (signal <= 0.15 stays at chance) and
# signal=0.25 lands mobilenet at 77.7% — the band's sweet spot.
# Probed fp32 top-1 at 300 steps: mobilenet 77.7 @0.25, mobilenet_swish
# 90.2 @0.2, shufflenetv2 85.5 @0.25, vgg16 88.1 @0.35 (2.4 @0.25 — its
# cliff sits higher), vgg16_gelu 64.2 @0.2, resnet 70.5 @0.25 (1000-class).
TASK = {
    "mobilenet": {"signal": 0.25},
    "mobilenet_swish": {"signal": 0.2},
    "shufflenetv2": {"signal": 0.25},
    "vgg16": {"signal": 0.35},
    "vgg16_gelu": {"signal": 0.2},
    "resnet": {"signal": 0.25},
    "mobilenetv1": {"classes": 100, "signal": 0.2},
    # The no-BN nets never escape chance under SGD momentum at ANY
    # (lr, signal) probed (lr 5e-3..8e-2, signal 0.5..4.0: loss pinned at
    # ln(100) — dead-ReLU collapse without normalization); Adam trains
    # them.  The fp32 training recipe is harness-internal — the claim under
    # test (PTQ flip parity vs the torch oracle) only needs a mid-accuracy
    # classifier, whatever optimizer produced it.
    # signal_jitter (per-image amplitude ~ U[0, 2*signal]) keeps these
    # nets' held-out top-1 mid-band: their train-accuracy transition is a
    # cliff (chance -> 92% inside 50 adam steps at fixed amplitude), so
    # population accuracy is tuned by the margin distribution instead
    "alexnet": {"classes": 100, "signal": 0.5, "opt": "adam",
                "signal_jitter": True},
    "squeezenet": {"classes": 100, "signal": 0.5, "opt": "adam",
                   "signal_jitter": True},
}


def task_params(name: str, *, signal=None, classes=None, proto_res=None,
                signal_jitter=None, opt=None):
    """Resolve the per-net synthetic-task configuration (CLI overrides win)."""
    dataset, size, default_classes, has_dropout, modname, builder = NETS[name]
    t = TASK.get(name, {})
    return {
        "size": size,
        "classes": int(classes or t.get("classes", default_classes)),
        "signal": float(signal if signal is not None
                        else t.get("signal", 0.7)),
        "proto_res": int(proto_res or t.get("proto_res", 4)),
        "signal_jitter": bool(t.get("signal_jitter", False)
                              if signal_jitter is None else signal_jitter),
        "opt": str(opt or t.get("opt", "sgd")),
        "has_dropout": has_dropout,
        "modname": modname,
        "builder": builder,
    }


def _import_ref_module(reference_dir: str, modname: str):
    for stub in ("torchsummary", "tensorboardX", "torchsummaryX", "tqdm"):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            mod.summary = lambda *a, **k: None
            sys.modules[stub] = mod
    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)
    import importlib

    return importlib.import_module(modname)


def train_our_model(name: str, *, train_steps: int, batch_size: int,
                    lr: float, seed: int = 0, log_every: int = 50,
                    task=None):
    """Train our fp32 model on synthetic class-conditional data."""
    task = task or task_params(name)
    size, classes = task["size"], task["classes"]
    model = models.create_model(name, 32, num_classes=classes)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x0, train=False)

    if task["opt"] == "adam":
        tx = optax.adam(lr)
    else:
        tx = optax.chain(optax.add_decayed_weights(5e-4),
                         optax.sgd(lr, momentum=0.9))
    state = loop.TrainState.create(variables, tx)
    step = jax.jit(loop.make_train_step(model, tx, task["has_dropout"]),
                   donate_argnums=0)
    it = synthetic.SyntheticIterator(
        image_size=size, num_classes=classes, batch_size=batch_size,
        num_batches=train_steps, seed=seed, signal=task["signal"],
        proto_res=task["proto_res"], signal_jitter=task["signal_jitter"])
    rng = jax.random.PRNGKey(seed + 1)
    for i, (images, labels) in enumerate(it):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(labels),
                              sub)
        if i % 8 == 0:
            # host scalar fetch every few steps keeps the axon relay's
            # async dispatch queue shallow (deep queues stall the relay —
            # docs/DESIGN.md "Axon environment quirks")
            float(jax.device_get(metrics["loss"]))
        if log_every and i % log_every == 0:
            m = jax.device_get(metrics)
            print(f"  [{name}] step {i}: loss={float(m['loss']):.3f} "
                  f"acc={float(m['accuracy']):.3f}", flush=True)
    # raw init-order dict with trained leaves (positional export relies on
    # insertion order, so graft trained arrays back into the init dict)
    trained = jax.device_get(state.variables())

    def graft(init_node, new_node):
        if isinstance(init_node, dict):
            return {k: graft(v, new_node[k]) for k, v in init_node.items()}
        return np.asarray(new_node)

    return model, graft(variables, trained)


def calibrate_trained(name: str, variables, calib_images, batch: int,
                      num_classes=None):
    """Reference calibration workflow (cifar100_train_eval.py:213-301) on
    the trained fp32 model: absmax over a calibration set -> ScaleSet."""
    cap = models.create_model(name, 32, capture="absmax",
                              num_classes=num_classes)
    batches = [(calib_images[i:i + batch],)
               for i in range(0, len(calib_images), batch)]
    result = calibrate_lib.calibrate(cap, variables, batches,
                                     max_images=len(calib_images))
    divisor = 15.0 if name.startswith("shufflenet") else 15.5
    ka = np.asarray(result.ka_max(), np.float64) / divisor
    kw = np.asarray(result.kw_max(), np.float64) / divisor
    n = max(len(ka), len(kw))

    def padto(a):
        return np.concatenate([a, np.ones(n - len(a))]) if len(a) < n else a

    return calib.ScaleSet(padto(ka), padto(kw), divisor,
                          source="ptq_accuracy synthetic calibration")


def _quant_modules(tmodel):
    return [m for m in tmodel.modules()
            if hasattr(m, "quantize_act") and hasattr(m, "Kw")]


def _calibrate_torch(tmodel_fp32, images_nhwc, batch: int, divisor: float):
    """Per-module (Ka, Kw) for the torch oracle, via forward-pre hooks over
    the same calibration set our calibrate() pass uses — the reference's
    'dump maxima -> paste into model source' workflow (SURVEY.md §3.3)
    applied in-process, with no cross-framework index mapping."""
    import torch

    if hasattr(tmodel_fp32, "reset_layer_inputs_outputs"):
        tmodel_fp32.reset_layer_inputs_outputs()
        tmodel_fp32.reset_layer_weights()
    qmods = _quant_modules(tmodel_fp32)
    absmax = {id(m): 0.0 for m in qmods}
    hooks = []
    for m in qmods:
        def hook(mod, inputs, _m=m):
            v = float(inputs[0].abs().max())
            absmax[id(_m)] = max(absmax[id(_m)], v)
        hooks.append(m.register_forward_pre_hook(hook))
    x_nchw = np.transpose(images_nhwc, (0, 3, 1, 2)).copy()
    tmodel_fp32.eval()
    with torch.no_grad():
        for i in range(0, len(x_nchw), batch):
            tmodel_fp32(torch.from_numpy(x_nchw[i:i + batch]))
    for h in hooks:
        h.remove()
    return [(absmax[id(m)] / divisor,
             float(m.weight.detach().abs().max()) / divisor)
            for m in qmods]


def _inject_torch_scales(tmodel, per_module_kakw):
    """Overwrite each torch quant module's hard-coded Ka/Kw with the
    hook-calibrated constants (same module order across instances of the
    same architecture)."""
    import torch

    qmods = _quant_modules(tmodel)
    assert len(qmods) == len(per_module_kakw), (
        len(qmods), len(per_module_kakw))
    for mod, (ka, kw) in zip(qmods, per_module_kakw):
        mod.Ka = torch.tensor(ka)
        mod.Kw = torch.tensor(kw)


def _eval_ours(name: str, variables, images_nhwc, batch: int,
               scales=None, num_classes=None):
    """preds + logits for our model at fp32 and SLFP8 (same weights)."""
    out = {}
    for qbit in (32, 8):
        model = models.create_model(name, qbit, num_classes=num_classes,
                                    scales=scales if qbit == 8 else None)
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
        logits = []
        for i in range(0, len(images_nhwc), batch):
            logits.append(np.asarray(
                fn(variables, jnp.asarray(images_nhwc[i:i + batch]))))
        logits = np.concatenate(logits)
        out[qbit] = (np.argmax(logits, -1), logits)
    return out


def _eval_torch(name: str, torch_sd, images_nhwc, batch: int,
                reference_dir: str, calib_images=None, num_classes=None):
    """preds + logits for the reference torch model at fp32 and SLFP8.

    When ``calib_images`` is given, the q8 model's hard-coded Ka/Kw are
    replaced by hook-calibrated constants for these weights (the shipped
    constants belong to the reference's pretrained checkpoints)."""
    import torch

    _, _, default_classes, _, modname, builder = NETS[name]
    nc = num_classes or default_classes
    divisor = 15.0 if name.startswith("shufflenet") else 15.5
    mod = _import_ref_module(reference_dir, modname)
    x_nchw = np.transpose(images_nhwc, (0, 3, 1, 2)).copy()
    per_module = None
    out = {}
    for qbit in (32, 8):
        tmodel = builder(mod, qbit, nc)
        tmodel.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in torch_sd.items()})
        if qbit == 32 and calib_images is not None:
            per_module = _calibrate_torch(tmodel, calib_images, batch, divisor)
        if qbit == 8 and per_module is not None:
            _inject_torch_scales(tmodel, per_module)
        tmodel.eval()
        if hasattr(tmodel, "reset_layer_inputs_outputs"):
            tmodel.reset_layer_inputs_outputs()
            tmodel.reset_layer_weights()
        logits = []
        with torch.no_grad():
            for i in range(0, len(x_nchw), batch):
                logits.append(
                    tmodel(torch.from_numpy(x_nchw[i:i + batch])).numpy())
        logits = np.concatenate(logits)
        out[qbit] = (np.argmax(logits, -1), logits)
    return out


def gen_eval_sets(name: str, eval_images: int, eval_batch: int, seed: int,
                  task=None):
    """Deterministic held-out eval + calibration sets (same class
    prototypes as training, fresh noise via seed offsets) — regenerable in
    any process, so the staged artifacts don't need to carry image tensors."""
    task = task or task_params(name)
    size, classes = task["size"], task["classes"]
    kw = dict(signal=task["signal"], proto_res=task["proto_res"],
              signal_jitter=task["signal_jitter"])
    n_batches = math.ceil(eval_images / eval_batch)
    it = synthetic.SyntheticIterator(
        image_size=size, num_classes=classes, batch_size=eval_batch,
        num_batches=n_batches, seed=seed + 10_000, **kw)
    images, labels = [], []
    for x, y in it:
        images.append(x); labels.append(y)
    images = np.concatenate(images)[:eval_images]
    labels = np.concatenate(labels)[:eval_images]

    n_cal = min(512, eval_images)
    cal_it = synthetic.SyntheticIterator(
        image_size=size, num_classes=classes, batch_size=eval_batch,
        num_batches=-(-n_cal // eval_batch), seed=seed + 20_000, **kw)
    calib_images = np.concatenate([x for x, _ in cal_it])[:n_cal]
    return images, labels, calib_images


def jax_stage(name: str, *, train_steps: int = 300, batch_size: int = 64,
              eval_images: int = 2000, eval_batch: int = 64,
              lr: float | None = None, signal: float | None = None,
              classes: int | None = None, proto_res: int | None = None,
              seed: int = 0, reference_dir: str = "/root/reference") -> dict:
    """Everything that needs the TPU (or our framework): train, calibrate,
    evaluate ours, export torch weights.  Returns the artifact dict the
    (CPU-only, slow) torch stage consumes — stageable to disk so the torch
    oracle can run in the background without holding the accelerator."""
    task = task_params(name, signal=signal, classes=classes,
                       proto_res=proto_res)
    if lr is None:
        lr = DEFAULT_LR.get(name, 0.05)
    model, variables = train_our_model(
        name, train_steps=train_steps, batch_size=batch_size, lr=lr,
        seed=seed, task=task)

    images, labels, calib_images = gen_eval_sets(name, eval_images,
                                                 eval_batch, seed, task=task)
    # reference workflow: calibrate the trained fp32 model, give BOTH
    # frameworks' quantized models constants derived from the same
    # calibration set (shipped constants belong to the reference's
    # pretrained checkpoints, not these weights)
    qscales = calibrate_trained(name, variables, calib_images, eval_batch,
                                num_classes=task["classes"])

    ours = _eval_ours(name, variables, images, eval_batch, scales=qscales,
                      num_classes=task["classes"])

    ref_mod = _import_ref_module(reference_dir, task["modname"])
    template = task["builder"](ref_mod, 32, task["classes"]).state_dict()
    torch_sd = checkpoint.export_torch_state_dict(variables, template)
    return {
        "name": name, "train_steps": train_steps, "eval_batch": eval_batch,
        "eval_images": eval_images, "seed": seed,
        "signal": task["signal"], "classes": task["classes"],
        "proto_res": task["proto_res"],
        "signal_jitter": task["signal_jitter"],
        "images": images, "labels": labels, "calib_images": calib_images,
        "pj32": ours[32][0], "pj8": ours[8][0], "lj8": ours[8][1],
        "torch_sd": {k: np.asarray(v) for k, v in torch_sd.items()},
    }


def save_artifacts(art: dict, artifact_dir: str) -> str:
    """Image tensors are NOT saved (gigabytes at 224px x 2000): the synthetic
    sets are deterministic from (net, eval_images, eval_batch, seed) and are
    regenerated by :func:`load_artifacts`."""
    os.makedirs(artifact_dir, exist_ok=True)
    path = os.path.join(artifact_dir, f"{art['name']}.npz")
    flat = {k: art[k] for k in ("labels", "pj32", "pj8", "lj8")}
    for k, v in art["torch_sd"].items():
        flat[f"sd::{k}"] = v
    flat["meta"] = np.asarray(
        [art["train_steps"], art["eval_batch"], art["eval_images"],
         art["seed"], art["classes"], art["proto_res"],
         int(art["signal_jitter"])], np.int64)
    flat["meta_f"] = np.asarray([art["signal"]], np.float64)
    np.savez_compressed(path, **flat)
    return path


def load_artifacts(name: str, artifact_dir: str) -> dict:
    with np.load(os.path.join(artifact_dir, f"{name}.npz")) as z:
        art = {"name": name,
               "train_steps": int(z["meta"][0]),
               "eval_batch": int(z["meta"][1]),
               "eval_images": int(z["meta"][2]),
               "seed": int(z["meta"][3]),
               "classes": int(z["meta"][4]) if len(z["meta"]) > 4 else None,
               "proto_res": int(z["meta"][5]) if len(z["meta"]) > 5 else 4,
               "signal_jitter": bool(z["meta"][6]) if len(z["meta"]) > 6
               else False,
               "signal": float(z["meta_f"][0]) if "meta_f" in z.files else 0.7,
               "torch_sd": {k[4:]: z[k] for k in z.files
                            if k.startswith("sd::")}}
        for k in ("labels", "pj32", "pj8", "lj8"):
            art[k] = z[k]
    task = task_params(name, signal=art["signal"], classes=art["classes"],
                       proto_res=art["proto_res"],
                       signal_jitter=art["signal_jitter"])
    images, labels, calib_images = gen_eval_sets(
        name, art["eval_images"], art["eval_batch"], art["seed"], task=task)
    assert np.array_equal(labels, art["labels"]), (
        "regenerated eval set does not match the jax stage (seed drift?)")
    art["images"], art["calib_images"] = images, calib_images
    return art


def torch_stage(art: dict, *, reference_dir: str = "/root/reference") -> dict:
    """The torch-oracle half: evaluate the reference model on the same
    images/weights and compare PTQ flip statistics.  CPU-only."""
    name = art["name"]
    labels = art["labels"]
    theirs = _eval_torch(name, art["torch_sd"], art["images"],
                         art["eval_batch"], reference_dir,
                         calib_images=art["calib_images"],
                         num_classes=art.get("classes"))
    n = len(labels)

    def acc(preds):
        return 100.0 * float(np.mean(preds == labels))

    pj32, pj8 = art["pj32"], art["pj8"]
    pt32, pt8 = theirs[32][0], theirs[8][0]
    flip_j = float(np.mean(pj32 != pj8))
    flip_t = float(np.mean(pt32 != pt8))
    # two-proportion binomial stderr for the flip-rate difference
    se = math.sqrt(flip_j * (1 - flip_j) / n + flip_t * (1 - flip_t) / n)
    lj, lt = art["lj8"], theirs[8][1]
    cos = np.sum(lj * lt, -1) / (
        np.linalg.norm(lj, axis=-1) * np.linalg.norm(lt, axis=-1) + 1e-30)
    return {
        "net": name, "n": n, "train_steps": art["train_steps"],
        "classes": art.get("classes"), "signal": art.get("signal"),
        "acc_fp32_ours": acc(pj32), "acc_slfp8_ours": acc(pj8),
        "acc_fp32_torch": acc(pt32), "acc_slfp8_torch": acc(pt8),
        "ptq_drop_ours": acc(pj32) - acc(pj8),
        "ptq_drop_torch": acc(pt32) - acc(pt8),
        "flip_rate_ours": flip_j, "flip_rate_torch": flip_t,
        "flip_diff": flip_j - flip_t, "flip_diff_se": se,
        "flip_within_2se": bool(abs(flip_j - flip_t) <= max(2 * se, 1e-12)),
        "pred_match_fp32": float(np.mean(pj32 == pt32)),
        "pred_match_slfp8": float(np.mean(pj8 == pt8)),
        "logit_cos_slfp8_mean": float(np.mean(cos)),
        "logit_cos_slfp8_min": float(np.min(cos)),
    }


def run_net(name: str, *, train_steps: int = 300, batch_size: int = 64,
            eval_images: int = 2000, eval_batch: int = 64,
            lr: float | None = None, signal: float | None = None,
            classes: int | None = None, proto_res: int | None = None,
            seed: int = 0, reference_dir: str = "/root/reference") -> dict:
    art = jax_stage(name, train_steps=train_steps, batch_size=batch_size,
                    eval_images=eval_images, eval_batch=eval_batch, lr=lr,
                    signal=signal, classes=classes, proto_res=proto_res,
                    seed=seed, reference_dir=reference_dir)
    return torch_stage(art, reference_dir=reference_dir)


def to_markdown(rows) -> str:
    head = ("| net | n | fp32 top-1 (ours/torch) | SLFP8 top-1 (ours/torch) | "
            "PTQ drop (ours/torch) | flip rate (ours/torch) | "
            "flip diff ± 2se | pred match q8 | logit cos (mean/min) |\n"
            "|---|---|---|---|---|---|---|---|---|\n")
    body = ""
    for r in rows:
        body += (
            f"| {r['net']} | {r['n']} "
            f"| {r['acc_fp32_ours']:.2f} / {r['acc_fp32_torch']:.2f} "
            f"| {r['acc_slfp8_ours']:.2f} / {r['acc_slfp8_torch']:.2f} "
            f"| {r['ptq_drop_ours']:+.2f} / {r['ptq_drop_torch']:+.2f} "
            f"| {100 * r['flip_rate_ours']:.2f}% / "
            f"{100 * r['flip_rate_torch']:.2f}% "
            f"| {100 * r['flip_diff']:+.2f}% ± {200 * r['flip_diff_se']:.2f}% "
            f"| {100 * r['pred_match_slfp8']:.2f}% "
            f"| {r['logit_cos_slfp8_mean']:.4f} / "
            f"{r['logit_cos_slfp8_min']:.4f} |\n")
    return head + body


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nets", nargs="+", default=list(NETS))
    p.add_argument("--train_steps", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--eval_images", type=int, default=2000)
    p.add_argument("--eval_batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=None,
                   help="fp32 train lr (default: per-net DEFAULT_LR / 0.05)")
    p.add_argument("--signal", type=float, default=None,
                   help="synthetic-task signal amplitude (default: per-net "
                        "TASK — tuned for 60-90%% fp32 top-1)")
    p.add_argument("--classes", type=int, default=None,
                   help="synthetic-task class count (default: per-net TASK)")
    p.add_argument("--proto_res", type=int, default=None,
                   help="class-signature resolution (default: per-net TASK)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--reference_dir", type=str, default="/root/reference")
    p.add_argument("--out", type=str, default=None,
                   help="write a markdown table here")
    p.add_argument("--stage", choices=["all", "jax", "torch"], default="all",
                   help="'jax': train/calibrate/eval ours on the accelerator "
                        "and save artifacts; 'torch': run the (slow, "
                        "CPU-only) reference oracle from saved artifacts; "
                        "'all': both in-process")
    p.add_argument("--artifact_dir", type=str, default="/tmp/ptq_acc",
                   help="artifact handoff dir for the staged modes")
    p.add_argument("--jax_cache", type=str, default="/tmp/jax_cache")
    cfg = p.parse_args(argv)
    if cfg.jax_cache and cfg.stage != "torch":
        os.makedirs(cfg.jax_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rows = []
    for name in cfg.nets:
        print(f"== {name} ==", flush=True)
        if cfg.stage == "jax":
            art = jax_stage(name, train_steps=cfg.train_steps,
                            batch_size=cfg.batch_size,
                            eval_images=cfg.eval_images,
                            eval_batch=cfg.eval_batch, lr=cfg.lr,
                            signal=cfg.signal, classes=cfg.classes,
                            proto_res=cfg.proto_res,
                            seed=cfg.seed, reference_dir=cfg.reference_dir)
            path = save_artifacts(art, cfg.artifact_dir)
            print(f"artifacts -> {path}", flush=True)
            continue
        if cfg.stage == "torch":
            r = torch_stage(load_artifacts(name, cfg.artifact_dir),
                            reference_dir=cfg.reference_dir)
        else:
            r = run_net(name, train_steps=cfg.train_steps,
                        batch_size=cfg.batch_size,
                        eval_images=cfg.eval_images,
                        eval_batch=cfg.eval_batch, lr=cfg.lr,
                        signal=cfg.signal, classes=cfg.classes,
                        proto_res=cfg.proto_res, seed=cfg.seed,
                        reference_dir=cfg.reference_dir)
        print(json.dumps(r), flush=True)
        rows.append(r)
    if cfg.out and rows:
        with open(cfg.out, "w") as f:
            f.write(to_markdown(rows))
    return rows


if __name__ == "__main__":
    main()
