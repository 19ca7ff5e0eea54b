"""Generate per-variant calibration constants for the act-optimized ResNets.

Swapping ReLU -> STL/Swish changes every layer-input distribution, so the
ReLU-calibrated ``resnet50_imgnet`` Ka are stale for ``resnet_stl`` /
``resnet_swish`` (the reference's own Swish variant ships distinct ka/kw:
nets_cifar/mobilenetv1.py:180-186 vs :14-19).  This tool reproduces the
reference calibration workflow (cifar100_train_eval.py:213-301) for the
variants on synthetic data: briefly train the fp32 variant model so weights
and BN stats are meaningful, then run the absmax calibration pass and write
``calib/constants/resnet50_{stl,swish}_imgnet.json``.

Run on the TPU:  python tools/calibrate_act_variants.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.calib import calibrate as calibrate_lib
from cnns_slfp_quantization_tpu.data import synthetic
from cnns_slfp_quantization_tpu.train import loop


def calibrate_variant(act: str, *, train_steps: int, batch: int, size: int,
                      calib_images: int, out_dir=None):
    name = f"resnet_{act}"
    model = models.create_model(name, 32)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    tx = optax.chain(optax.add_decayed_weights(5e-4),
                     optax.sgd(0.05, momentum=0.9))
    state = loop.TrainState.create(variables, tx)
    step = jax.jit(loop.make_train_step(model, tx), donate_argnums=0)
    it = synthetic.SyntheticIterator(
        image_size=size, num_classes=1000, batch_size=batch,
        num_batches=train_steps, seed=0)
    rng = jax.random.PRNGKey(1)
    for i, (images, labels) in enumerate(it):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(labels), sub)
        if i % 25 == 0:
            m = jax.device_get(metrics)
            print(f"  [{name}] step {i}: loss={float(m['loss']):.3f}",
                  flush=True)

    trained = jax.device_get(state.variables())

    def graft(init_node, new_node):
        if isinstance(init_node, dict):
            return {k: graft(v, new_node[k]) for k, v in init_node.items()}
        return jnp.asarray(new_node)

    variables = graft(variables, trained)

    cap_model = models.create_model(name, 32, capture="absmax")
    batches = synthetic.SyntheticIterator(
        image_size=size, num_classes=1000, batch_size=batch,
        num_batches=-(-calib_images // batch), seed=7)
    result = calibrate_lib.calibrate(cap_model, variables, batches,
                                     max_images=calib_images)
    path = calib.save_scales(
        f"resnet50_{act}_imgnet", result.ka_max(), result.kw_max(), 15.5,
        source=f"synthetic-calibrated ({act} variant, {train_steps} train "
               f"steps, {calib_images} images; regenerate on real data via "
               f"--pre_reference)",
        out_dir=out_dir)
    print(f"wrote {path}")
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=120)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--calib_images", type=int, default=512)
    p.add_argument("--acts", nargs="+", default=["stl", "swish"])
    p.add_argument("--out_dir", type=str, default=None,
                   help="default: the shipped calib/constants package dir")
    cfg = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for act in cfg.acts:
        calibrate_variant(act, train_steps=cfg.train_steps, batch=cfg.batch,
                          size=cfg.size, calib_images=cfg.calib_images,
                          out_dir=cfg.out_dir)


if __name__ == "__main__":
    main()
