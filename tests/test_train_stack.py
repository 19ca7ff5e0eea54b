"""Checkpointing, calibration persistence, activations, schedules, data."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.calib import calibrate as cal
from cnns_slfp_quantization_tpu.data import synthetic, transforms
from cnns_slfp_quantization_tpu.ops import activations as act_lib
from cnns_slfp_quantization_tpu.train import checkpoint, loop, optimizers


def test_orbax_checkpoint_roundtrip(tmp_path):
    m = models.create_model("mobilenet", 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, jax.device_get(v))
    restored = checkpoint.restore(path)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibration_save_load_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(calib, "_CONSTANTS_DIR", tmp_path)
    calib.save_scales("testnet", [1.0, 2.0, 31.0], [0.5, 0.25, 1.0], 15.5)
    ss = calib.load_scales("testnet")
    np.testing.assert_allclose(ss.ka, np.asarray([1.0, 2.0, 31.0]) / 15.5)
    np.testing.assert_allclose(ss.kw, np.asarray([0.5, 0.25, 1.0]) / 15.5)


def test_calibrated_scales_recover_fp32_maxima():
    ones = calib.ScaleSet.ones(28)
    m = models.create_model("mobilenet", 32, scales=ones, capture="absmax")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    res = cal.calibrate(m, v, [x], max_images=4)
    assert set(res.input_absmax) == set(range(28))
    assert res.input_absmax[0] == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)
    assert len(res.weight_absmax) == 28


def test_stl_activation_matches_reference():
    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ref = importlib.import_module("utils.activation_func")
    x = np.linspace(-5, 5, 1001).astype(np.float32)
    tx = torch.tensor(x, requires_grad=True)
    ty = ref.STL()(tx)
    ty.backward(torch.ones_like(ty) * 3.0)  # cotangent magnitude > 1
    want_y = ty.detach().numpy()
    want_g = tx.grad.numpy()

    jx = jnp.asarray(x)
    got_y, vjp = jax.vjp(act_lib.stl, jx)
    (got_g,) = vjp(jnp.full_like(jx, 3.0))
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_g), want_g, rtol=1e-6, atol=1e-7)


def test_multistep_lr():
    sched = loop.multistep_lr(0.1, (2, 4), 0.1, steps_per_epoch=10)
    assert sched(0) == pytest.approx(0.1)
    assert sched(25) == pytest.approx(0.01)
    assert sched(45) == pytest.approx(0.001)


def test_training_reduces_loss_on_synthetic():
    # end-to-end learnability: class-conditional synthetic data, SLFP8 QAT.
    # Unit scales (random-init weights don't match the pretrained-model
    # calibration constants) and plain SGD for a stable descent check.
    m = models.create_model("mobilenet", 8, scales=calib.ScaleSet.ones(28))
    it = synthetic.SyntheticIterator(num_classes=10, batch_size=32,
                                     num_batches=20, seed=0)
    x0, y0 = next(iter(it))
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x0), train=False)
    tx = optimizers.sgd(0.02, momentum=0.9, weight_decay=0.0)
    state = loop.TrainState.create(v, tx)
    step = jax.jit(loop.make_train_step(m, tx))
    losses = []
    for i, (xb, yb) in enumerate(it):
        state, metrics = step(state, jnp.asarray(xb), jnp.asarray(yb),
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_imgnet_eval_transform_shapes():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8))
    out = transforms.imgnet_eval_pil(img)
    assert out.shape == (224, 224, 3)
    rng = np.random.default_rng(1)
    out2 = transforms.imgnet_train_pil(img, rng)
    assert out2.shape == (224, 224, 3)


def test_imagefolder_pipeline(tmp_path):
    # Generate a tiny ImageFolder tree and run the threaded loader.
    from PIL import Image

    from cnns_slfp_quantization_tpu.data import imagenet

    rng = np.random.default_rng(0)
    for cls in ["n01440764", "n01443537"]:
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (64 + i * 10, 80, 3), np.uint8)
            ).save(d / f"img_{i}.JPEG")
    it = imagenet.ImageNetIterator(str(tmp_path / "val"), batch_size=4,
                                   train=False, workers=2)
    batches = list(it)
    assert sum(b[0].shape[0] for b in batches) == 6
    x, y = batches[0]
    assert x.shape[1:] == (224, 224, 3) and x.dtype == np.float32
    assert set(np.unique(np.concatenate([b[1] for b in batches]))) == {0, 1}
    # train-mode augmentation path
    it_tr = imagenet.ImageNetIterator(str(tmp_path / "val"), batch_size=6,
                                      train=True, workers=2, seed=1)
    xt, _ = next(iter(it_tr))
    assert xt.shape == (6, 224, 224, 3) and np.isfinite(xt).all()


def test_scan_train_throughput_runs():
    import jax
    import jax.numpy as jnp

    from cnns_slfp_quantization_tpu import models
    from cnns_slfp_quantization_tpu.train import loop, optimizers
    from cnns_slfp_quantization_tpu.utils.profiling import scan_train_throughput

    model = models.create_model("mobilenet", 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3), jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    tx = optimizers.dsgd(1e-3, qbit=8)
    state = loop.TrainState.create(variables, tx)
    ips = scan_train_throughput(loop.make_train_step(model, tx), state, x, y,
                                steps=2)
    assert ips > 0


def test_bf16_qat_train_step():
    """QAT training must work with the bf16 MXU stream (regression: the
    conv transpose rule rejects (f32 cotangent, bf16 operand) when the
    forward used preferred_element_type=f32 — fixed by _conv_f32acc)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnns_slfp_quantization_tpu import models
    from cnns_slfp_quantization_tpu.train import loop, optimizers

    for net, size in (("mobilenet", 32), ("vgg16", 32)):
        model = models.create_model(net, 8, compute_dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, size, size, 3),
                              jnp.float32)
        y = jnp.zeros((2,), jnp.int32)
        v = model.init(jax.random.PRNGKey(1), x, train=False)
        tx = optimizers.dsgd(1e-3, qbit=8)
        state = loop.TrainState.create(v, tx)
        step = loop.make_train_step(model, tx, has_dropout=net == "vgg16")
        s2, m = jax.jit(step)(state, x, y, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        # parameters actually moved
        moved = jax.tree.reduce(
            lambda acc, pair: acc, jax.tree.map(
                lambda a, b: float(jnp.abs(a - b).max()), state.params,
                s2.params))
        leaves = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params,
            s2.params))
        assert max(leaves) > 0


def test_conv_f32acc_grads_match_f32_reference():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnns_slfp_quantization_tpu.ops.layers import _conv_f32acc

    a = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8), jnp.float32)

    def f32(a, b):
        return jnp.sum(jax.lax.conv_general_dilated(
            a, b, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)

    def ours(a, b):
        return jnp.sum(_conv_f32acc(a.astype(jnp.bfloat16),
                                    b.astype(jnp.bfloat16),
                                    (1, 1), ((1, 1), (1, 1)), 1) ** 2)

    ga, gb = jax.grad(f32, (0, 1))(a, b)
    ga2, gb2 = jax.grad(ours, (0, 1))(a, b)
    # the bf16-rounded forward feeds the chain rule, so individual
    # components wobble where terms cancel; direction and scale must match
    for g1, g2 in ((ga, ga2), (gb, gb2)):
        g1, g2 = np.asarray(g1).ravel(), np.asarray(g2).ravel()
        cos = float(g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2)))
        assert cos > 0.999, cos
        np.testing.assert_allclose(g2, g1, rtol=0.2,
                                   atol=0.02 * np.abs(g1).max())
