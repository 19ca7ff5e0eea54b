"""Inference engine surface tests."""

import numpy as np

from cnns_slfp_quantization_tpu.serve import InferenceEngine


def test_engine_predict_and_classify():
    eng = InferenceEngine("mobilenet", qbit=8, batch_size=4)
    x = np.random.default_rng(0).normal(0, 1, (6, 32, 32, 3)).astype(np.float32)
    logits = eng.predict(x)
    assert logits.shape == (6, 100)
    assert np.isfinite(logits).all()
    cls = eng.classify(x)
    assert cls.shape == (6,)
    # padding must not change results: predict in one call vs two
    np.testing.assert_allclose(logits[:4], eng.predict(x[:4]), rtol=1e-5,
                               atol=1e-6)


def test_engine_fp32_passthrough():
    eng = InferenceEngine("mobilenet", qbit=32, batch_size=2,
                          compute_dtype=None)
    x = np.zeros((2, 32, 32, 3), np.float32)
    assert eng.predict(x).shape == (2, 100)


def test_engine_fused_resnet():
    # auto-selects the fused executor for SLFP8 ResNet-50
    eng = InferenceEngine("resnet", qbit=8, batch_size=2, image_size=64)
    assert eng.fused
    x = np.random.default_rng(1).normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    logits = eng.predict(x)
    assert logits.shape == (2, 1000)
    assert np.isfinite(logits).all()
    # module-path engine agrees on predictions
    ref = InferenceEngine("resnet", qbit=8, batch_size=2, image_size=64,
                          fused=False)
    ref.variables = eng.variables
    np.testing.assert_array_equal(eng.classify(x), ref.classify(x))


def test_engine_fused_validation_and_overrides():
    import pytest

    # explicit fused=True with invalid preconditions raises
    with pytest.raises(ValueError):
        InferenceEngine("vgg16", qbit=8, fused=True)
    # explicit Pallas / fp32 requests are not silently overridden by auto
    eng = InferenceEngine("resnet", qbit=8, image_size=64, use_pallas=True)
    assert not eng.fused
    eng = InferenceEngine("resnet", qbit=8, image_size=64, compute_dtype=None)
    assert not eng.fused


def test_engine_packed_fused():
    """Packed (uint8 SLFP codes, 4x less weight HBM) serving on the fused
    executors: the executors' ``_wv`` decodes codes in-graph
    (models/resnet50_fused.py:68-76), so the capacity format runs on the
    fastest path.  Predictions must match the float-frozen fused engine
    (same codebook values — decode(pack(Q(w))) == Q(w) modulo the pseudo-zero
    and bf16 double-rounding, which perturb logits below decision level on
    these inputs)."""
    import numpy as np

    eng_p = InferenceEngine("resnet", qbit=8, batch_size=2, image_size=64,
                            pack_weights=True, fused=True)
    assert eng_p.fused
    # the packed format actually reached the variables: uint8 kernels
    kinds = {a.dtype.name for a in
             __import__("jax").tree.leaves(eng_p.variables["params"])}
    assert "uint8" in kinds
    x = np.random.default_rng(7).normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    logits = eng_p.predict(x)
    assert logits.shape == (2, 1000) and np.isfinite(logits).all()
    eng_f = InferenceEngine("resnet", qbit=8, batch_size=2, image_size=64)
    np.testing.assert_array_equal(eng_p.classify(x), eng_f.classify(x))
    # auto-selection also picks the fused executor for packed mobilenet
    eng_m = InferenceEngine("mobilenet", qbit=8, batch_size=2,
                            pack_weights=True)
    assert eng_m.fused
    xm = np.random.default_rng(8).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    assert np.isfinite(eng_m.predict(xm)).all()


def test_engine_custom_scales(tmp_path):
    """Per-checkpoint calibration constants reach serving: calibrate a fresh
    checkpoint on synthetic data (the --pre_reference workflow,
    reference cifar100_train_eval.py:287-301), serve with the calibrated
    JSON, and check the fused path matches the module path under the SAME
    scales while differing from the shipped-constants engine."""
    import jax

    from cnns_slfp_quantization_tpu import calib, models
    from cnns_slfp_quantization_tpu.calib import calibrate as calibrate_lib
    from cnns_slfp_quantization_tpu.train import checkpoint as ckpt_lib

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1.5, (8, 32, 32, 3)).astype(np.float32)

    model = models.create_model("mobilenet", 32)
    variables = model.init(jax.random.PRNGKey(5), x[:1], train=False)
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt_lib.save(ckpt_dir, jax.device_get(variables))

    cap = models.create_model("mobilenet", 32, capture="absmax")
    result = calibrate_lib.calibrate(cap, variables, [(x,)], max_images=8)
    json_path = calib.save_scales("custom", result.ka_max(), result.kw_max(),
                                  15.5, out_dir=str(tmp_path))

    eng = InferenceEngine("mobilenet", qbit=8, batch_size=4,
                          checkpoint=ckpt_dir, scales=str(json_path))
    assert eng.fused and eng.scales is not None
    ref = InferenceEngine("mobilenet", qbit=8, batch_size=4, fused=False,
                          checkpoint=ckpt_dir, scales=str(json_path))
    # fused (offline BN fold, f32 affine) vs module path (live BN, bf16
    # stream) drift lands on quantization bins; on a random-init model the
    # logits are near-ties, so compare statistically (cf.
    # test_fused_apply_matches_module)
    le, lr = eng.predict(x), ref.predict(x)
    cos = np.sum(le * lr, -1) / (np.linalg.norm(le, axis=-1)
                                 * np.linalg.norm(lr, axis=-1) + 1e-30)
    assert float(np.mean(cos)) > 0.99, cos

    # the custom constants actually take effect (differ from shipped)
    default_eng = InferenceEngine("mobilenet", qbit=8, batch_size=4,
                                  checkpoint=ckpt_dir)
    assert not np.allclose(eng.predict(x), default_eng.predict(x),
                           rtol=1e-3, atol=1e-3)


def test_engine_fused_mobilenet():
    eng = InferenceEngine("mobilenet", qbit=8, batch_size=2)
    assert eng.fused
    x = np.random.default_rng(2).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    logits = eng.predict(x)
    assert logits.shape == (2, 100) and np.isfinite(logits).all()
    eng_i = InferenceEngine("mobilenetv1", qbit=8, batch_size=2, image_size=64)
    assert eng_i.fused
    assert eng_i.predict(np.zeros((2, 64, 64, 3), np.float32)).shape == (2, 1000)


def test_engine_fused_shufflenet():
    """Third fused-executor family (round 5: +5.5% measured A/B,
    tools/bench_shufflenet_fused.py): auto-selected for SLFP8 bf16 serving,
    decisions match the module-path engine."""
    eng = InferenceEngine("shufflenetv2", qbit=8, batch_size=2)
    assert eng.fused
    x = np.random.default_rng(3).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    logits = eng.predict(x)
    assert logits.shape == (2, 100) and np.isfinite(logits).all()
    eng_m = InferenceEngine("shufflenetv2", qbit=8, batch_size=2, fused=False)
    assert not eng_m.fused
    np.testing.assert_array_equal(eng.classify(x), eng_m.classify(x))
