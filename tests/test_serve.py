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
        InferenceEngine("resnet", qbit=8, pack_weights=True, fused=True,
                        image_size=64)
    with pytest.raises(ValueError):
        InferenceEngine("vgg16", qbit=8, fused=True)
    # explicit Pallas / fp32 requests are not silently overridden by auto
    eng = InferenceEngine("resnet", qbit=8, image_size=64, use_pallas=True)
    assert not eng.fused
    eng = InferenceEngine("resnet", qbit=8, image_size=64, compute_dtype=None)
    assert not eng.fused


def test_engine_fused_mobilenet():
    eng = InferenceEngine("mobilenet", qbit=8, batch_size=2)
    assert eng.fused
    x = np.random.default_rng(2).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    logits = eng.predict(x)
    assert logits.shape == (2, 100) and np.isfinite(logits).all()
    eng_i = InferenceEngine("mobilenetv1", qbit=8, batch_size=2, image_size=64)
    assert eng_i.fused
    assert eng_i.predict(np.zeros((2, 64, 64, 3), np.float32)).shape == (2, 1000)
