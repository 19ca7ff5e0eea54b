"""Fused ResNet-50 inference path vs the reference module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.models import resnet50_fused
from cnns_slfp_quantization_tpu.ops import freeze


@pytest.fixture(scope="module")
def frozen_resnet():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
    m = models.create_model("resnet", 8)
    v = m.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("resnet", 8, capture="full")
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    mb = models.create_model("resnet", 8, compute_dtype=jnp.bfloat16,
                             frozen_weights=True, use_pallas=False)
    want = np.asarray(jax.jit(
        lambda v, x: mb.apply(v, x, train=False))(vf, x), np.float32)
    return vf, x, want


@pytest.mark.parametrize("policy", [
    {"conv1": "pallas", "conv3": "xla"},
    {"conv1": "xla", "conv3": "xla"},
    {"conv1": "pallas", "conv3": "pallas"},
])
def test_fused_apply_matches_module(frozen_resnet, policy):
    vf, x, want = frozen_resnet
    scales = calib.load_scales("resnet50_imgnet")
    got = np.asarray(jax.jit(
        lambda v, x: resnet50_fused.fused_apply(
            v, x, scales=scales, policy=policy))(vf, x), np.float32)
    assert got.shape == want.shape
    # BN-fold in f32 + f32 residual adds vs the module's bf16 stream: small
    # elementwise drift that can flip quantization bins on deep paths —
    # compare direction + prediction, like the torch-parity tests.
    cos = float(np.sum(got * want) /
                (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    assert cos > 0.995, f"policy={policy}: cos={cos}"
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(want, -1))


@pytest.mark.parametrize("policy", [
    {"conv1": "xla", "conv3": "xla"},
    {"conv1": "pallas", "conv3": "pallas"},
])
def test_fused_apply_packed_uint8(frozen_resnet, policy):
    """Packed serving: uint8 SLFP codes through the whole executor
    (VMEM decode in the Pallas kernels, jnp decode for XLA convs) must
    reproduce the float-frozen executor bit-for-bit — the decode emits the
    exact codebook values the bf16 frozen weights already hold."""
    vf, x, _ = frozen_resnet
    scales = calib.load_scales("resnet50_imgnet")
    m = models.create_model("resnet", 8)
    v = m.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("resnet", 8, capture="full")
    vp = freeze.pack_variables(cap, v, x[:1])
    kernels = [p for p in jax.tree.leaves(vp["params"])
               if getattr(p, "dtype", None) == jnp.uint8]
    assert len(kernels) == 54  # 53 convs + fc, all packed
    want = np.asarray(jax.jit(
        lambda v, x: resnet50_fused.fused_apply(
            v, x, scales=scales, policy=policy))(vf, x), np.float32)
    got = np.asarray(jax.jit(
        lambda v, x: resnet50_fused.fused_apply(
            v, x, scales=scales, policy=policy))(vp, x), np.float32)
    np.testing.assert_array_equal(got, want)


def test_fused_apply_blockin_modes_match(frozen_resnet):
    """The round-4 blockin levers preserve numerics: pallas_dual is
    bit-identical to the production consumer placement; packed differs only
    by the pseudo-zero code decoding to 0.0 instead of 1e-10."""
    vf, x, _ = frozen_resnet
    scales = calib.load_scales("resnet50_imgnet")

    def run(mode):
        fn = jax.jit(lambda v, xx: resnet50_fused.fused_apply(
            v, xx, scales=scales, interpret=True,
            _diag_blockin_fuse=mode))
        return np.asarray(fn(vf, x), np.float32)

    base = run("consumer")
    np.testing.assert_array_equal(run("pallas_dual"), base)
    packed = run("packed")
    assert float(np.max(np.abs(packed - base))) < 1e-2
    np.testing.assert_array_equal(np.argmax(packed, -1), np.argmax(base, -1))


def test_fused_apply_chain_matches(frozen_resnet):
    """The VMEM-resident bottleneck chain kernel (kernels/chain.py,
    policy={"chain": {2, 3}}) reproduces the production executor: same
    bit-domain SLFP quantizes, f32 affines and residual — drift is limited
    to <=1 ulp scale-path differences (y*recip in-kernel vs the fused
    integer-domain scale+quantize), which can flip isolated quantize bins."""
    vf, x, want = frozen_resnet
    scales = calib.load_scales("resnet50_imgnet")
    got = np.asarray(jax.jit(
        lambda v, x: resnet50_fused.fused_apply(
            v, x, scales=scales, policy={"chain": frozenset({2, 3})},
            interpret=jax.default_backend() == "cpu"))(vf, x), np.float32)
    assert got.shape == want.shape
    cos = float(np.sum(got * want) /
                (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    assert cos > 0.995, f"chain: cos={cos}"
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(want, -1))
