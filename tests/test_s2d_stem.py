"""Space-to-depth stem rewrite is an exact rearrangement of the 7x7/s2 conv."""

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.models import resnet50_fused


def test_s2d_stem_matches_direct_conv():
    rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    # odd-ish sizes too: 224 (real) and 64 (test-size)
    for h in (64, 224):
        x = jax.random.normal(r1, (2, h, h, 3), jnp.float32).astype(
            jnp.bfloat16)
        w = jax.random.normal(r2, (7, 7, 3, 64), jnp.float32) * 0.1
        want = resnet50_fused._xla_conv(x, w, stride=2, pad=3)
        got = resnet50_fused._space_to_depth_stem(x, w)
        assert got.shape == want.shape, (got.shape, want.shape)
        # identical taps, different accumulation order: bf16 inputs are
        # exact, f32 accumulation differs only in summation order
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_s2d_stem_odd_sizes():
    rng = jax.random.PRNGKey(1)
    r1, r2 = jax.random.split(rng)
    for h, wdt in ((65, 65), (63, 64)):
        x = jax.random.normal(r1, (1, h, wdt, 3), jnp.float32).astype(
            jnp.bfloat16)
        w = jax.random.normal(r2, (7, 7, 3, 64), jnp.float32) * 0.1
        want = resnet50_fused._xla_conv(x, w, stride=2, pad=3)
        got = resnet50_fused._space_to_depth_stem(x, w)
        assert got.shape == want.shape, (h, wdt, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_s2d_stem_3x3_pad1():
    # the MobileNetV1 stem shape (3x3/s2/p1)
    rng = jax.random.PRNGKey(2)
    r1, r2 = jax.random.split(rng)
    for h in (32, 33, 224):
        x = jax.random.normal(r1, (1, h, h, 3), jnp.float32).astype(
            jnp.bfloat16)
        w = jax.random.normal(r2, (3, 3, 3, 32), jnp.float32) * 0.2
        want = resnet50_fused._xla_conv(x, w, stride=2, pad=1)
        got = resnet50_fused._space_to_depth_stem(x, w, pad=1)
        assert got.shape == want.shape, (h, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
