"""Golden/codebook tests for the SFP/SLFP quantizer core.

Strategy (SURVEY.md §4): the 256-value codebooks are enumerable, so instead
of comparing against torch (whose log2/pow can differ in the last ulp) we
assert (a) every quantizer output is a codebook member, (b) idempotence
Q(Q(x)) == Q(x), (c) agreement with a float64 mathematical oracle of the
reference formulas, (d) the reference's own boundary spot-check vector
(sfp_quant.py:179), (e) identity STE gradients, (f) uint8 pack/unpack
round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu.ops import sfp


def _oracle(x, mode):
    """Float64 re-derivation of reference sfp_quant.py forward semantics."""
    x = np.asarray(x, np.float64)
    sign = np.sign(x)
    ax = np.abs(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        e = np.floor(np.log2(ax))
        m = ax / np.exp2(e)
        if mode == "sfp33":
            out = np.round(m * 8) / 8 * np.exp2(e)
        elif mode == "slfp34_w":
            out = np.exp2(e + np.round(np.log2(m) * 16) / 16)
        elif mode == "slfp34_a":
            mq = np.round(m * 16) / 16
            out = np.exp2(e + np.round(np.log2(mq) * 16) / 16)
        elif mode == "sfp44":
            out = np.round(m * 16) / 16 * np.exp2(e)
    if mode in ("sfp33", "slfp34_w", "slfp34_a"):
        out[ax < 0.0625] = 1e-10
        out[(ax >= 0.0625) & (ax < 0.125)] = 0.125
        if mode == "sfp33":
            out[ax >= 15] = 15
        else:
            out[ax > np.float64(np.float32(15.32165))] = np.float32(15.32165)
    else:  # sfp44 bug-compat: subnormal branch dead (sfp_quant.py:122-123)
        out[ax >= 248] = 248
        out[ax == 0] = 0  # reference NaNs here; we define Q(0)=0
    return sign * out


def _rand(n=200_000, lo=1e-4, hi=300.0, seed=0):
    rng = np.random.default_rng(seed)
    mag = np.exp(rng.uniform(np.log(lo), np.log(hi), n)).astype(np.float32)
    return mag * rng.choice([-1.0, 1.0], n).astype(np.float32)


QUANTIZERS = {
    "sfp33": lambda x: sfp.quantize_weight(x, 7),
    "slfp34_w": lambda x: sfp.quantize_weight(x, 8),
    "slfp34_a": lambda x: sfp.quantize_act(x, 8),
    "sfp44": lambda x: sfp.quantize_layerout(x, 8),
}


@pytest.mark.parametrize("mode", list(QUANTIZERS))
def test_matches_float64_oracle(mode):
    x = _rand()
    got = np.asarray(QUANTIZERS[mode](jnp.asarray(x)), np.float64)
    want = _oracle(x, mode)
    # Allow disagreement only where float32 vs float64 rounding picks an
    # adjacent bin (one log-mantissa step = 4.4% spacing).
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-12)
    exact = np.mean(rel < 1e-6)
    assert exact > 0.999, f"{mode}: only {exact:.4%} exact vs oracle"
    assert np.all(rel < 0.05), f"{mode}: max rel err {rel.max():.3g}"


@pytest.mark.parametrize(
    "mode,fmt",
    [("sfp33", "sfp33"), ("slfp34_w", "slfp34"), ("slfp34_a", "slfp34")],
)
def test_outputs_in_codebook(mode, fmt):
    x = _rand(50_000)
    got = np.abs(np.asarray(QUANTIZERS[mode](jnp.asarray(x)), np.float32))
    book = sfp.codebook(fmt)
    idx = np.searchsorted(book, got)
    idx = np.clip(idx, 0, len(book) - 1)
    near = np.minimum(
        np.abs(book[idx] - got), np.abs(book[np.maximum(idx - 1, 0)] - got)
    )
    assert np.all(near == 0.0), f"{mode}: {np.sum(near != 0)} values off-codebook"


@pytest.mark.parametrize("mode", list(QUANTIZERS))
def test_idempotent(mode):
    # Idempotence holds everywhere except the SLFP<3,4> clamp: the reference
    # clamps to the literal 15.32165 which itself re-quantizes UP to the top
    # code 15.3216522 (non-idempotent in the reference too), so exclude it.
    q = QUANTIZERS[mode]
    # (the rounds-up-past-clamp zone starts at 14.75 for the act path:
    # linear round m=1.84375 -> 1.875, then log round -> top code)
    x = np.clip(_rand(20_000), -14.0, 14.0)
    once = q(jnp.asarray(x))
    twice = q(once)
    np.testing.assert_array_equal(np.asarray(once), np.asarray(twice))


def test_reference_boundary_vector():
    # sfp_quant.py:179 spot-check vector through quantize_act(8).
    x = jnp.asarray([0.01, 0.06251, 0.125, 0.1, 0.2, 1.0, 15.0], jnp.float32)
    got = np.asarray(sfp.quantize_act(x, 8))
    # x=15: m=1.875 -> linear j=14 -> log2(1.875)*16 = 14.51 rounds UP to 15,
    # so Q_act(15) = 2**(3+15/16) = 15.3216522 (above the clamp literal —
    # only *inputs* > 15.32165 are clamped; the reference does the same).
    want = np.array(
        [1e-10, 0.125, 0.125, 0.125, 2.0 ** (11 / 16 - 3), 1.0, 2.0 ** (15 / 16 + 3)],
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_zero_and_negative():
    x = jnp.asarray([0.0, -0.2, -16.0, -0.01], jnp.float32)
    got = np.asarray(sfp.quantize_act(x, 8))
    assert got[0] == 0.0
    np.testing.assert_allclose(got[1], -(2.0 ** (11 / 16 - 3)), rtol=1e-6)
    np.testing.assert_allclose(got[2], -15.32165, rtol=1e-6)
    np.testing.assert_allclose(got[3], -1e-10, rtol=1e-6)


def test_fp32_passthrough():
    x = jnp.asarray(_rand(100))
    for fn in (sfp.quantize_weight, sfp.quantize_act):
        np.testing.assert_array_equal(np.asarray(fn(x, 32)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(sfp.quantize_layerout(x, 32)), np.asarray(x)
    )


def test_layerout_bug_vs_fixed():
    tiny = jnp.asarray([2.0**-9, 2.0**-7.5, 2.0**-6], jnp.float32)
    bug = np.asarray(sfp.quantize_layerout(tiny, 8, bug_compat=True))
    fixed = np.asarray(sfp.quantize_layerout(tiny, 8, bug_compat=False))
    # Bug mode: normal quantization all the way down (no flush).
    np.testing.assert_allclose(bug, np.asarray(tiny), rtol=0.05)
    assert fixed[0] == np.float32(1e-10)  # < 2**-8 -> pseudo-zero
    assert fixed[1] == np.float32(2.0**-7)  # [2**-8, 2**-7) -> floor
    np.testing.assert_allclose(fixed[2], 2.0**-6, rtol=1e-6)


@pytest.mark.parametrize("mode", list(QUANTIZERS))
def test_ste_gradient_identity(mode):
    q = QUANTIZERS[mode]
    x = jnp.asarray(_rand(512))
    ct = jnp.asarray(np.random.default_rng(1).normal(size=512), jnp.float32)
    _, vjp = jax.vjp(q, x)
    (gx,) = vjp(ct)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(ct))


def test_grad_through_scaling():
    # d/dx [ Q(x/Ka)*Ka ] = 1 under STE: the /Ka and *Ka are real ops
    # (SURVEY.md §3.2) and their product cancels.
    ka = 2.5

    def f(x):
        return jnp.sum(sfp.quantize_act(x / ka, 8) * ka)

    x = jnp.asarray(_rand(128))
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(128), rtol=1e-6)


def test_pack_unpack_slfp34_roundtrip():
    x = jnp.asarray(_rand(50_000))
    q = sfp.quantize_weight(x, 8)
    codes = sfp.pack_slfp34(q)
    assert codes.dtype == jnp.uint8
    back = sfp.unpack_slfp34(codes)
    qn = np.asarray(q, np.float32)
    bn = np.asarray(back, np.float32)
    # Pseudo-zero decodes to true 0; clamp literal decodes to the top code
    # (1.4e-7 relative difference); everything else is bit-exact.
    zero = np.abs(qn) == np.float32(1e-10)
    assert np.all(bn[zero] == 0.0)
    np.testing.assert_allclose(bn[~zero], qn[~zero], rtol=2e-7)


def test_pack_unpack_sfp33_roundtrip():
    x = jnp.asarray(_rand(50_000))
    q = sfp.quantize_weight(x, 7)
    back = sfp.unpack_sfp33(sfp.pack_sfp33(q))
    qn = np.asarray(q, np.float32)
    bn = np.asarray(back, np.float32)
    zero = np.abs(qn) == np.float32(1e-10)
    assert np.all(bn[zero] == 0.0)
    np.testing.assert_array_equal(bn[~zero], qn[~zero])


def test_unpack_covers_all_codes():
    codes = jnp.arange(256, dtype=jnp.uint8)
    vals = np.asarray(sfp.unpack_slfp34(codes), np.float32)
    book = sfp.codebook("slfp34")
    nonzero = np.abs(vals[np.abs(vals) > 0])
    assert np.all(np.isin(nonzero, book)), "decoded value off-codebook"


def test_bfloat16_dtype_preserved():
    x = jnp.asarray(_rand(1024)).astype(jnp.bfloat16)
    q = sfp.quantize_act(x, 8)
    assert q.dtype == jnp.bfloat16


# ---------------------------------------------------------------------------
# Fused integer-domain scale+quantize+bf16 fast path (sfp.py).
# ---------------------------------------------------------------------------


def _all_finite_bf16():
    import ml_dtypes

    u = np.arange(65536, dtype=np.uint16)
    xb = u.view(ml_dtypes.bfloat16)
    return jnp.asarray(xb[np.isfinite(xb.astype(np.float32))])


@pytest.mark.parametrize("qbit", [8, 7])
@pytest.mark.parametrize("recip", [1.0, 0.125, 8.0])
def test_fused_act_bf16_bit_exact_exhaustive(qbit, recip):
    """For pow2 scales the fused path is bit-identical to the float path
    over EVERY finite bfloat16 input (pow2 makes both scale conventions
    exact, isolating the quantizer itself)."""
    x = _all_finite_bf16()
    old = sfp.quantize_act(
        x.astype(jnp.float32) * np.float32(recip), qbit).astype(jnp.bfloat16)
    new = sfp.fused_scale_quant_act_bf16(x, recip, qbit, False)
    np.testing.assert_array_equal(
        np.asarray(old).view(np.uint16), np.asarray(new).view(np.uint16))


@pytest.mark.parametrize("qbit", [8, 7])
def test_fused_act_bf16_nonneg_matches(qbit):
    x = _all_finite_bf16()
    keep = (np.asarray(x.astype(jnp.float32)) >= 0) & (
        (np.asarray(x).view(np.uint16) & 0x8000) == 0)  # drop -0.0 (ReLU clears it)
    xp = x[keep]
    a = sfp.fused_scale_quant_act_bf16(xp, 1.0, qbit, True)
    b = sfp.fused_scale_quant_act_bf16(xp, 1.0, qbit, False)
    np.testing.assert_array_equal(
        np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16))


def test_fused_act_bf16_general_scale_close():
    """Non-pow2 scales: reciprocal multiply vs reference divide can differ by
    <=1 ulp on the scaled input, flipping at most a bin at bin boundaries."""
    x = jnp.asarray(_rand(200_000))
    ka = 3.7
    old = sfp.quantize_act(x / np.float32(ka), 8).astype(jnp.bfloat16)
    new = sfp.fused_scale_quant_act_bf16(x, 1.0 / ka, 8, False)
    o = np.asarray(old, np.float32)
    n = np.asarray(new, np.float32)
    exact = o == n
    assert exact.mean() > 0.9999
    # mismatches are adjacent codes (ratio one log-bin = 2**(1/16))
    r = n[~exact] / o[~exact]
    assert np.all((r > 0.95) & (r < 1.05))


def test_fused_act_bf16_ste_gradient_includes_scale():
    recip = 0.25
    g = jax.grad(lambda v: jnp.sum(
        sfp.fused_scale_quant_act_bf16(v, recip, 8, False).astype(jnp.float32)
    ))(jnp.full((8,), 3.0, jnp.float32))
    np.testing.assert_allclose(np.asarray(g), recip)
