"""Sharding correctness on the virtual 8-device CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.parallel import make_mesh, mesh as mesh_lib, steps
from cnns_slfp_quantization_tpu.train import loop, optimizers


@pytest.fixture(scope="module")
def setup():
    # fp32 model for numerical DP/TP-vs-single-device equivalence: at qbit=8
    # the quantization cliffs amplify TP partial-sum rounding differences
    # into bin flips, so exact equivalence only holds un-quantized.
    model = models.create_model("mobilenet", 32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 32, 32, 3))
    y = jnp.asarray(np.random.default_rng(0).integers(0, 100, 16), jnp.int32)
    variables = model.init(rng, x, train=False)
    tx = optimizers.dsgd(1e-3, 8)
    return model, variables, tx, x, y, rng


def _run_step(model, variables, tx, x, y, rng, mesh):
    state = loop.TrainState.create(variables, tx)
    train_step = loop.make_train_step(model, tx)
    if mesh is None:
        state, metrics = jax.jit(train_step)(state, x, y, rng)
    else:
        with mesh:
            state = steps.shard_state(state, mesh)
            xs, ys = steps.place_batch(mesh, x, y)
            state, metrics = steps.jit_train_step(train_step, donate=False)(
                state, xs, ys, rng)
    return jax.device_get(state.params), jax.device_get(metrics)


def test_dp_tp_step_matches_single_device(setup):
    model, variables, tx, x, y, rng = setup
    p_ref, m_ref = _run_step(model, variables, tx, x, y, rng, None)
    mesh = make_mesh(model=2)  # 4x2 over the 8 fake devices
    p_sh, m_sh = _run_step(model, variables, tx, x, y, rng, mesh)
    np.testing.assert_allclose(m_sh["loss"], m_ref["loss"], rtol=1e-5)
    flat_ref = jax.tree.leaves(p_ref)
    flat_sh = jax.tree.leaves(p_sh)
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_track_stats_step_shardable(setup):
    """DSGD with track_stats=True (C6 debug counters) must survive
    shard_state: QSGDState.stats rides along in the sharded opt state and
    the counters still update on the mesh."""
    model, variables, _, x, y, rng = setup
    tx = optimizers.dsgd(1e-3, 8, track_stats=True)
    state = loop.TrainState.create(variables, tx)
    train_step = loop.make_train_step(model, tx)
    mesh = make_mesh(model=2)
    with mesh:
        state = steps.shard_state(state, mesh)
        xs, ys = steps.place_batch(mesh, x, y)
        state, _ = steps.jit_train_step(train_step, donate=False)(
            state, xs, ys, rng)
    stats = jax.device_get(state.opt_state.stats)
    total = sum(int(np.sum(v)) for v in jax.tree.leaves(stats))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    assert total > 0, "track_stats counters never updated under sharding"
    assert total <= 3 * n_params


def test_param_sharding_specs(setup):
    model, variables, tx, *_ = setup
    mesh = make_mesh(model=2)
    shardings = mesh_lib.param_shardings(variables["params"], mesh)
    # a conv kernel with 64 out-features should be model-sharded on O
    spec = shardings["conv2"]["kernel"].spec
    assert spec[-1] == "model"
    # BN params follow the channel dim
    assert shardings["bn2"]["scale"].spec[0] == "model"


def test_data_parallel_eval_matches(setup):
    model, variables, *_ = setup
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 100, 16), jnp.int32)
    eval_step = loop.make_eval_step(model)
    ref = jax.device_get(jax.jit(eval_step)(variables, x, y))
    mesh = make_mesh(model=1)
    with mesh:
        xs, ys = steps.place_batch(mesh, x, y)
        got = jax.device_get(steps.jit_eval_step(eval_step)(variables, xs, ys))
    assert got["correct1"] == ref["correct1"]
    assert got["correct5"] == ref["correct5"]


def test_spatial_conv_halo_exchange():
    # H-sharded conv with halo exchange == unsharded SAME conv.
    from cnns_slfp_quantization_tpu.parallel import spatial

    mesh = make_mesh(model=1)  # 8-way 'data' axis
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 12)) * 0.1
    got = spatial.spatial_conv2d(x, w, mesh)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_spatial_conv_5x5():
    from cnns_slfp_quantization_tpu.parallel import spatial

    mesh = make_mesh(model=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 40, 12, 4))
    w = jax.random.normal(jax.random.PRNGKey(3), (5, 5, 4, 4)) * 0.1
    got = spatial.spatial_conv2d(x, w, mesh)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_executor_sharded_inference():
    """The fused ResNet executor under dp+tp sharding matches single-device.

    The serving fast path must compile and produce identical results when
    the batch is sharded over 'data' and the frozen weights over 'model'
    (GSPMD propagates the shardings through the functional executor).
    """
    from cnns_slfp_quantization_tpu import calib
    from cnns_slfp_quantization_tpu.models import resnet50_fused
    from cnns_slfp_quantization_tpu.ops import freeze

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 64, 64, 3), jnp.float32)
    m = models.create_model("resnet", 8)
    v = m.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("resnet", 8, capture="full")
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    scales = calib.load_scales("resnet50_imgnet")

    fn = jax.jit(lambda v, x: resnet50_fused.fused_apply(v, x, scales=scales))
    want = np.asarray(fn(vf, x), np.float32)

    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    with mesh:
        vs = mesh_lib.shard_tree(vf, mesh_lib.param_shardings(vf, mesh))
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh))
        got = np.asarray(fn(vs, xs), np.float32)
    # data-parallel rows are bit-identical; TP partial sums can flip SLFP
    # bins on the model axis — require exact shape + tight agreement
    assert got.shape == want.shape
    cos = float(np.sum(got * want) /
                (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    assert cos > 0.999, cos


def test_cli_driver_mesh_training_matches_single_device(tmp_path):
    """--mesh_data/--mesh_model are wired into the drivers: the SAME CLI
    run sharded over a 4x2 ('data','model') mesh reproduces the
    single-device loss trajectory (identical synthetic stream, rng) and the
    final parameters, through cli.common.run_main_loop itself.

    fp32 + SGD: equivalence-up-to-reduction-order is only defined on the
    smooth path — at qbit=8 TP partial-sum rounding lands on quantization
    bin cliffs (see the `setup` fixture note), and DSGD's 1e-4 stuck-weight
    threshold is itself a cliff when lr*grad ~ 1e-4.  The sharded
    *quantized DSGD* step is covered by test_dp_tp_step_matches_single_device
    and the driver-path dryrun (__graft_entry__)."""
    from cnns_slfp_quantization_tpu.cli import cifar100_train_eval

    def run(mesh_args, sub):
        state, accs = cifar100_train_eval.main([
            "--synthetic", "--retrain", "--net", "mobilenet",
            "--optimizer", "SGD", "--Qbits", "32",
            "--train_batch_size", "8", "--eval_batch_size", "8",
            "--synthetic_batches", "3", "--max_epochs", "1",
            "--root_dir", str(tmp_path / sub), "--jax_cache", "",
        ] + mesh_args)
        return jax.device_get(state.params), accs

    p_ref, acc_ref = run([], "single")
    p_sh, acc_sh = run(["--mesh_data", "4", "--mesh_model", "2"], "mesh")
    assert acc_sh == acc_ref
    # sharded-vs-single parameter agreement up to reduction-order noise.
    # Measured on this exact config: ~6e-5 worst-leaf divergence after one
    # step, amplifying to ~2.7e-3 after 3 steps for DP-ONLY sharding (pure
    # psum reordering, no TP) and ~3.7e-3 for dp+tp — batch-8 BatchNorm at a
    # random init chaotically amplifies any reduction reordering, so
    # trajectory identity is only defined up to that envelope.  Bit-level
    # equivalence of one sharded step is test_dp_tp_step_matches_single_device.
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-3)


def test_scaling_bench_train_and_infer_rows():
    """scaling_bench covers QAT training (fwd+bwd+DSGD, gradient psum over
    'data') as well as inference; rows carry finite throughput."""
    from cnns_slfp_quantization_tpu.parallel import scaling_bench

    rows = scaling_bench.run("mobilenet", [1, 2], per_device_batch=4,
                             image_size=32, qbit=8, mode="both")
    kinds = {(r["mode"], r["devices"]) for r in rows}
    assert kinds == {("infer", 1), ("infer", 2), ("train", 1), ("train", 2)}
    for r in rows:
        assert np.isfinite(r["images_per_sec"]) and r["images_per_sec"] > 0


def test_cli_driver_mesh_batch_divisibility_error(tmp_path):
    from cnns_slfp_quantization_tpu.cli import cifar100_train_eval

    with pytest.raises(ValueError, match="not divisible"):
        cifar100_train_eval.main([
            "--synthetic", "--retrain", "--net", "mobilenet",
            "--train_batch_size", "6", "--eval_batch_size", "6",
            "--synthetic_batches", "1", "--max_epochs", "1",
            "--mesh_data", "8", "--root_dir", str(tmp_path),
            "--jax_cache", "",
        ])


def test_multihost_global_batch_and_iterator_sharding():
    """Single-process exercise of the multi-host mechanisms: global array
    assembly from process-local data, and per-host iterator slicing."""
    from cnns_slfp_quantization_tpu.parallel import multihost

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    imgs = np.arange(16 * 4 * 4 * 3, dtype=np.float32).reshape(16, 4, 4, 3)
    labels = np.arange(16, dtype=np.int32)
    gi, gl = multihost.global_batch(mesh, imgs, labels)
    assert gi.shape == (16, 4, 4, 3) and gl.shape == (16,)
    assert len(gi.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(gi), imgs)
    np.testing.assert_array_equal(np.asarray(gl), labels)

    batches = [(i, i) for i in range(10)]
    mine = list(multihost.shard_data_iterator(iter(batches),
                                              process_index=1,
                                              process_count=4))
    assert mine == [(1, 1), (5, 5), (9, 9)]
    # all processes together cover every batch exactly once
    seen = sorted(sum((
        [b[0] for b in multihost.shard_data_iterator(
            iter(batches), process_index=p, process_count=4)]
        for p in range(4)), []))
    assert seen == list(range(10))
