"""Distributed layer tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.models import create_model
from deepgrp_tpu.parallel import (ShardedPredictionEngine, make_dp_train_step,
                                  make_mesh)
from deepgrp_tpu.parallel.train import dp_train_arrays
from deepgrp_tpu.predict import PredictionEngine
from deepgrp_tpu.train import BatchSampler, get_optimizer
from deepgrp_tpu.train.training import _train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device platform")


def make_onehot(length, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=length)
    onehot = np.zeros((5, length), dtype=np.int8)
    onehot[codes, np.arange(length)] = 1
    return onehot


@pytest.fixture(scope="module")
def setup():
    options = Options(vecsize=30, units=8, attention=True, batch_size=16,
                      repeats_to_search=[1, 2])
    model = create_model(options)
    params = model.init(jax.random.PRNGKey(0))
    return options, model, params


@pytest.mark.parametrize("seq_len", [5000, 1603, 12345])
def test_sharded_predict_matches_single_device(setup, seq_len):
    options, model, params = setup
    onehot = make_onehot(seq_len, seed=seq_len)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=16,
                                      step_size=10)
    single = PredictionEngine(model, batch_size=16, step_size=10)
    a = sharded.predict(params, onehot)
    b = single.predict(params, onehot)
    np.testing.assert_array_equal(a, b)


def test_sharded_predict_no_overlap_stride(setup):
    # step >= vecsize: no halo exchange at all
    options, model, params = setup
    onehot = make_onehot(9000)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=8,
                                      step_size=30)
    single = PredictionEngine(model, batch_size=8, step_size=30)
    np.testing.assert_array_equal(sharded.predict(params, onehot),
                                  single.predict(params, onehot))


def test_sharded_predict_tiny_fallback(setup):
    options, model, params = setup
    onehot = make_onehot(200)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=4,
                                      step_size=2)
    single = PredictionEngine(model, batch_size=4, step_size=2)
    np.testing.assert_array_equal(sharded.predict(params, onehot),
                                  single.predict(params, onehot))


def test_dp_train_step_runs_and_improves(setup):
    options, model, params = setup
    onehot = make_onehot(6000)
    truelbl = np.zeros((3, 6000), dtype=np.int8)
    truelbl[1, 500:1500] = 1
    truelbl[2, 3000:3600] = 1
    truelbl[0] = truelbl[1:].sum(axis=0) == 0
    data = Data(fwd=onehot, truelbl=truelbl)
    sampler = BatchSampler(options, data)
    optimizer = get_optimizer(Options(**{**options.todict(),
                                         "learning_rate": 0.01}))
    mesh = make_mesh()
    step = make_dp_train_step(model, optimizer, mesh, options, sampler)
    opt_state = optimizer.init(params)
    arrays = dp_train_arrays(sampler)
    # The train step donates params/opt_state; give it copies so the
    # module-scoped fixture's buffers survive for later tests.
    p = jax.tree.map(lambda a: a.copy(), params)
    s = opt_state
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(20):
        p, s, loss = step(p, s, jax.random.fold_in(key, i), *arrays)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


@pytest.mark.parametrize("n_sampled,ocs", [
    (2, 5), (2, 8), (2, 11),
    # saturated: 5 classes x 6 slots = 30 of the 32 global slots — a
    # per-class ceil grid would not fit local_batch=4, the flat slot
    # striping must (valid single-device config => valid DP config)
    (5, 6),
])
def test_dp_sampler_exact_class_quota(n_sampled, ocs):
    """Summed over the mesh, every repeat class contributes EXACTLY
    one_class_size starts per batch — including quotas that do not
    divide by the device count (the old ``ocs // n_dev`` per-device
    quota dropped up to n_dev-1 repeat samples per class; VERDICT r4
    item 8)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from deepgrp_tpu.parallel.mesh import DATA_AXIS
    from deepgrp_tpu.train import sampler as sampler_lib

    mesh = make_mesh()
    n_dev = mesh.shape[DATA_AXIS]
    if n_dev == 1:
        pytest.skip("single device")
    local_batch = 4
    seq_len, vecsize = 100, 10  # uniform starts land in [0, 90)
    # Sentinel candidates: any class-c start equals 1000 + c, so class
    # membership of each sampled start is unambiguous.
    candidates = jnp.stack(
        [jnp.full((7,), 1000 + c, jnp.int32) for c in range(n_sampled)])
    lengths = jnp.full((n_sampled,), 7, jnp.int32)

    def body(key):
        dev = jax.lax.axis_index(DATA_AXIS)
        k = jax.random.fold_in(key, dev)
        return sampler_lib._sample_starts_dp(
            k, candidates, lengths, n_sampled, ocs, n_dev, dev,
            local_batch, seq_len, vecsize)

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(),
                               out_specs=P(DATA_AXIS), check_vma=False))
    for trial in range(5):
        starts = np.asarray(fn(jax.random.PRNGKey(trial)))
        assert starts.shape == (n_dev * local_batch,)
        for c in range(n_sampled):
            assert int((starts == 1000 + c).sum()) == ocs, (trial, c)
        # remainder slots are uniform window starts
        assert int((starts < seq_len).sum()) == (
            n_dev * local_batch - n_sampled * ocs)


def test_dp_batch_divisibility_check(setup):
    options, model, params = setup
    bad = Options(**{**options.todict(), "batch_size": 13})
    data = Data(fwd=make_onehot(3000),
                truelbl=np.ones((3, 3000), dtype=np.int8))
    mesh = make_mesh()
    if mesh.shape["data"] == 1:
        pytest.skip("single device")
    sampler = BatchSampler(bad, data)
    with pytest.raises(ValueError, match="not divisible"):
        make_dp_train_step(model, get_optimizer(bad), mesh, bad, sampler)


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, (params, x) = __graft_entry__.entry()
    out = jax.jit(fn)(params, x)
    assert out.shape == (x.shape[0], x.shape[1], 5)
    assert bool(jax.numpy.isfinite(out).all())


def test_graft_entry_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(len(jax.devices()))


@pytest.mark.parametrize("seq_len", [5000, 1603, 12345])
def test_sharded_predict_scored_matches_single_device(setup, seq_len):
    # The genome-scale scored path (in-scan argmax, boundary re-scoring)
    # must be bit-identical to the single-device engine.
    options, model, params = setup
    onehot = make_onehot(seq_len, seed=seq_len + 1)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=16,
                                      step_size=10)
    single = PredictionEngine(model, batch_size=16, step_size=10)
    c_sh, m_sh = sharded.predict_scored(params, onehot)
    c_si, m_si = single.predict_scored(params, onehot)
    np.testing.assert_array_equal(c_sh, c_si)
    np.testing.assert_array_equal(m_sh, m_si)


@pytest.mark.parametrize("seq_len", [5000, 1603])
def test_sharded_device_mss_routes_match_host(setup, seq_len):
    # The sharded engine's on-device assembly (+ all-on-chip MSS) and the
    # in-worker-transform host route must both match the single-device
    # host MSS classes exactly.
    from deepgrp_tpu.predict.postprocess import predict_sequence

    options, model, params = setup
    onehot = make_onehot(seq_len, seed=seq_len + 7)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=16,
                                      step_size=10)
    want = predict_sequence(model, params, onehot, options, 10, True,
                            device_mss=False)
    dev = predict_sequence(model, params, onehot, options, 10, True,
                           engine=sharded, device_mss=True)
    auto = predict_sequence(model, params, onehot, options, 10, True,
                            engine=sharded, device_mss="auto")
    host = predict_sequence(model, params, onehot, options, 10, True,
                            engine=sharded, device_mss=False)
    np.testing.assert_array_equal(np.asarray(dev, np.int64),
                                  np.asarray(want, np.int64))
    np.testing.assert_array_equal(np.asarray(auto, np.int64),
                                  np.asarray(want, np.int64))
    np.testing.assert_array_equal(np.asarray(host, np.int64),
                                  np.asarray(want, np.int64))


def test_sharded_bf16_packed_transport_matches_single(setup):
    # The 3 B/bp bf16 fast-mode transport on the sharded engine decodes
    # to exactly the single-device engine's (normalized) scored track.
    import jax.numpy as jnp

    options, model, params = setup
    onehot = make_onehot(4000, seed=123)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=16,
                                      step_size=10,
                                      compute_dtype=jnp.bfloat16)
    single = PredictionEngine(model, batch_size=16, step_size=10,
                              compute_dtype=jnp.bfloat16)
    c_sh, m_sh = sharded.predict_scored(params, onehot)
    c_si, m_si = single.predict_scored(params, onehot)
    np.testing.assert_array_equal(c_sh, c_si)
    np.testing.assert_array_equal(m_sh, m_si)


def test_sharded_scored_partial_device_coverage(setup):
    # Window count that leaves trailing devices fully masked and one device
    # partially masked: boundary spills at the real/masked frontier must
    # still land exactly like the single-device scan.
    options, model, params = setup
    mesh = make_mesh()
    for seq_len in (700, 1100):
        onehot = make_onehot(seq_len, seed=seq_len)
        sharded = ShardedPredictionEngine(model, mesh, batch_size=4,
                                          step_size=10)
        single = PredictionEngine(model, batch_size=4, step_size=10)
        c_sh, m_sh = sharded.predict_scored(params, onehot)
        c_si, m_si = single.predict_scored(params, onehot)
        np.testing.assert_array_equal(c_sh, c_si)
        np.testing.assert_array_equal(m_sh, m_si)


def test_sharded_scored_genome_scale():
    # >= 10 Mbp through the sharded scored path on the CPU mesh: the
    # per-device sequence shards + in-scan scoring keep every array small
    # (no genome-length f32 matrix anywhere).  A tiny model keeps the CPU
    # forward cheap; the memory/indexing structure is what's under test.
    options = Options(vecsize=25, units=4, batch_size=512,
                      repeats_to_search=[1, 2])
    model = create_model(options)
    params = model.init(jax.random.PRNGKey(7))
    seq_len = 10_000_000
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=seq_len).astype(np.int8)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=512,
                                      step_size=50)
    c_sh, m_sh = sharded.predict_scored(params, codes)
    assert c_sh.shape == (seq_len,) and m_sh.shape == (seq_len,)
    single = PredictionEngine(model, batch_size=512, step_size=50)
    c_si, m_si = single.predict_scored(params, codes)
    np.testing.assert_array_equal(c_sh, c_si)
    np.testing.assert_array_equal(m_sh, m_si)


def test_sharded_predict_codes_input_matches_one_hot(setup):
    # The sharded engine also accepts the compact [L] code representation.
    options, model, params = setup
    onehot = make_onehot(4000, seed=9)
    codes = onehot.argmax(axis=0).astype(np.int8)
    mesh = make_mesh()
    sharded = ShardedPredictionEngine(model, mesh, batch_size=16,
                                      step_size=10)
    np.testing.assert_array_equal(sharded.predict(params, codes),
                                  sharded.predict(params, onehot))
    c1, m1 = sharded.predict_scored(params, codes)
    c2, m2 = sharded.predict_scored(params, onehot)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(m1, m2)
