"""QAT training-step tests: STE loss descent, optax state step, remat
equivalence, gradient accumulation, checkpoint round-trip, sharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import llama, train

pytestmark = pytest.mark.slow  # full-model interpret-mode: `pytest -m ""`

CFG = llama.LlamaConfig(
    vocab=64, dim=64, n_layers=2, n_heads=2, n_kv_heads=2, d_ff=128, max_seq=32
)


def _tokens(batch=4, t=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(1, CFG.vocab, (batch, t)), jnp.int32)


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(jnp.asarray, llama.init_params(CFG, seed=0))


def test_sgd_loss_decreases(params):
    toks = _tokens()
    p = params
    first = last = None
    for _ in range(5):
        p, loss = jax.jit(
            lambda p, t: train.train_step(p, CFG, t, lr=1e-2)
        )(p, toks)
        first = first if first is not None else float(loss)
        last = float(loss)
    assert last < first, (first, last)


def test_state_step_adamw_loss_decreases(params):
    toks = _tokens()
    p, opt, step = train.make_state_step(params, CFG, optimizer="adamw",
                                         lr=1e-3)
    losses = []
    for _ in range(5):
        p, opt, loss = step(p, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_remat_matches_no_remat(params):
    """jax.checkpoint must not change loss or grads (same math)."""
    toks = _tokens(seed=3)
    l0, g0 = jax.value_and_grad(train.loss_fn)(params, CFG, toks, "q4_0",
                                               False)
    l1, g1 = jax.value_and_grad(train.loss_fn)(params, CFG, toks, "q4_0",
                                               True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accumulation_matches_full_batch(params):
    """accum_steps=2 on a 4-row batch == one step on the full batch."""
    toks = _tokens(batch=4, seed=5)
    p1, o1, step1 = train.make_state_step(params, CFG, optimizer="sgd",
                                          lr=1e-2, accum_steps=1)
    p2, o2, step2 = train.make_state_step(params, CFG, optimizer="sgd",
                                          lr=1e-2, accum_steps=2)
    p1, _, l1 = step1(p1, o1, toks)
    p2, _, l2 = step2(p2, o2, toks)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, params):
    toks = _tokens(seed=7)
    p, opt, step = train.make_state_step(params, CFG, optimizer="adamw",
                                         lr=1e-3)
    p, opt, _ = step(p, opt, toks)
    path = tmp_path / "state.npz"
    train.save_train_state(path, p, opt, step=17)

    import optax  # templates give the pytree structure

    tmpl_p = jax.tree.map(jnp.asarray, llama.init_params(CFG, seed=0))
    tmpl_o = train.make_optimizer("adamw", 1e-3).init(tmpl_p)
    p2, opt2, step_no = train.load_train_state(path, tmpl_p, tmpl_o)
    assert step_no == 17
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state continues training identically
    p_a, _, l_a = step(p, opt, toks)
    _, _, l_b = step(jax.tree.map(jnp.asarray, p2), jax.tree.map(
        jnp.asarray, opt2), toks)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)


def test_sharded_state_step():
    """AdamW state step over a dp x tp mesh on the virtual CPU devices."""
    from quant_gemm_tpu.parallel.sharding import make_mesh

    devices = jax.devices()[:4]
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh({"dp": 2, "tp": 2}, devices)
    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=128, max_seq=32)
    params = llama.init_params(cfg, seed=1)
    p, opt, step = train.make_state_step(params, cfg, mesh=mesh,
                                         optimizer="adamw", lr=1e-3,
                                         remat=True)
    toks = jnp.asarray(
        np.random.default_rng(2).integers(1, 64, (4, 16)), jnp.int32
    )
    p, opt, loss = step(p, opt, toks)
    assert np.isfinite(float(loss))
    # optimizer state inherited the param sharding by propagation
    mu = jax.tree.leaves(opt)[1]  # some param-shaped leaf
    assert hasattr(mu, "sharding")


def test_grads_flow_through_long_sequences(params):
    """T >= 64 prefill routes inference through the Pallas flash kernel,
    which has no autodiff rule; training must keep the einsum path
    (regression: value_and_grad raised NotImplementedError at t >= 65)."""
    toks = _tokens(batch=1, t=72, seed=9)
    cfg = CFG._replace(max_seq=128)
    loss, grads = jax.value_and_grad(train.loss_fn)(params, cfg, toks)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
