"""Mesh / sharding tests on the 8-virtual-device CPU backend.

The multi-device test layer the reference has no analog for
(SURVEY.md §2.6): mesh construction, batch sharding, TP param sharding
rules, DP-consistency of a sharded train step, and the driver's
dryrun_multichip entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from psg_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from psg_tpu.parallel.sharding import unet_tp_rules


def test_device_count():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"


def test_make_mesh_shapes():
    m = make_mesh()  # all devices on data
    assert dict(m.shape) == {"data": 8, "model": 1}
    m = make_mesh(model=2)
    assert dict(m.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_shard_batch_placement():
    mesh = make_mesh()
    batch = {"image": np.zeros((16, 8, 8, 3), np.float32),
             "ids": np.zeros((16, 4), np.int32),
             "valid": np.int32(16)}
    sharded = shard_batch(batch, mesh)
    assert sharded["image"].sharding.spec == P("data", None, None, None)
    assert sharded["ids"].sharding.spec == P("data", None)
    # per-device shard is 1/8 of the batch
    assert sharded["image"].addressable_shards[0].data.shape[0] == 2
    assert sharded["valid"].sharding.spec == P()


def test_unet_tp_rules_and_divisibility_fallback():
    mesh = make_mesh(model=2)
    params = {
        "big_conv": {"w": jnp.zeros((3, 3, 320, 640)), "b": jnp.zeros((640,))},
        "big_lin": {"w": jnp.zeros((1280, 1280)), "b": jnp.zeros((1280,))},
        "small": {"w": jnp.zeros((3, 3, 8, 32)), "b": jnp.zeros((32,))},
        "odd": {"w": jnp.zeros((3, 3, 8, 645)), "b": jnp.zeros((645,))},
    }
    sh = param_shardings(params, mesh, unet_tp_rules(min_channels=640))
    assert sh["big_conv"]["w"].spec == P(None, None, None, "model")
    assert sh["big_lin"]["w"].spec == P(None, "model")
    assert sh["small"]["w"].spec == P()
    # 645 not divisible by model=2 -> replicated, not an error
    assert sh["odd"]["w"].spec == P()


def test_dp_train_step_matches_single_device():
    """A DP-sharded jitted loss/grad step must produce the same numbers as
    the unsharded computation (XLA inserts the psum)."""
    from psg_tpu.models.unet import UNetSpec, unet_apply, unet_init

    spec = UNetSpec(text_dim=16, time_emb_dim=16, channels=(8, 16, 16, 16),
                    num_heads=2, spatial=(9, 5, 3, 2))
    params = unet_init(jax.random.PRNGKey(0), spec)
    key = jax.random.PRNGKey(1)
    batch = 8
    x = jax.random.normal(key, (batch, 9, 9, 8))
    t = jnp.arange(batch) * 100
    txt = jax.random.normal(key, (batch, 6, 16))
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def loss_fn(p, x, t, txt, noise):
        pred = unet_apply(p, x, t, txt, spec)
        return jnp.mean((pred - noise) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # single device
    l0, g0 = grad_fn(params, x, t, txt, noise)

    # sharded over the mesh
    mesh = make_mesh()
    params_r = jax.device_put(params, replicated(mesh))
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    ts = jax.device_put(t, batch_sharding(mesh, 1))
    txts = jax.device_put(txt, batch_sharding(mesh, 3))
    ns = jax.device_put(noise, batch_sharding(mesh, noise.ndim))
    l1, g1 = grad_fn(params_r, xs, ts, txts, ns)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_shard_state_places_params_and_moments():
    """shard_state: wide kernels AND their Adam moments land on 'model';
    scalars/counters replicated (VERDICT r1 missing #4)."""
    import optax

    from psg_tpu.parallel import shard_state
    from psg_tpu.train.state import TrainState

    mesh = make_mesh(model=2)
    params = {"wide": {"w": jnp.ones((8, 64)), "b": jnp.zeros((64,))},
              "small": {"w": jnp.ones((8, 8))}}
    tx = optax.apply_if_finite(optax.adamw(1e-3), 10)
    state = TrainState.create(params, tx.init(params), jax.random.PRNGKey(0))
    state = shard_state(state, mesh, unet_tp_rules(min_channels=64))

    assert state.params["wide"]["w"].sharding.spec == P(None, "model")
    assert state.params["small"]["w"].sharding.spec == P()
    adam = state.opt_state.inner_state[0]
    assert adam.mu["wide"]["w"].sharding.spec == P(None, "model")
    assert adam.nu["wide"]["w"].sharding.spec == P(None, "model")
    assert state.step.sharding.spec == P()


def test_tp_train_step_matches_replicated():
    """One adamw train step with TP-sharded params must equal the
    replicated (DP-only) step numerically: sharding is layout, not math."""
    import optax

    from psg_tpu.models.unet import UNetSpec, unet_apply, unet_init
    from psg_tpu.parallel import shard_state
    from psg_tpu.train.state import TrainState

    spec = UNetSpec(text_dim=16, time_emb_dim=16, channels=(16, 32, 32, 32),
                    num_heads=2, spatial=(9, 5, 3, 2))
    params = unet_init(jax.random.PRNGKey(0), spec)
    key = jax.random.PRNGKey(1)
    batch = 8
    x = jax.random.normal(key, (batch, 9, 9, 8))
    t = jnp.arange(batch) * 100
    txt = jax.random.normal(key, (batch, 6, 16))
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    tx = optax.adamw(1e-3)

    def step(state, x, t, txt, noise):
        def loss_fn(p):
            pred = unet_apply(p, x, t, txt, spec)
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax as _o

        params = _o.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, state.rng), loss

    jstep = jax.jit(step)

    def run(mesh, rule):
        st = TrainState.create(params, tx.init(params), jax.random.PRNGKey(3))
        st = shard_state(st, mesh, rule)
        xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
        ts = jax.device_put(t, batch_sharding(mesh, 1))
        txts = jax.device_put(txt, batch_sharding(mesh, 3))
        ns = jax.device_put(noise, batch_sharding(mesh, noise.ndim))
        st, l1 = jstep(st, xs, ts, txts, ns)
        st, l2 = jstep(st, xs, ts, txts, ns)
        return st, float(l1), float(l2)

    st_dp, dp1, dp2 = run(make_mesh(), None)
    st_tp, tp1, tp2 = run(make_mesh(model=2), unet_tp_rules(min_channels=32))

    # TP params really are sharded
    wide = st_tp.params["enc1"][0]["res"]["conv1"]["w"]
    assert wide.sharding.spec == P(None, None, None, "model")

    np.testing.assert_allclose(dp1, tp1, rtol=1e-5)
    np.testing.assert_allclose(dp2, tp2, rtol=1e-5)
    # sharded matmuls change fp32 reduction order; adam's rsqrt amplifies
    # tiny grad diffs on near-zero moments — hence the loose atol
    for a, b in zip(jax.tree_util.tree_leaves(st_dp.params),
                    jax.tree_util.tree_leaves(st_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=3e-4)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_sharded_batch_serving_divides_evenly():
    """BASELINE config 5 semantics: batch 64 shards over 8 devices."""
    mesh = make_mesh()
    arr = np.zeros((64, 27, 27, 8), np.float32)
    sharded = jax.device_put(arr, batch_sharding(mesh, 4))
    assert sharded.addressable_shards[0].data.shape == (8, 27, 27, 8)
    assert len(sharded.addressable_shards) == 8
