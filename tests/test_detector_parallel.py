"""Data-parallel detector training over a mesh: the sharded train step must
match the unsharded one (same PRNG key → identical target sampling; XLA
inserts the gradient psum over the data axis). Runs on the 8-virtual-device
CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.models.detector.faster_rcnn import (
    detector_forward_train,
    init_detector,
)
from style_seqcvae_tpu.parallel.mesh import make_mesh, shard_detector_batch
from style_seqcvae_tpu.training.detector_optimizer import make_detector_optimizer

from tests.test_detector import make_batch, tiny_cfg


def _step_fn(tx, cfg):
    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            return detector_forward_train(p, cfg, batch, key)["total"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, o2 = tx.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda a, b: a + b, params, upd), o2, loss

    return step


def test_sharded_detector_step_matches_unsharded():
    cfg = tiny_cfg()
    params = init_detector(jax.random.PRNGKey(0), cfg)
    tx = make_detector_optimizer(params, lr=1e-2, clip_norm=10.0)
    opt_state = tx.init(params)
    batch = make_batch(np.random.RandomState(3), B=8)
    key = jax.random.PRNGKey(7)
    step = _step_fn(tx, cfg)

    p_ref, _, loss_ref = step(params, opt_state, batch, key)

    mesh = make_mesh(num_data=8, num_model=1)
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    p_sh = jax.device_put(params, repl)
    o_sh = jax.device_put(opt_state, repl)
    b_sh = shard_detector_batch(mesh, batch)
    # att_counts replicated, batch-leading fields split over data
    assert b_sh["att_counts"].sharding.is_fully_replicated
    assert not b_sh["images"].sharding.is_fully_replicated

    p_out, _, loss_sh = step(p_sh, o_sh, b_sh, key)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_sh = jax.tree_util.tree_leaves(p_out)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(flat_ref, flat_sh))
    assert worst < 1e-4, worst
