"""The explicit per-leaf param sharding table (parallel/mesh.py).

VERDICT r1 flagged the old substring path-matcher as fragile: a param rename
silently de-sharded. Now every leaf must resolve through
``_PARAM_SPEC_TABLE`` — these tests pin the intended spec for EVERY leaf of
both families, the FSDP branch, the indivisible-dim fallback, and that an
unknown leaf raises instead of replicating quietly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from style_seqcvae_tpu.config import Config
from style_seqcvae_tpu.models.baseline import init_baseline
from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner
from style_seqcvae_tpu.parallel.mesh import (
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)

CFG = CaptionerConfig(vocab_size=64, image_feature_size=16, embedding_size=8,
                      hidden_size=6, attention_projection_size=4, z_space=4,
                      sentiment_vae=1, simple_vae=False, max_caption_length=6)


def _specs_by_path(params, mesh, **kw):
    sh = param_sharding(mesh, params, **kw)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    return {jax.tree_util.keystr(path): s.spec for path, s in flat}


def test_captioner_every_leaf_has_intended_spec():
    mesh = make_mesh(num_data=4, num_model=2)
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    specs = _specs_by_path(params, mesh)
    expected = {
        "['embedding']": P("model", None),
        "['output_layer']['w']": P(None, "model"),
        "['output_layer']['b']": P("model"),
        "['cell'].attention_lstm.w": P(None, "model"),
        "['cell'].encoder_lstm.w": P(None, "model"),
        "['cell'].decoder_lstm.w": P(None, "model"),
        "['cell'].attention_lstm.b": P(),
        "['cell'].encoder_lstm.b": P(),
        "['cell'].decoder_lstm.b": P(),
        "['cell'].attention.w_query": P(),
        "['cell'].attention.w_image": P(),
        "['cell'].attention.w_attend": P(),
        "['cell'].fc_mean_w": P(),
        "['cell'].fc_mean_b": P(),
        "['cell'].fc_log_var_w": P(),
        "['cell'].fc_log_var_b": P(),
    }
    assert specs == expected


def test_baseline_every_leaf_has_intended_spec():
    mesh = make_mesh(num_data=4, num_model=2)
    params = init_baseline(jax.random.PRNGKey(0), CFG)
    specs = _specs_by_path(params, mesh)
    expected = {
        "['embedding']": P("model", None),
        "['output_layer']['w']": P(None, "model"),
        "['output_layer']['b']": P("model"),
        "['cell'].attention_lstm.w": P(None, "model"),
        "['cell'].language_lstm.w": P(None, "model"),
        "['cell'].attention_lstm.b": P(),
        "['cell'].language_lstm.b": P(),
        "['cell'].attention.w_query": P(),
        "['cell'].attention.w_image": P(),
        "['cell'].attention.w_attend": P(),
    }
    assert specs == expected


def test_unknown_leaf_raises_not_silently_replicates():
    mesh = make_mesh(num_data=4, num_model=2)
    params = {"cell": {"renamed_lstm": {"w": np.zeros((4, 8), np.float32)}}}
    with pytest.raises(ValueError, match="renamed_lstm.*_PARAM_SPEC_TABLE"):
        param_sharding(mesh, params)


def test_indivisible_dims_fall_back_to_replication():
    """Odd vocab (real vocabs are) must not fail device_put — the model-axis
    specs fall back to P() when the dimension doesn't divide."""
    mesh = make_mesh(num_data=4, num_model=2)
    cfg = CaptionerConfig(vocab_size=63, image_feature_size=16,
                          embedding_size=8, hidden_size=6,
                          attention_projection_size=4, z_space=4,
                          sentiment_vae=1, simple_vae=False,
                          max_caption_length=6)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    specs = _specs_by_path(params, mesh)
    assert specs["['embedding']"] == P()          # 63 % 2 != 0
    assert specs["['output_layer']['w']"] == P()
    assert specs["['output_layer']['b']"] == P()
    shard_params(mesh, params)  # must not raise


def test_fsdp_branch_shards_and_trains():
    """shard_params_over_data=True: eligible 2-D leaves shard over data
    (dim 0 when divisible, else dim 1), and a train step on the sharded
    params matches the unsharded loss."""
    from style_seqcvae_tpu.training.trainer import (
        create_train_state, make_train_step)

    mesh = make_mesh(num_data=4, num_model=2)
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    specs = _specs_by_path(params, mesh, shard_params_over_data=True)
    assert specs["['cell'].attention.w_image"] == P("data", None)   # (16, 4)
    assert specs["['cell'].attention.w_query"] == P(None, "data")   # (6, 4)
    assert specs["['cell'].fc_mean_w"] == P(None, "data")           # (6, 4)
    assert specs["['cell'].fc_mean_b"] == P()

    config = Config(config_override=[
        "OPTIM.LR", "0.05", "OPTIM.NUM_ITERATIONS", "100",
        "MODEL.EMBEDDING_SIZE", "8"])
    rng = np.random.RandomState(0)
    batch = {
        "image_features": jnp.asarray(rng.randn(16, 4, 16).astype(np.float32)),
        "caption_tokens": jnp.asarray(rng.randint(2, 64, (16, 6)).astype(np.int32)),
        "sentiment": jnp.asarray(rng.choice([-1.0, 1.0], (16, 1)).astype(np.float32)),
    }

    sharded = shard_params(mesh, params, shard_params_over_data=True)
    state, tx = create_train_state(sharded, config, CFG, jax.random.PRNGKey(1))
    step = make_train_step(tx, CFG, config.MODEL.KLD_WEIGHT)
    with jax.sharding.set_mesh(mesh):
        state, metrics = step(state, shard_batch(mesh, batch))
    loss_fsdp = float(metrics["loss"])

    params2 = init_captioner(jax.random.PRNGKey(0), CFG)
    state2, tx2 = create_train_state(params2, config, CFG, jax.random.PRNGKey(1))
    step2 = make_train_step(tx2, CFG, config.MODEL.KLD_WEIGHT)
    state2, metrics2 = step2(state2, batch)
    np.testing.assert_allclose(loss_fsdp, float(metrics2["loss"]), rtol=1e-4)


def test_tied_embedding_leaves_resolve_and_train():
    """The production shape ties the output head to the embedding
    (embedding_size 300/600 → params carry output_projection.{w,b} instead
    of output_layer). Every leaf must resolve through the table AND a
    sharded train step must run — round-2 regression: the table lacked
    these entries, crashing scripts/train.py at the reference dims."""
    from style_seqcvae_tpu.training.trainer import create_train_state, make_train_step

    cfg = CaptionerConfig(vocab_size=64, image_feature_size=16,
                          embedding_size=300, hidden_size=6,
                          attention_projection_size=4, z_space=4,
                          sentiment_vae=1, simple_vae=False,
                          max_caption_length=6)
    assert cfg.tie_embeddings
    mesh = make_mesh(num_data=4, num_model=2)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    specs = _specs_by_path(params, mesh)
    assert specs["['output_projection']['w']"] == P()
    assert specs["['output_projection']['b']"] == P()
    assert specs["['embedding']"] == P("model", None)

    sharded = shard_params(mesh, params)
    config = Config(config_override=["MODEL.EMBEDDING_SIZE", "300"])
    state, tx = create_train_state(sharded, config, cfg, jax.random.PRNGKey(1))
    step = make_train_step(tx, cfg, config.MODEL.KLD_WEIGHT)
    rng = np.random.RandomState(0)
    batch = {
        "image_features": jnp.asarray(rng.randn(8, 4, 16).astype(np.float32)),
        "caption_tokens": jnp.asarray(rng.randint(2, 64, (8, 6)).astype(np.int32)),
        "sentiment": jnp.asarray(rng.choice([-1.0, 1.0], (8, 1)).astype(np.float32)),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
