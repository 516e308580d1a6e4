"""Training dynamics parity vs torch (SGD+momentum+wd+clip+LambdaLR and the
decoder-freeze schedule), sharded training on an 8-device mesh, and
checkpoint round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from style_seqcvae_tpu.config import Config
from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner
from style_seqcvae_tpu.training.optimizer import sgd_with_freeze_schedule
from style_seqcvae_tpu.training.trainer import TrainState, create_train_state, make_train_step


def test_sgd_matches_torch_dynamics():
    """10 steps on a quadratic; torch.optim.SGD(momentum, wd) + LambdaLR +
    clip_grad_norm_ vs our transformation. Includes the freeze schedule on
    the 'decoder' leaf (frozen except every 3rd step until it>5)."""
    N_ITER, CLIP = 20, 0.5
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    d0 = np.array([0.5, 0.5], np.float32)
    target_w = np.array([0.0, 1.0, -1.0], np.float32)
    target_d = np.array([-1.0, 2.0], np.float32)

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    dt = torch.nn.Parameter(torch.from_numpy(d0.copy()))
    opt = torch.optim.SGD([wt, dt], lr=0.1, momentum=0.9, weight_decay=0.01)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda it: 1 - it / N_ITER)
    for it in range(1, 11):
        dec_active = it > 5 or it % 3 == 0
        dt.requires_grad_(dec_active)
        opt.zero_grad()
        loss = ((wt - torch.from_numpy(target_w)) ** 2).sum()
        if dec_active:
            loss = loss + ((dt - torch.from_numpy(target_d)) ** 2).sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([p for p in (wt, dt) if p.grad is not None], CLIP)
        opt.step()
        sched.step()

    # jax side
    params = {"w": jnp.asarray(w0), "decoder_lstm": {"w": jnp.asarray(d0)}}
    labels = {"w": "always", "decoder_lstm": {"w": "decoder"}}
    tx = sgd_with_freeze_schedule(
        labels, lr=0.1, momentum=0.9, weight_decay=0.01, num_iterations=N_ITER,
        clip_norm=CLIP, decoder_start_iteration=5, decoder_update_every=3)
    opt_state = tx.init(params)

    def loss_fn(p):
        return (jnp.sum((p["w"] - jnp.asarray(target_w)) ** 2)
                + jnp.sum((p["decoder_lstm"]["w"] - jnp.asarray(target_d)) ** 2))

    for _ in range(10):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["decoder_lstm"]["w"]),
                               dt.detach().numpy(), atol=1e-5)


CFG = CaptionerConfig(vocab_size=30, image_feature_size=8, embedding_size=6,
                      hidden_size=5, attention_projection_size=4, z_space=3,
                      sentiment_vae=1, simple_vae=False, max_caption_length=6)


def make_batch(b=16):
    rng = np.random.RandomState(0)
    return {
        "image_features": jnp.asarray(rng.randn(b, 4, 8).astype(np.float32)),
        "caption_tokens": jnp.asarray(rng.randint(2, 30, (b, 6)).astype(np.int32)),
        "sentiment": jnp.asarray(rng.choice([-1.0, 1.0], (b, 1)).astype(np.float32)),
    }


def small_config():
    return Config(config_override=[
        "OPTIM.LR", "0.05", "OPTIM.NUM_ITERATIONS", "100",
        "OPTIM.EPOCH_START_DECODER_TRAINING", "10",
        "OPTIM.BEFORE_UPDATE_DECODER_EVERY", "3",
        "MODEL.EMBEDDING_SIZE", "6",
    ])


def test_train_step_loss_decreases():
    config = small_config()
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    state, tx = create_train_state(params, config, CFG, jax.random.PRNGKey(1))
    step = make_train_step(tx, CFG, config.MODEL.KLD_WEIGHT)
    batch = make_batch()
    losses = []
    for _ in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 20


def test_sharded_train_step_on_8_device_mesh():
    """DP over the 8 virtual CPU devices: data-sharded batch, XLA-inserted
    gradient psum. Loss must be finite and params stay consistent."""
    from style_seqcvae_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    mesh = make_mesh(num_data=4, num_model=2)
    config = small_config()
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    params = shard_params(mesh, params)
    state, tx = create_train_state(params, config, CFG, jax.random.PRNGKey(1))
    step = make_train_step(tx, CFG, config.MODEL.KLD_WEIGHT)
    batch = shard_batch(mesh, make_batch(16))
    with jax.sharding.set_mesh(mesh):
        for _ in range(3):
            state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # Equality with the unsharded run (same rng, same batch).
    params2 = init_captioner(jax.random.PRNGKey(0), CFG)
    state2, tx2 = create_train_state(params2, config, CFG, jax.random.PRNGKey(1))
    step2 = make_train_step(tx2, CFG, config.MODEL.KLD_WEIGHT)
    b2 = make_batch(16)
    for _ in range(3):
        state2, metrics2 = step2(state2, b2)
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics2["loss"]),
                               rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from style_seqcvae_tpu.training.checkpointing import CheckpointManager

    config = small_config()
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    state, tx = create_train_state(params, config, CFG, jax.random.PRNGKey(1))
    step = make_train_step(tx, CFG, config.MODEL.KLD_WEIGHT)
    batch = make_batch(8)
    for _ in range(3):
        state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ser"))
    mgr.step(state, metric=0.5, iteration=3)
    mgr.step(state, metric=0.7, iteration=4)
    assert mgr.latest_iteration() == 4

    # restore into a freshly-initialized skeleton
    params0 = init_captioner(jax.random.PRNGKey(42), CFG)
    target, _ = create_train_state(params0, config, CFG, jax.random.PRNGKey(2))
    restored = mgr.restore("checkpoint_3", target)
    assert int(restored.opt_state.step) == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["embedding"]), np.asarray(state.params["embedding"]))

    # resumed training continues identically
    s_cont, m_cont = step(state, batch)
    s_rest, m_rest = step(restored, batch)
    np.testing.assert_allclose(float(m_cont["loss"]), float(m_rest["loss"]), rtol=1e-6)


def test_checkpoint_retention_prunes_old_keeps_best(tmp_path):
    """keep=2 retains only the 2 newest checkpoint_{it} dirs; checkpoint_best
    survives pruning and still restores (VERDICT r1: keep was dead)."""
    import os

    from style_seqcvae_tpu.training.checkpointing import CheckpointManager

    config = small_config()
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    state, tx = create_train_state(params, config, CFG, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ser"), keep=2)
    # best metric lands on iteration 1 and never improves again
    for it, metric in [(1, 0.9), (2, 0.1), (3, 0.2), (4, 0.3)]:
        mgr.step(state, metric=metric, iteration=it, config_dump="X: 1\n")

    names = sorted(os.listdir(tmp_path / "ser"))
    assert "checkpoint_3" in names and "checkpoint_4" in names
    assert "checkpoint_1" not in names and "checkpoint_2" not in names
    assert "checkpoint_1.config.yml" not in names
    assert "checkpoint_best" in names
    assert mgr.latest_iteration() == 4

    target, _ = create_train_state(
        init_captioner(jax.random.PRNGKey(9), CFG), config, CFG,
        jax.random.PRNGKey(2))
    restored = mgr.restore("checkpoint_best", target)
    np.testing.assert_array_equal(np.asarray(restored.params["embedding"]),
                                  np.asarray(state.params["embedding"]))


def test_checkpoint_best_ties_track_newest(tmp_path):
    """With the train CLI's constant metric, checkpoint_best must track the
    NEWEST save (ties refresh best): inference/serve default to loading
    checkpoint_best, and a strict comparison would freeze it at the first
    periodic save while retention pruned everything around it."""
    from style_seqcvae_tpu.training.checkpointing import CheckpointManager

    config = small_config()
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    state, tx = create_train_state(params, config, CFG, jax.random.PRNGKey(1))
    step = make_train_step(tx, CFG, config.MODEL.KLD_WEIGHT)
    batch = make_batch(8)

    mgr = CheckpointManager(str(tmp_path / "ser"))
    mgr.step(state, metric=0.0, iteration=1)
    state2, _ = step(state, batch)
    mgr.step(state2, metric=0.0, iteration=2)

    target, _ = create_train_state(
        init_captioner(jax.random.PRNGKey(9), CFG), config, CFG,
        jax.random.PRNGKey(2))
    restored = mgr.restore("checkpoint_best", target)
    assert int(restored.opt_state.step) == int(state2.opt_state.step)
    np.testing.assert_array_equal(
        np.asarray(restored.params["output_projection"]["w"]
                   if "output_projection" in restored.params
                   else restored.params["output_layer"]["w"]),
        np.asarray(state2.params["output_projection"]["w"]
                   if "output_projection" in state2.params
                   else state2.params["output_layer"]["w"]))


def test_bf16_compute_tracks_f32():
    """--bf16-compute (bf16 fwd/bwd, f32 master params + optimizer): per-step
    losses must track the f32 run closely and params must stay float32.
    Measured 1.38x per-step on one v5e at the reference shape (BASELINE.md
    "captioner mixed precision")."""
    config = small_config()
    # two independent (identical) trees: the jitted step donates its state,
    # so the runs must not alias buffers
    params_a = init_captioner(jax.random.PRNGKey(0), CFG)
    params_b = init_captioner(jax.random.PRNGKey(0), CFG)
    state_a, tx_a = create_train_state(params_a, config, CFG, jax.random.PRNGKey(1))
    state_b, tx_b = create_train_state(params_b, config, CFG, jax.random.PRNGKey(1))
    step_f32 = make_train_step(tx_a, CFG, config.MODEL.KLD_WEIGHT)
    step_bf16 = make_train_step(tx_b, CFG, config.MODEL.KLD_WEIGHT,
                                compute_dtype=jnp.bfloat16)
    batch = make_batch()
    for i in range(10):
        state_a, m_a = step_f32(state_a, batch)
        state_b, m_b = step_bf16(state_b, batch)
        assert np.isfinite(float(m_b["loss"]))
        # bf16 mantissa (8 bits) → a few % tolerance, growing with steps
        np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                                   rtol=0.05)
    for leaf in jax.tree_util.tree_leaves(state_b.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_chained_step_equals_sequential():
    """make_chained_train_step (K steps per dispatch via lax.scan) must be
    mathematically identical to K sequential make_train_step calls:
    same final params/opt-state/rng, same per-step metrics — including the
    decoder-freeze schedule crossing its unfreeze boundary mid-window."""
    from style_seqcvae_tpu.training.trainer import make_chained_train_step

    K = 6
    config = small_config()   # EPOCH_START_DECODER_TRAINING=10 → boundary
    params = init_captioner(jax.random.PRNGKey(0), CFG)

    # distinct batch per step
    rng = np.random.RandomState(3)
    batches = []
    for _ in range(2 * K):     # two windows → crosses step 10 inside w2
        b = 8
        batches.append({
            "image_features": jnp.asarray(rng.randn(b, 4, 8).astype(np.float32)),
            "caption_tokens": jnp.asarray(
                rng.randint(2, 30, (b, 6)).astype(np.int32)),
            "sentiment": jnp.asarray(
                rng.choice([-1.0, 1.0], (b, 1)).astype(np.float32)),
        })

    state_a, tx_a = create_train_state(params, config, CFG, jax.random.PRNGKey(1))
    step = make_train_step(tx_a, CFG, config.MODEL.KLD_WEIGHT)
    seq_metrics = []
    for b in batches:
        state_a, m = step(state_a, b)
        seq_metrics.append({k: float(v) for k, v in m.items()})

    # fresh identical params: run A's donated buffers are deleted
    params_b = init_captioner(jax.random.PRNGKey(0), CFG)
    state_b, tx_b = create_train_state(params_b, config, CFG,
                                       jax.random.PRNGKey(1))
    chained = make_chained_train_step(tx_b, CFG, config.MODEL.KLD_WEIGHT)
    chain_metrics = []
    for w in range(2):
        group = batches[w * K:(w + 1) * K]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *group)
        state_b, mk = chained(state_b, stacked)
        mk = jax.tree_util.tree_map(np.asarray, mk)
        for j in range(K):
            chain_metrics.append({k: float(v[j]) for k, v in mk.items()})

    assert int(state_a.step) == int(state_b.step) == 2 * K
    for ma, mb in zip(seq_metrics, chain_metrics):
        for k in ma:
            np.testing.assert_allclose(mb[k], ma[k], rtol=1e-5, atol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(state_a.rng),
                                  np.asarray(state_b.rng))


def test_sharded_chained_step_matches_unsharded():
    """make_chained_train_step on a (data, model) mesh with
    leading_scan_axis batch sharding equals the unsharded chained run."""
    from style_seqcvae_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_params)
    from style_seqcvae_tpu.training.trainer import make_chained_train_step

    K = 3
    config = small_config()
    rng = np.random.RandomState(5)
    group = []
    for _ in range(K):
        group.append({
            "image_features": rng.randn(16, 4, 8).astype(np.float32),
            "caption_tokens": rng.randint(2, 30, (16, 6)).astype(np.int32),
            "sentiment": rng.choice([-1.0, 1.0], (16, 1)).astype(np.float32),
        })
    stacked_np = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *group)

    mesh = make_mesh(num_data=4, num_model=2)
    params = shard_params(mesh, init_captioner(jax.random.PRNGKey(0), CFG))
    state, tx = create_train_state(params, config, CFG, jax.random.PRNGKey(1))
    chained = make_chained_train_step(tx, CFG, config.MODEL.KLD_WEIGHT)
    stacked = shard_batch(mesh, stacked_np, leading_scan_axis=True)
    with jax.sharding.set_mesh(mesh):
        state, mk = chained(state, stacked)
    mk = jax.tree_util.tree_map(np.asarray, mk)
    assert mk["loss"].shape == (K,) and np.isfinite(mk["loss"]).all()

    params2 = init_captioner(jax.random.PRNGKey(0), CFG)
    state2, tx2 = create_train_state(params2, config, CFG, jax.random.PRNGKey(1))
    chained2 = make_chained_train_step(tx2, CFG, config.MODEL.KLD_WEIGHT)
    state2, mk2 = chained2(state2, jax.tree_util.tree_map(jnp.asarray,
                                                          stacked_np))
    np.testing.assert_allclose(mk["loss"], np.asarray(mk2["loss"]), rtol=1e-4)


def test_corpus_step_equals_regular():
    """The --device-corpus path (HBM-resident feature table + in-step index
    gather, trainer.make_corpus_train_step) must be mathematically identical
    to the host feature path on the gathered rows — single step and the
    K-chained variant."""
    from style_seqcvae_tpu.training.trainer import (
        make_corpus_chained_train_step, make_corpus_train_step,
        make_chained_train_step)

    config = small_config()
    rng = np.random.RandomState(11)
    N = 10
    table = rng.randn(N, 4, 8).astype(np.float32)
    idx = rng.randint(0, N, (8,)).astype(np.int32)
    base = {
        "caption_tokens": jnp.asarray(
            rng.randint(2, 30, (8, 6)).astype(np.int32)),
        "sentiment": jnp.asarray(
            rng.choice([-1.0, 1.0], (8, 1)).astype(np.float32)),
    }

    params_a = init_captioner(jax.random.PRNGKey(0), CFG)
    state_a, tx_a = create_train_state(params_a, config, CFG, jax.random.PRNGKey(1))
    step_a = make_train_step(tx_a, CFG, config.MODEL.KLD_WEIGHT)
    state_a, m_a = step_a(state_a, {**base,
                                    "image_features": jnp.asarray(table[idx])})

    params_b = init_captioner(jax.random.PRNGKey(0), CFG)
    state_b, tx_b = create_train_state(params_b, config, CFG, jax.random.PRNGKey(1))
    step_b = make_corpus_train_step(tx_b, CFG, config.MODEL.KLD_WEIGHT)
    state_b, m_b = step_b(state_b, jnp.asarray(table),
                          {**base, "feat_idx": jnp.asarray(idx)})

    for k in m_a:
        np.testing.assert_allclose(float(m_b[k]), float(m_a[k]), rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la), rtol=1e-6)

    # chained K=3 window vs the regular chained step on gathered features
    K = 3
    idxs = rng.randint(0, N, (K, 8)).astype(np.int32)
    toks = rng.randint(2, 30, (K, 8, 6)).astype(np.int32)
    sent = rng.choice([-1.0, 1.0], (K, 8, 1)).astype(np.float32)

    params_c = init_captioner(jax.random.PRNGKey(0), CFG)
    state_c, tx_c = create_train_state(params_c, config, CFG, jax.random.PRNGKey(1))
    corpus_chained = make_corpus_chained_train_step(tx_c, CFG,
                                                    config.MODEL.KLD_WEIGHT)
    state_c, mk_c = corpus_chained(state_c, jnp.asarray(table), {
        "feat_idx": jnp.asarray(idxs), "caption_tokens": jnp.asarray(toks),
        "sentiment": jnp.asarray(sent)})

    params_d = init_captioner(jax.random.PRNGKey(0), CFG)
    state_d, tx_d = create_train_state(params_d, config, CFG, jax.random.PRNGKey(1))
    chained = make_chained_train_step(tx_d, CFG, config.MODEL.KLD_WEIGHT)
    state_d, mk_d = chained(state_d, {
        "image_features": jnp.asarray(table[idxs]),
        "caption_tokens": jnp.asarray(toks), "sentiment": jnp.asarray(sent)})

    np.testing.assert_allclose(np.asarray(mk_c["loss"]),
                               np.asarray(mk_d["loss"]), rtol=1e-6)
    for lc, ld in zip(jax.tree_util.tree_leaves(state_c.params),
                      jax.tree_util.tree_leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(lc), np.asarray(ld), rtol=1e-6)
