"""utils/logging (MetricsWriter, StepTimer, device_sync) and
utils/jit_init (fused single-program parameter init).

jit_init is the shared init path of every CLI/bench/graft entry (one jitted
program instead of ~100 eager RNG dispatches, BASELINE.md round-3
diagnosis); it must be numerically identical to eager init and must treat a
provided embedding table as a program ARGUMENT (not a baked-in constant).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.utils.jit_init import jit_init
from style_seqcvae_tpu.utils.logging import MetricsWriter, StepTimer, device_sync


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars(1, {"loss": jnp.float32(2.5), "lr": 0.1})
    w.scalars(2, {"loss": 2.0})
    w.close()
    rows = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert rows[0] == {"step": 1, "loss": 2.5, "lr": 0.1}
    assert rows[1]["step"] == 2 and rows[1]["loss"] == 2.0


def test_step_timer_per_step_normalization():
    t = StepTimer()
    with t.phase("step", count=4):
        pass
    with t.phase("step", count=4):
        pass
    s = t.summary()
    # 2 timed regions covering 8 logical steps → per-step ms, tiny
    assert set(s) == {"step_ms"} and 0.0 <= s["step_ms"] < 100.0
    assert t.counts["step"] == 8


def test_device_sync_returns_float():
    v = device_sync(jnp.sum(jnp.ones((4, 4))))
    assert isinstance(v, float) and v == 16.0


def test_jit_init_matches_eager_captioner():
    from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner

    cfg = CaptionerConfig(vocab_size=50, embedding_size=300, hidden_size=32,
                          attention_projection_size=16, z_space=8)
    key = jax.random.PRNGKey(7)
    eager = init_captioner(key, cfg)
    fused = jit_init(init_captioner, cfg, key)
    for a, b in zip(jax.tree_util.tree_leaves(eager),
                    jax.tree_util.tree_leaves(fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jit_init_embedding_table_is_argument_not_constant():
    from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner

    cfg = CaptionerConfig(vocab_size=50, embedding_size=300, hidden_size=32,
                          attention_projection_size=16, z_space=8)
    key = jax.random.PRNGKey(7)
    emb = np.random.RandomState(0).randn(50, 300).astype(np.float32)
    fused = jit_init(init_captioner, cfg, key, embedding_table=emb)
    np.testing.assert_array_equal(np.asarray(fused["embedding"]), emb)
    # the table must be passed as an argument: the traced program for a
    # different table of the same shape reuses the compiled executable and
    # reflects the NEW values (a baked constant would return the old ones)
    emb2 = emb + 1.0
    fused2 = jit_init(init_captioner, cfg, key, embedding_table=emb2)
    np.testing.assert_array_equal(np.asarray(fused2["embedding"]), emb2)
