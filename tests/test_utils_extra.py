"""Tests: prefetcher, checkify wrapper, reference config translation,
multi-chip decode sharding."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_seqcvae_tpu.config import Config
from style_seqcvae_tpu.data.prefetch import prefetch
from style_seqcvae_tpu.utils.debug import checked


def test_prefetch_order_and_exception():
    assert list(prefetch(iter(range(10)), 3)) == list(range(10))

    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad(), 2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_prefetch_overlaps():
    def slow_gen():
        for i in range(5):
            time.sleep(0.05)
            yield i

    it = prefetch(slow_gen(), buffer_size=5)
    first = next(it)
    time.sleep(0.3)  # producer fills buffer meanwhile
    t0 = time.time()
    rest = list(it)
    assert time.time() - t0 < 0.15  # buffered, not re-paying sleep
    assert [first] + rest == list(range(5))


def test_checked_raises_on_nan():
    @checked
    def f(x):
        return jnp.log(x)

    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))
    assert float(f(jnp.asarray(1.0))) == 0.0


def test_reference_config_translation_loads():
    C = Config("configs/style_seqcvae_senticap.yml")
    assert C.MODEL.EMBEDDING_SIZE == 600
    assert C.MODEL.HIDDEN_SIZE == 900
    assert C.MODEL.KLD_WEIGHT == 750
    assert C.MODEL.N_Z_SAMPLES == 20
    assert C.OPTIM.NUM_ITERATIONS == 70000
    assert C.MODEL.USE_CBS and C.MODEL.CBS_SIMPLE


def test_decode_grid_shards_over_mesh():
    """CBS decode with the batch axis sharded over the 8-device mesh —
    the throughput-DP inference path (SURVEY §2.6)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from style_seqcvae_tpu.decoding.cbs_fast import (
        constrained_beam_search_fast, fsm_to_tables, stack_fsm_tables)
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context, make_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state
    from style_seqcvae_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=8, num_model=1)
    cfg = CaptionerConfig(vocab_size=40, image_feature_size=8, embedding_size=6,
                          hidden_size=5, attention_projection_size=4, z_space=3,
                          max_caption_length=6, beam_size=2, use_cbs=True)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    B = 16
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 8))

    fsm = np.zeros((4, 4, 40), np.uint8)
    for s in range(4):
        fsm[s, s, :] = 1
    fsm[0, 1, 5] = 1
    fsm[0, 0, 5] = 0
    tables = stack_fsm_tables([fsm_to_tables(fsm)] * B)

    feats_sharded = jax.device_put(feats, NamedSharding(mesh, P("data")))
    tables_sharded = jax.tree_util.tree_map(
        lambda t: jax.device_put(t, NamedSharding(mesh, P("data"))), tables)

    @jax.jit
    def decode(params, feats, tables):
        ctx = make_decode_context(params, cfg, feats)
        step = make_step_fn(params, cfg, ctx)
        st = init_cell_state((B,), cfg.hidden_size)
        return constrained_beam_search_fast(
            step, jnp.full((B,), cfg.boundary_index), st, tables,
            jax.random.PRNGKey(2), max_steps=6, beam_size=2,
            end_index=cfg.boundary_index)

    with jax.sharding.set_mesh(mesh):
        seqs, lp = decode(params, feats_sharded, tables_sharded)
    assert seqs.shape == (B, 4, 2, 6)
    assert np.all(np.isfinite(np.asarray(lp)[:, 0]))
    # equal to the unsharded result
    seqs2, lp2 = decode(params, feats, tables)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs2))


def test_prune_compile_cache(tmp_path):
    """Cache GC (utils/cache.py): key-drift duplicates (same jit name, size
    within 2%) dedup keeping the newest; then an LRU size cap; dry_run
    reports without deleting."""
    import os
    import time

    from style_seqcvae_tpu.utils.cache import prune_compile_cache

    d = tmp_path / "cache"
    d.mkdir()

    def mk(name, size, age):
        p = d / name
        p.write_bytes(b"x" * size)
        t = time.time() - age
        os.utime(p, (t, t))

    # drift pair: same name-prefix, sizes 1% apart, stale one a round
    # behind (>= drift_age_secs older) -> older dropped
    mk("jit_decode_all-aaaa-cache", 1_000_000, age=7200)
    mk("jit_decode_all-bbbb-cache", 1_005_000, age=10)
    # same name, very different size (different shape bucket) -> both kept
    mk("jit_decode_all-cccc-cache", 2_000_000, age=50)
    # unrelated entry
    mk("jit_train-dddd-cache", 500_000, age=200)
    # two DISTINCT live programs under a generic jit name, near-same size,
    # stored far apart: generic names are excluded from dedup (ADVICE r4 —
    # deleting one causes perpetual delete/recompile/re-store churn)
    mk("jit__lambda-eeee-cache", 300_000, age=7200)
    mk("jit__lambda-ffff-cache", 301_000, age=10)
    # same name, near size, both stored within the same run (minutes
    # apart): NOT drift — both survive
    mk("jit_serve-gggg-cache", 400_000, age=120)
    mk("jit_serve-hhhh-cache", 401_000, age=10)

    r = prune_compile_cache(path=str(d), max_bytes=10**9, dry_run=True)
    assert [x["name"] for x in r["dropped"]] == ["jit_decode_all-aaaa-cache"]
    assert (d / "jit_decode_all-aaaa-cache").exists()   # dry run

    r = prune_compile_cache(path=str(d), max_bytes=10**9)
    assert not (d / "jit_decode_all-aaaa-cache").exists()
    assert (d / "jit_decode_all-bbbb-cache").exists()
    assert (d / "jit_decode_all-cccc-cache").exists()
    assert (d / "jit__lambda-eeee-cache").exists()
    assert (d / "jit__lambda-ffff-cache").exists()
    assert (d / "jit_serve-gggg-cache").exists()
    assert (d / "jit_serve-hhhh-cache").exists()
    for n in ("jit__lambda-eeee-cache", "jit__lambda-ffff-cache",
              "jit_serve-gggg-cache", "jit_serve-hhhh-cache"):
        (d / n).unlink()

    # size cap: each group's NEWEST entry is protected (cache hits never
    # bump mtime, so "oldest" means oldest-STORED — evicting a group's only
    # entry would drop a possibly-hot program family); the older
    # shape-variant (cccc) is the only evictable entry
    r = prune_compile_cache(path=str(d), max_bytes=3_100_000)
    names = {x["name"] for x in r["dropped"]}
    assert names == {"jit_decode_all-cccc-cache"}
    assert (d / "jit_train-dddd-cache").exists()         # group-newest kept
    assert r["kept_bytes"] <= 3_100_000
