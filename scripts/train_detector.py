#!/usr/bin/env python
"""Train the Faster R-CNN detector with the attribute head — CLI mirror of
frcnn/trainval_net.py (loss = rpn_cls + rpn_box + rcnn_cls +
0.5·rcnn_cls_atts + rcnn_box, :345-346; SGD with per-param bias rules,
epoch-stepped lr decay, per-epoch checkpoints)."""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--instances-json", required=True, action="append",
                    nargs="+",
                    help="COCO instances json; repeat the flag (or pass "
                         "several paths) to train on the union of datasets — "
                         "the reference's combined_roidb multi-imdb merge "
                         "('coco_2014_train+valminusminival', "
                         "frcnn/lib/roi_data_layer/roidb.py:88-140)")
parser.add_argument("--image-root", default="")
parser.add_argument("--senticap-json", default="",
                    help="senticap json; its TEST images are excluded from training")
parser.add_argument("--attribs-dir", default="", help="COCO-Attributes pickles dir")
parser.add_argument("--config-override", nargs="*", default=[])
parser.add_argument("--serialization-dir", default="checkpoints/detector")
parser.add_argument("--epochs", type=int, default=10)
parser.add_argument("--steps-per-epoch", type=int, default=0,
                    help="0 = dataset length")
parser.add_argument("--canvas", type=int, nargs=2, default=[640, 1024])
parser.add_argument("--ims-per-batch", type=int, default=1,
                    help="images per SGD step, grouped by canvas orientation "
                         "(the reference trains res101 at 16, README.md:56-61)")
parser.add_argument("--bf16-compute", action="store_true",
                    help="bfloat16 forward/backward with float32 master "
                         "params (no loss scaling needed on TPU; ~1.3x)")
parser.add_argument("--num-data", type=int, default=1,
                    help="data-parallel mesh size; shards --ims-per-batch "
                         "over chips (-1 = all devices)")
parser.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="K optimizer steps scan-chained inside one device "
                         "dispatch (amortizes the per-dispatch tunnel "
                         "latency; mathematically identical to K single "
                         "steps — same recipe as scripts/train.py). "
                         "Leftover same-canvas batches at epoch end run "
                         "through the single-step program.")
parser.add_argument("--unfreeze-backbone", action="store_true",
                    help="train conv1/layer1/BN-affine too (from-scratch "
                         "runs; the reference freeze protects PRETRAINED "
                         "weights and would pin random layers forever)")
parser.add_argument("--depth", type=int, default=101, choices=[50, 101],
                    help="ResNet depth (res101 is the reference run, "
                         "resnet.py:220; res50 converges far faster for "
                         "from-scratch synthetic-world training)")
parser.add_argument("--lr-decay-epochs", type=int, default=4,
                    help="decay lr by DET.TRAIN.GAMMA every N epochs "
                         "(reference fine-tunes from ImageNet with N=4, "
                         "trainval_net.py:323-325; from-scratch training "
                         "needs a longer constant-lr phase)")
parser.add_argument("--remat", action="store_true",
                    help="rematerialize backbone bottlenecks + chunk RoI "
                         "pooling in the backward (trades ~10%% step time "
                         "for activation memory; use for larger canvases/"
                         "batches)")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--seed", type=int, default=3)


def main():
    _A = parser.parse_args()
    import jax

    if _A.cpu:
        jax.config.update("jax_platforms", "cpu")
    from style_seqcvae_tpu.parallel.multihost import (
        maybe_initialize_distributed)
    maybe_initialize_distributed()  # no-op unless SSC_MULTIHOST/SSC_COORDINATOR
    from style_seqcvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from style_seqcvae_tpu.config import Config
    from style_seqcvae_tpu.data.detection import (
        CocoDetectionDataset, canvas_for, flip_record, load_image_bgr,
        make_batch, prepare_image_np)
    from style_seqcvae_tpu.models.detector.faster_rcnn import (
        DetectorConfig, detector_forward_train, init_detector)
    from style_seqcvae_tpu.models.detector.rpn import RPNConfig
    from style_seqcvae_tpu.models.detector.targets import ProposalTargetConfig
    from style_seqcvae_tpu.training.checkpointing import CheckpointManager
    from style_seqcvae_tpu.training.detector_optimizer import make_detector_optimizer
    from style_seqcvae_tpu.utils.logging import MetricsWriter, device_sync

    _C = Config(config_override=_A.config_override)
    D = _C.DET
    random.seed(_A.seed)
    np.random.seed(_A.seed)

    instances = [p for group in _A.instances_json for p in group]
    dataset = CocoDetectionDataset(
        instances, _A.image_root, _A.senticap_json, _A.attribs_dir)
    print(f"{len(dataset)} training images ({len(instances)} instance "
          f"json{'s' if len(instances) > 1 else ''}), "
          f"{dataset.num_classes} classes, {dataset.n_attribs} attributes")

    det_cfg = DetectorConfig(
        num_classes=dataset.num_classes,
        num_att_classes=dataset.n_attribs, depth=_A.depth,
        pooling_mode=D.POOLING_MODE,
        anchor_scales=tuple(D.ANCHOR_SCALES),
        anchor_ratios=tuple(D.ANCHOR_RATIOS),
        rpn=RPNConfig(
            anchor_scales=tuple(D.ANCHOR_SCALES),
            pre_nms_top_n=D.TRAIN.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=D.TRAIN.RPN_POST_NMS_TOP_N,
            nms_thresh=D.TRAIN.RPN_NMS_THRESH,
            rpn_batch_size=D.TRAIN.RPN_BATCHSIZE,
            fg_fraction=D.TRAIN.RPN_FG_FRACTION,
            positive_overlap=D.TRAIN.RPN_POSITIVE_OVERLAP,
            negative_overlap=D.TRAIN.RPN_NEGATIVE_OVERLAP),
        pt=ProposalTargetConfig(
            rois_per_image=D.TRAIN.BATCH_SIZE,
            fg_fraction=D.TRAIN.FG_FRACTION,
            fg_thresh=D.TRAIN.FG_THRESH,
            bg_thresh_hi=D.TRAIN.BG_THRESH_HI,
            bg_thresh_lo=D.TRAIN.BG_THRESH_LO,
            bbox_normalize_means=tuple(D.TRAIN.BBOX_NORMALIZE_MEANS),
            bbox_normalize_stds=tuple(D.TRAIN.BBOX_NORMALIZE_STDS),
            num_classes=dataset.num_classes),
        att_loss_weight=D.ATT_LOSS_WEIGHT, remat=_A.remat)

    from style_seqcvae_tpu.utils.jit_init import jit_init

    params = jit_init(init_detector, det_cfg, jax.random.PRNGKey(_A.seed))
    steps_per_epoch = _A.steps_per_epoch or len(dataset)
    # the LR schedule decays by EPOCH: with image batching an epoch is
    # ceil(images / ims_per_batch) optimizer steps
    opt_steps_per_epoch = -(-steps_per_epoch // max(_A.ims_per_batch, 1))
    tx = make_detector_optimizer(
        params, lr=D.TRAIN.LEARNING_RATE, momentum=D.TRAIN.MOMENTUM,
        weight_decay=D.TRAIN.WEIGHT_DECAY, double_bias=D.TRAIN.DOUBLE_BIAS,
        bias_decay=D.TRAIN.BIAS_DECAY, steps_per_epoch=opt_steps_per_epoch,
        freeze_backbone=not _A.unfreeze_backbone,
        lr_decay_step_epochs=_A.lr_decay_epochs, gamma=D.TRAIN.GAMMA,
        clip_norm=D.TRAIN.CLIP_GRADIENTS)
    opt_state = tx.init(params)

    att_counts = (dataset.att_counts if dataset.att_counts is not None
                  else np.ones((max(dataset.n_attribs, 1),), np.float32))

    def _compute_cast(tree):
        if not _A.bf16_compute:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            # --bf16-compute: bf16 fwd/bwd, f32 master params + optimizer.
            # bf16 keeps the f32 exponent range, so no loss scaling (unlike
            # fp16); the cast's vjp returns f32 grads.
            b = ({**batch, "images": batch["images"].astype(jnp.bfloat16)}
                 if _A.bf16_compute else batch)
            losses = detector_forward_train(_compute_cast(p), det_cfg, b, key)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params2, opt_state2, losses

    K = max(_A.steps_per_dispatch, 1)

    @jax.jit
    def chained_train_step(params, opt_state, stacked, ks):
        """K optimizer steps scanned inside ONE dispatch over a (K, B, …)
        batch stack — same math as K train_step calls (the captioner's
        make_chained_train_step recipe, training/trainer.py). ``ks`` is the
        (K,)-stacked per-step PRNG keys drawn from the SAME host stream the
        single-step loop uses, so K=1 and K>1 produce bit-identical
        checkpoints (test_cli_smoke.py)."""
        att_counts = stacked["att_counts"]
        per_step = {k2: v for k2, v in stacked.items() if k2 != "att_counts"}

        def body(carry, xs):
            p, o = carry
            b, k = xs
            b = dict(b, att_counts=att_counts)

            def loss_fn(pp):
                bb = ({**b, "images": b["images"].astype(jnp.bfloat16)}
                      if _A.bf16_compute else b)
                losses = detector_forward_train(_compute_cast(pp), det_cfg,
                                                bb, k)
                return losses["total"], losses

            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, o2 = tx.update(grads, o, p)
            p2 = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
            return (p2, o2), losses

        (params2, opt_state2), losses = jax.lax.scan(
            body, (params, opt_state), (per_step, ks))
        return params2, opt_state2, losses

    ckpt = CheckpointManager(_A.serialization_dir)
    writer = MetricsWriter(_A.serialization_dir)
    key = jax.random.PRNGKey(_A.seed + 1)
    order = list(range(len(dataset)))
    step_count = 0
    ims = max(_A.ims_per_batch, 1)
    mesh = None
    if _A.num_data != 1:
        from style_seqcvae_tpu.parallel.mesh import make_mesh, shard_detector_batch

        mesh = make_mesh(_A.num_data, 1)
        n_data = mesh.shape["data"]
        assert ims % n_data == 0, (
            f"--ims-per-batch {ims} must be divisible by the data-mesh "
            f"size {n_data}")
        params = jax.device_put(
            params, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
        opt_state = jax.device_put(
            opt_state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))

    def _make_one(items, canvas):
        while len(items) < ims:
            items.append(items[-1])
        batch = make_batch([it[0] for it in items], [it[1] for it in items],
                           [it[2] for it in items], canvas,
                           D.MAX_NUM_GT_BOXES, max(dataset.n_attribs, 1))
        return batch

    def _display(epoch, losses, take_last, window=1):
        # fire when ANY step in the just-completed window crossed a DISPLAY
        # multiple — `step_count % DISPLAY == 0` alone would degrade the
        # cadence to lcm(K, DISPLAY) under --steps-per-dispatch K (same
        # pattern as scripts/train.py's chained-window print check)
        if any(s % D.TRAIN.DISPLAY == 0
               for s in range(step_count - window + 1, step_count + 1)):
            vals = {n: device_sync(v[-1] if take_last else v)
                    for n, v in losses.items()}
            writer.scalars(step_count, vals)
            print(f"e{epoch} s{step_count}: " +
                  " ".join(f"{n}={v:.4f}" for n, v in vals.items()))

    def run_step(epoch, canvas, items):
        """One SGD step over up to ``ims`` same-canvas images (partial
        buckets at epoch end pad by repeating the last image to keep a
        single compiled shape)."""
        nonlocal params, opt_state, key, step_count
        batch = _make_one(items, canvas)
        batch["att_counts"] = att_counts
        if mesh is not None:
            batch = shard_detector_batch(mesh, batch)
        key, k = jax.random.split(key)
        params, opt_state, losses = train_step(params, opt_state, batch, k)
        step_count += 1
        _display(epoch, losses, take_last=False)

    def run_chained(epoch, canvas, items):
        """K optimizer steps over ``K·ims`` same-canvas images in ONE
        dispatch (--steps-per-dispatch)."""
        nonlocal params, opt_state, key, step_count
        groups = [_make_one(items[i * ims:(i + 1) * ims], canvas)
                  for i in range(K)]
        stacked = {f: np.stack([g[f] for g in groups]) for f in groups[0]}
        stacked["att_counts"] = att_counts
        if mesh is not None:
            stacked = shard_detector_batch(mesh, stacked,
                                           leading_scan_axis=True)
        ks = []
        for _ in range(K):
            key, k = jax.random.split(key)
            ks.append(k)
        params, opt_state, losses = chained_train_step(
            params, opt_state, stacked, jnp.stack(ks))
        step_count += K
        _display(epoch, losses, take_last=True, window=K)

    for epoch in range(1, _A.epochs + 1):
        random.shuffle(order)
        buckets = {}
        for idx in order[:steps_per_epoch]:
            rec = dataset.record(idx)
            img = load_image_bgr(rec["file_name"])
            # flip BEFORE resize: boxes are in original-image coordinates
            # (imdb.append_flipped_images flips at original width)
            if D.TRAIN.USE_FLIPPED and random.random() < 0.5:
                rec, img = flip_record(rec, img)
            img, scale = prepare_image_np(img, D.TRAIN.SCALES[0], D.TRAIN.MAX_SIZE)
            canvas = canvas_for(rec, tuple(_A.canvas))
            buckets.setdefault(canvas, []).append((rec, img, scale))
            if len(buckets[canvas]) == ims * K:
                if K > 1:
                    run_chained(epoch, canvas, buckets.pop(canvas))
                else:
                    run_step(epoch, canvas, buckets.pop(canvas))
        # leftovers: full ims-sized groups run as single steps (exact math;
        # no padded optimizer steps), the final partial group pads images
        for canvas, items in sorted(buckets.items()):
            for i in range(0, len(items), ims):
                run_step(epoch, canvas, items[i:i + ims])
        ckpt.save({"params": params, "opt_state": opt_state}, f"detector_epoch_{epoch}")
    print("done.")


if __name__ == "__main__":
    main()
