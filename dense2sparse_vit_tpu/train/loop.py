"""Experiment driver: the epoch loop tying data, steps, schedules, logging,
checkpointing and visualization together.

Parity: reference mask_predictor.py main (:56-329) — seeds, model/teacher
construction, 80/20 split of ImageNet-val, per-epoch
adjust_learning_rate -> train_one_epoch -> evaluate_performance, metric
logging, best-accuracy tracking — plus what the reference lacks: actual
best-checkpoint saving and resume (its torch.save is commented out,
mask_predictor.py:317-318).

SPMD: one process drives the whole mesh; batches are device_put with a
'data'-sharded layout and params replicated — XLA inserts the gradient
all-reduce (replaces mp.spawn + DDP + NCCL, mask_predictor.py:160-162,
ddp_training.py:4-8).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dense2sparse_vit_tpu.core.config import ExperimentConfig
from dense2sparse_vit_tpu.core.mesh import (
    is_primary,
    make_mesh,
    process_local_indices,
    put_global_batch,
    put_global_batch_from_full,
)
from dense2sparse_vit_tpu.data import (
    ImageFolder,
    Mixup,
    eval_transform,
    make_loader,
    split_train_val_indices,
    train_transform,
)
from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
from dense2sparse_vit_tpu.train.optimizer import build_optimizer
from dense2sparse_vit_tpu.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from dense2sparse_vit_tpu.utils.checkpoint import CheckpointManager
from dense2sparse_vit_tpu.utils.logging import MetricsLogger, slurm_job_name
from dense2sparse_vit_tpu.viz.hooks import epoch_visualize


def run_experiment(
    cfg: ExperimentConfig,
    workdir: str,
    teacher_params=None,
    student_params=None,
    resume: bool = False,
    max_steps_per_epoch: Optional[int] = None,
    viz_every: int = 1,
    eval_only: bool = False,
    report_flops: bool = False,
    export_serving: Optional[str] = None,
) -> dict:
    """Train the diff-pruning student against a frozen teacher.

    Args:
      teacher_params/student_params: pretrained weights (from
        utils.convert); random init when None (useful for smoke runs).
      resume: restore the latest checkpoint from workdir.
      max_steps_per_epoch: truncate epochs (debug parity with the
        reference's debug-job overrides, mask_predictor.py:134-158).
      eval_only: skip training entirely — restore (with resume=True) and
        run ONE padded full-coverage eval, returning its metrics. The
        standalone-evaluation driver the reference lacks
        (evaluate_performance is only reachable inside its training loop).

    Returns summary metrics dict (best accuracy etc.).
    """
    rng = jax.random.PRNGKey(cfg.train.seed)
    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    img_sh = NamedSharding(mesh, P("data", None, None, None))

    mixup = Mixup(
        mixup_alpha=cfg.data.mixup,
        cutmix_alpha=cfg.data.cutmix,
        cutmix_minmax=cfg.data.cutmix_minmax,
        prob=cfg.data.mixup_prob,
        switch_prob=cfg.data.mixup_switch_prob,
        mode=cfg.data.mixup_mode,
        label_smoothing=cfg.data.smoothing,
        num_classes=cfg.data.num_classes,
    )
    use_tcache = cfg.train.teacher_cache and not eval_only
    if use_tcache and mixup.active:
        raise ValueError(
            "--teacher-cache requires mixup/cutmix disabled: the teacher "
            "consumes the mixed images (reference train.py:30-40), which "
            "change every step and cannot be cached"
        )

    # data: 80/20 split of the ImageNet-val directory
    # (mask_predictor.py:239-246)
    if use_tcache:
        # frozen-teacher cache requires the SAME teacher input per sample
        # every epoch -> train on the deterministic eval view; uint8 output
        # + batch-normalize also unlocks the decoded-image cache, so epochs
        # after the first skip JPEG decode entirely
        if is_primary():
            import warnings

            warnings.warn(
                "--teacher-cache trains on the DETERMINISTIC eval view: "
                "RandomResizedCrop/flip/RandAugment/RandomErasing are all "
                "disabled (not just mixup). This is a materially "
                "weaker-regularized recipe than the reference's stochastic "
                "train augmentation — use it for throughput, not for "
                "accuracy-parity runs.",
                stacklevel=2,
            )
        ds_train = ImageFolder(
            cfg.data.imgnet_val_dir, eval_transform(cfg.data, normalize=False)
        )
    else:
        # augmented path streams uint8 too: the host transform stops after
        # RandAugment; Normalize + RandomErasing run ON DEVICE (jitted prep
        # below) before mixup — 4x fewer host->device bytes with the
        # reference's op order preserved (build_data_sets.py:15-24, then
        # mixup mask_predictor.py:261-267)
        ds_train = ImageFolder(
            cfg.data.imgnet_val_dir,
            train_transform(cfg.data, seed=cfg.train.seed, as_uint8=True),
        )
    # val set decodes to uint8: batches ship at 1/4 the bytes (the jitted
    # eval step normalizes on device), and the decoded-uint8 cache makes
    # every eval after the first decode-free
    ds_val = ImageFolder(
        cfg.data.imgnet_val_dir, eval_transform(cfg.data, normalize=False)
    )
    tr_idx, va_idx = split_train_val_indices(
        len(ds_train), 0.8, seed=cfg.train.seed
    )
    # multi-host: each process decodes only its shard of every train batch
    # (DistributedSampler equivalent, ddp_training.py:15-16); val keeps the
    # full batch on every host so coverage/padding stay exact
    nproc = jax.process_count()
    if cfg.train.batch_size % nproc:
        raise ValueError(
            f"global batch {cfg.train.batch_size} not divisible by "
            f"{nproc} processes"
        )
    local_bs = cfg.train.batch_size // nproc
    tr_idx_local = process_local_indices(tr_idx)
    # decoded-uint8 store shared between the teacher-cache pre-pass and
    # the epoch loader — the train shard is JPEG-decoded exactly once.
    # The loader itself is built lazily: the device-resident fast path
    # (below) never iterates it (and must not pay its pool/probe cost).
    train_decoded: dict = {}
    _train_loader_holder: list = []

    def get_train_loader():
        if not _train_loader_holder:
            _train_loader_holder.append(make_loader(
                ds_train, local_bs, shuffle=True, seed=cfg.train.seed,
                indices=tr_idx_local, num_workers=cfg.data.num_workers,
                with_indices=use_tcache, cache_decoded=use_tcache,
                as_uint8=True,
                shared_cache=train_decoded if use_tcache else None,
            ))
        return _train_loader_holder[0]

    # jitted on-device finish of the augmented train transform: normalize
    # then pixel-mode random erasing (the host stopped after RandAugment)
    train_prep = None
    if not use_tcache:
        from dense2sparse_vit_tpu.data.pipeline import (
            device_normalize,
            device_random_erasing,
        )

        def _prep(key, xb):
            x = device_normalize(xb, cfg.data)
            if cfg.data.reprob > 0:
                x = device_random_erasing(key, x, cfg.data)
            return x

        train_prep = jax.jit(_prep)
    # val batch: largest multiple of the mesh data-axis size that fits —
    # static shapes require full batches, but tiny val sets must still eval
    mesh_n = mesh.shape["data"]
    val_bs = min(cfg.train.batch_size, len(va_idx))
    val_bs = max((val_bs // mesh_n) * mesh_n, mesh_n)
    # keep the tail batch: it is padded below (label -1) so every val image
    # is counted exactly once — the reference's drop_last skipped the tail
    val_loader = make_loader(
        ds_val, val_bs, indices=va_idx, drop_last=False,
        num_workers=cfg.data.num_workers,
        as_uint8=True, cache_decoded=True,
    )
    steps_per_epoch = max(len(tr_idx_local) // local_bs, 1)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    # models: selection='gumbel' dispatches to the DynamicViT-paper baseline
    # student (reference default_dynamic_vit.py:435-487 + the --use-ratio-loss
    # flag family); everything else is the diff-pruning student
    gumbel_baseline = cfg.pruning.selection == "gumbel"
    if gumbel_baseline:
        from dense2sparse_vit_tpu.models.dynamic_vit_default import (
            DynamicViTStudent,
        )

        student = DynamicViTStudent(cfg=cfg.model, pruning=cfg.pruning)
    else:
        student = DiffPruningStudent(cfg=cfg.model, pruning=cfg.pruning)
    teacher = ViTTeacher(cfg=cfg.model)

    sample = jnp.zeros((1, cfg.model.img_size, cfg.model.img_size, 3))
    # gumbel baseline: joint fine-tuning from epoch 0 (no predictor-only
    # warmup phase in the DynamicViT recipe — matches its loss, which has
    # no warmup gate). Under grad accumulation the inner schedules count
    # optimizer UPDATES, so the per-epoch divisor shrinks by k
    # (train/optimizer.py::make_optimizer).
    sched_steps = max(steps_per_epoch // cfg.train.grad_accum_steps, 1)
    tx = build_optimizer(
        cfg.train, sched_steps,
        backbone_warmup_freeze=not gumbel_baseline,
    )
    state = create_train_state(student, tx, rng, sample)
    if student_params is not None:
        state = state.replace(params=student_params)
    if report_flops and is_primary():
        # the reference's commented-out fvcore report (train.py:33-37),
        # via XLA's own cost analysis of the compiled forward
        from dense2sparse_vit_tpu.utils.profiling import (
            pruned_vs_dense_flops,
        )

        fl_vars = {"params": state.params}
        if state.batch_stats:
            fl_vars["batch_stats"] = state.batch_stats
        fl_kw = {} if gumbel_baseline else {"collect_cls_attns": False}
        fl = pruned_vs_dense_flops(student, fl_vars, sample, **fl_kw)
        print(
            f"Flops [GFLOPs]: Unpruned={fl['dense_gflops']:.2f}, "
            f"Pruned={fl['pruned_gflops']:.2f}, "
            f"Ratio={fl['flop_ratio']:.2f}"
        )
    if teacher_params is None:
        teacher_params = teacher.init(jax.random.fold_in(rng, 1), sample)[
            "params"
        ]

    tcache = None
    if use_tcache:
        # one deterministic pre-pass fills the cache; every later step skips
        # the teacher forward (~4.6 GFLOPs/img). Host-local per process —
        # each host caches only its own loader shard.
        from dense2sparse_vit_tpu.train.teacher_cache import (
            TeacherCache,
            make_teacher_outputs_fn,
        )

        build_loader = make_loader(
            ds_train, local_bs, indices=tr_idx_local, drop_last=False,
            num_workers=cfg.data.num_workers, with_indices=True,
            as_uint8=True, cache_decoded=True, shared_cache=train_decoded,
        )
        tcache = TeacherCache(tr_idx_local)
        t_build0 = time.time()
        # single-host: also cache the decoded uint8 images/labels so the
        # whole epoch can become device-resident (below) — per step, only
        # the (B,) index vector then crosses the host->device link.
        # Skip the host-side image copy upfront when it provably cannot
        # fit the HBM budget (to_device re-checks with exact byte counts).
        dev_limit = int(cfg.train.device_cache_gb * 2**30)
        est_img_bytes = len(tr_idx_local) * cfg.model.img_size ** 2 * 3
        tcache.build(
            make_teacher_outputs_fn(teacher, cfg),
            teacher_params, build_loader, local_bs,
            cache_images=(nproc == 1 and est_img_bytes < dev_limit),
        )
        mib = tcache.nbytes / 2**20
        if nproc == 1:
            tcache.to_device(repl, data_sh, limit_bytes=dev_limit)
        if is_primary():
            where = (
                "device-resident (incl. images)"
                if tcache.device_has_images
                else "device-resident (teacher rows)" if tcache.on_device
                else "host"
            )
            print(
                f"teacher cache: {len(tr_idx_local)} samples, "
                f"{mib:.0f} MiB, {where}, "
                f"{time.time() - t_build0:.1f}s",
                flush=True,
            )

    ckpt = CheckpointManager(f"{workdir}/ckpt")
    start_epoch = 0
    restored = False
    if resume:
        # Multi-host: workdirs may be process-local (no shared filesystem),
        # so only process 0's checkpoint is authoritative. Restore there and
        # broadcast — otherwise non-primary hosts would silently keep their
        # fresh init and the _repl below would assemble a "replicated" state
        # from divergent per-host copies.
        has_ckpt = ckpt.latest_step() is not None
        if nproc > 1:
            from jax.experimental import multihost_utils

            has_ckpt = bool(
                multihost_utils.broadcast_one_to_all(np.asarray(has_ckpt))
            )
            if has_ckpt:
                if ckpt.latest_step() is not None:
                    state = ckpt.restore(state)
                state = jax.device_get(
                    multihost_utils.broadcast_one_to_all(
                        jax.device_get(state)
                    )
                )
        elif has_ckpt:
            state = ckpt.restore(state)
        if has_ckpt:
            start_epoch = int(state.step) // steps_per_epoch
            restored = True

    if nproc > 1:
        # replicate across hosts: every process contributes the same value
        # (device_put cannot target non-addressable devices)
        def _repl(tree):
            return jax.tree.map(
                lambda a: put_global_batch_from_full(repl, a),
                jax.device_get(tree),
            )

        state = _repl(state)
        teacher_params = _repl(teacher_params)
    else:
        state = jax.device_put(state, repl)
        teacher_params = jax.device_put(teacher_params, repl)

    # every per-step input the driver feeds is freshly created (loader
    # put / device gather / prep / mixup outputs), so the batch buffers are
    # donated too; teacher_in is only donatable in cached mode (fresh row
    # gathers) — in live-teacher mode it is the REUSED replicated params
    donate = (0, 2, 3) + ((1,) if use_tcache else ())
    if gumbel_baseline:
        from dense2sparse_vit_tpu.train.train_step import (
            make_dynamic_vit_eval_step,
            make_dynamic_vit_train_step,
        )

        train_step = jax.jit(
            make_dynamic_vit_train_step(
                student, teacher, tx, cfg, mixup_active=mixup.active,
                cached_teacher=use_tcache,
            ),
            donate_argnums=donate,
        )
        eval_step = jax.jit(make_dynamic_vit_eval_step(student, teacher, cfg))
    else:
        train_step = jax.jit(
            make_train_step(
                student, teacher, tx, cfg, mixup_active=mixup.active,
                cached_teacher=use_tcache,
            ),
            donate_argnums=donate,
        )
        eval_step = jax.jit(make_eval_step(student, teacher, cfg))

    logger = MetricsLogger(
        workdir, slurm_job_name(cfg), use_tensorboard=True, use_wandb=cfg.wandb,
        wandb_config={"cfg": str(cfg)},
    )
    best_acc = 0.0

    log_every = max(cfg.train.log_every_steps, 1)

    def train_batches(epoch):
        """Yield (images, labels, teacher_in) device batches for one epoch.

        Device-resident fast path (single host, cache fits HBM): shuffle
        indices host-side, gather images/labels/teacher rows ON DEVICE —
        per step only the (B,) index vector is transferred, so epochs are
        immune to host-link bandwidth entirely.
        """
        if use_tcache and tcache.device_has_images:
            order = np.asarray(tr_idx_local).copy()
            np.random.default_rng(cfg.train.seed + epoch).shuffle(order)
            for b in range(steps_per_epoch):
                sel = order[b * local_bs:(b + 1) * local_bs]
                if len(sel) < local_bs:
                    break  # drop-last semantics, same as the loader path
                got = tcache.lookup_device(sel)
                yield got.pop("images"), got.pop("labels"), got
            return
        for step_i, item in enumerate(get_train_loader()()):
            if step_i >= steps_per_epoch:
                break
            if use_tcache:
                xb, yb, sel = item
                teacher_in = (
                    tcache.lookup_device(sel) if tcache.on_device
                    else {
                        k: put_global_batch(data_sh, v)
                        for k, v in tcache.lookup(sel).items()
                    }
                )
            else:
                xb, yb = item
                teacher_in = teacher_params
            yield (
                put_global_batch(img_sh, xb),
                put_global_batch(data_sh, yb),
                teacher_in,
            )

    # device-retained val batches: the FIRST eval's device_put arrays are
    # simply kept and re-fed on later evals (single host, byte-capped) —
    # repeat evals then ship zero bytes over the host link and skip the
    # loader entirely (the decoded-uint8 cache already skips decode).
    # Budget: whatever --device-cache-gb leaves after the train cache.
    val_dev_batches: list = []
    VAL_DEV_LIMIT = int(cfg.train.device_cache_gb * 2**30) - (
        tcache.device_nbytes if tcache is not None else 0
    )
    val_dev_ok = nproc == 1 and VAL_DEV_LIMIT > 0
    viz_panel = None

    # one fused dispatch for the per-step running-metric accumulation
    # (a python tree_map of jnp.add issues ~15 tiny device ops per step —
    # measurable glue on the relay); the old sums are donated
    metric_accum = jax.jit(
        lambda s, m: jax.tree.map(jnp.add, s, m), donate_argnums=(0,)
    )
    # pre-weight eval metrics by the batch's valid count on device, so the
    # cross-batch aggregation is a pure device-side tree-add
    eval_weight = jax.jit(
        lambda m: {
            **{k: v * m["n_valid"] for k, v in m.items() if k != "n_valid"},
            "n_valid": m["n_valid"],
        }
    )

    def run_eval(state):
        """One full padded-coverage eval pass (evaluate_performance parity);
        returns (weighted-mean metrics dict, total_valid). Weighted sums
        accumulate ON DEVICE: one host readback per eval, not per batch."""
        nonlocal viz_panel, val_dev_ok
        agg_dev = None

        def _loader_eval_batches():
            nonlocal viz_panel, val_dev_ok
            nbytes = 0
            for xb, yb in val_loader():
                if len(yb) < val_bs:
                    pad = val_bs - len(yb)
                    xb = np.concatenate(
                        [xb, np.repeat(xb[:1], pad, axis=0)]
                    )
                    yb = np.concatenate(
                        [yb, np.full((pad,), -1, yb.dtype)]
                    )
                if viz_panel is None:
                    # host copy, captured before device placement (global
                    # arrays are not host-addressable under multi-host)
                    viz_panel = (np.asarray(xb[:16]), np.asarray(yb[:16]))
                xbd = put_global_batch_from_full(img_sh, xb)
                ybd = put_global_batch_from_full(data_sh, yb)
                if val_dev_ok:
                    nbytes += xbd.nbytes + ybd.nbytes
                    if nbytes <= VAL_DEV_LIMIT:
                        val_dev_batches.append((xbd, ybd))
                    else:
                        val_dev_batches.clear()
                        val_dev_ok = False
                yield xbd, ybd

        eval_iter = (
            iter(val_dev_batches) if val_dev_batches
            else _loader_eval_batches()
        )
        for xbd, ybd in eval_iter:
            m = eval_weight(eval_step(
                state.params, state.batch_stats, teacher_params, xbd, ybd
            ))
            agg_dev = m if agg_dev is None else metric_accum(agg_dev, m)
        agg = jax.device_get(agg_dev) if agg_dev is not None else {}
        total_valid = float(agg.pop("n_valid", 0.0))
        if total_valid:
            agg = {k: float(v) / total_valid for k, v in agg.items()}
        return agg, total_valid

    def _maybe_export_serving(cur_state):
        """--export-serving DIR: save deployable AOT serving artifacts
        (utils/serving.py) for the BEST checkpoint when one exists, else
        the current weights."""
        if not export_serving or not is_primary():
            return
        exp_state = cur_state
        # multi-host: orbax restore is a collective; a host-0-only restore
        # would deadlock the fleet. Export the in-memory weights instead
        # (identical when the final epoch is the best one).
        if jax.process_count() == 1 and ckpt.best_step() is not None:
            exp_state = ckpt.restore_best(jax.device_get(cur_state))
        exp_vars = {"params": exp_state.params}
        if exp_state.batch_stats:
            exp_vars["batch_stats"] = exp_state.batch_stats
        from dense2sparse_vit_tpu.utils.serving import ServingModel

        sm = ServingModel.export(student, jax.device_get(exp_vars))
        sm.save(export_serving)
        print(
            f"serving artifacts -> {export_serving} "
            f"({'symbolic batch' if not sm.buckets else sm.buckets})"
        )

    if eval_only:
        # evaluating a random init would silently report chance-level
        # accuracy as if it were the model's — require restored or
        # explicitly provided weights
        if not restored and student_params is None:
            raise FileNotFoundError(
                f"--eval-only: no checkpoint under {workdir}/ckpt and no "
                "student_params provided; nothing trained to evaluate"
            )
        agg, total_valid = run_eval(state)
        if total_valid:
            logger.log(agg, start_epoch, prefix="val")
        summary = {"eval_only": True, "epochs": 0, **agg}
        logger.summary(summary)
        _maybe_export_serving(state)
        logger.close()
        ckpt.close()
        return summary

    for epoch in range(start_epoch, cfg.train.epochs):
        t0 = time.time()
        # running means across the epoch (reference losses.py:111-117,
        # train.py:76-83 accumulate into a shared metrics dict); sums stay
        # on device, fetched at the logging cadence
        metric_sum, n_steps = None, 0
        epoch_arr = jnp.float32(epoch)  # one upload per epoch, not per step
        for step_i, (xb, yb, teacher_in) in enumerate(train_batches(epoch)):
            key = jax.random.fold_in(rng, epoch * 100003 + step_i)
            if train_prep is not None:
                xb = train_prep(jax.random.fold_in(key, 2), xb)
            if mixup.active:
                xb, yb = mixup(jax.random.fold_in(key, 1), xb, yb)
            state, metrics = train_step(
                state, teacher_in, xb, yb, key, epoch_arr
            )
            metric_sum = (
                metrics if metric_sum is None
                else metric_accum(metric_sum, metrics)
            )
            n_steps += 1
            if n_steps % log_every == 0:
                # in-epoch progress channel (reference prints every 10/400
                # steps, train.py:59-62)
                running = {
                    k: float(v) / n_steps
                    for k, v in jax.device_get(metric_sum).items()
                }
                logger.log(
                    running, int(state.step), prefix="train_step"
                )
                print(
                    f"epoch {epoch} step {step_i + 1}/{steps_per_epoch} "
                    f"loss {running.get('loss', float('nan')):.4f}",
                    flush=True,
                )
        t_train = time.time() - t0
        if metric_sum is not None:
            epoch_means = {
                k: float(v) / n_steps
                for k, v in jax.device_get(metric_sum).items()
            }
            logger.log(epoch_means, epoch, prefix="train")

        # eval (evaluate_performance parity)
        agg, total_valid = run_eval(state)
        if total_valid:
            logger.log(agg, epoch, prefix="val")
            acc = agg.get("val_acc", 0.0)
            best_acc = max(best_acc, acc)
        if is_primary():
            host_state = jax.device_get(state)
            # latest-epoch stream: --resume continues from HERE even when
            # accuracy plateaus (the best stream alone would silently rewind
            # and re-train the plateau)
            ckpt.save(int(state.step), host_state)
            if total_valid:
                ckpt.save_if_best(int(state.step), host_state, acc)

        # visualization hook on a fixed panel (mask_predictor.py:272-282);
        # the gumbel baseline emits no per-stage kept-index/CLS-attn outputs
        # for the panel renderer — viz is a diff-pruning-student feature
        if (
            cfg.visualize_patch_drop or cfg.visualize_cls_attn_evo
        ) and not gumbel_baseline and viz_panel is not None \
                and epoch % viz_every == 0 and is_primary():
            # host-local forward: params are replicated, so host 0's copy is
            # the global value (multi-host-safe; viz never touches the mesh)
            host_vars = {"params": jax.device_get(state.params)}
            if state.batch_stats:
                host_vars["batch_stats"] = jax.device_get(state.batch_stats)
            # val batches are raw uint8 now; the model and the viz renderer
            # both expect the normalized view
            from dense2sparse_vit_tpu.data.pipeline import _normalize

            viz_imgs = _normalize(np.asarray(viz_panel[0][:16]), cfg.data)
            out = student.apply(host_vars, viz_imgs)
            epoch_visualize(
                np.asarray(viz_imgs), jax.device_get(out),
                cfg.model.num_patches, f"{workdir}/viz", epoch,
                labels=np.asarray(viz_panel[1][:16]),
                patch_size=cfg.model.patch_size,
                visualize_patch_drop=cfg.visualize_patch_drop,
                visualize_cls_attn_evo=cfg.visualize_cls_attn_evo,
                pruning_locs=cfg.pruning.pruning_locs,
            )
        logger.log(
            {
                "epoch_seconds": time.time() - t0,
                # train phase only (loader + device steps, no eval/viz):
                # the end-to-end number the e2e epoch bench reads
                "train_seconds": t_train,
                "train_img_per_s": (
                    n_steps * cfg.train.batch_size / t_train
                    if t_train > 0 and n_steps else 0.0
                ),
            },
            epoch,
            prefix="time",
        )

    summary = {
        "best_val_acc": best_acc,
        "epochs": cfg.train.epochs,
        # observability for the device-resident fast paths (BENCHMARKS
        # "end-to-end epoch"): >0 means later evals re-fed retained
        # device batches / train epochs gathered on-chip
        "val_dev_batches": len(val_dev_batches),
        "train_device_resident": bool(
            use_tcache and tcache is not None and tcache.device_has_images
        ),
        # augmented configs: host ships raw uint8, normalize + random
        # erasing finish on device
        "augmented_train_uint8_stream": train_prep is not None,
    }
    logger.summary(summary)
    _maybe_export_serving(state)
    logger.close()
    ckpt.close()
    return summary
